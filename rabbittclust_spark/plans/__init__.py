"""Stage orchestration: persistent stage tables, per-partition lineage,
metrics, checkpoint/resume."""
