"""Incremental append (the reference's --append / RepDB surface) — batch
increments over persisted state tables."""
