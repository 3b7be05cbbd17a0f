"""Iceberg stage-table sinks (SURVEY §2.1: sketch/MST/RepDB state tables).

On a real cluster every pipeline stage is an Iceberg table written with
``writeTo(...).createOrReplace()``, carrying the sketch parameters as table
properties (the reference stores them in its binary sketch headers,
src/Sketch_IO.cpp:136-167).  This sandbox has no Iceberg jars, so the writer
detects catalog support at runtime and falls back to the parquet layout the
rest of the repo uses — SAME schema, SAME directory-per-stage layout, so the
pipeline is format-transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rabbittclust_spark.config import PipelineConfig


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of configured Spark catalogs backed by Iceberg (empty when the
    runtime has no Iceberg support)."""
    out = []
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return out
    for k, v in confs:
        if (k.startswith("spark.sql.catalog.") and k.count(".") == 3
                and "iceberg" in str(v).lower()):
            out.append(k.rsplit(".", 1)[-1])
    return out


def _table_properties(cfg: PipelineConfig | None) -> dict[str, str]:
    """Sketch parameters as Iceberg table properties — the queryable analog
    of the reference's binary sketch-file header."""
    if cfg is None:
        return {}
    return {f"rabbittclust.{k}": str(v) for k, v in cfg.to_dict().items()}


def write_stage_table(df: DataFrame, identifier: str,
                      cfg: PipelineConfig | None = None,
                      partition_by: list[str] | None = None) -> str:
    """Write a stage DataFrame as an Iceberg table when a catalog is
    available, else as a parquet directory (identifier treated as a path).

    Returns "iceberg" or "parquet" (the format actually used) so callers and
    tests can assert the decision.
    """
    spark = df.sparkSession
    if iceberg_catalogs(spark):
        writer = df.writeTo(identifier)
        for k, v in _table_properties(cfg).items():
            writer = writer.tableProperty(k, v)
        if partition_by:
            from pyspark.sql import functions as F
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return "iceberg"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(identifier)
    return "parquet"


def read_stage_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Read a stage table regardless of the format write_stage_table chose."""
    if iceberg_catalogs(spark):
        return spark.read.table(identifier)
    return spark.read.parquet(identifier)
