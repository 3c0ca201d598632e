"""Per-partition lineage + row-count metrics (north-rule requirement).

The reference logs through Python logging only
(`eodal/config/settings.py:98-130`).  The engine emits, for any stage:

* an Arrow-batched pass-through that counts rows per partition via a
  Spark accumulator (zero extra jobs, works mid-pipeline), and
* a metrics DataFrame (stage, partition_id, rows) that a driver loop
  appends to a metrics table — queryable lineage, the relational
  analogue of a metrics Iceberg table.

Both are partition-parallel; nothing collects the data itself.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_rows_accumulator(df: DataFrame, sc=None):
    """Attach a row-counting accumulator to a DataFrame.

    Returns (df_passthrough, accumulator).  The accumulator fills when
    the plan executes — read it *after* an action.  mapInPandas
    pass-through keeps Arrow batching (no per-row Python).

    CAVEAT (inherent to transformation-side accumulators): Spark
    guarantees exactly-once updates only inside actions, so task
    retries/speculation and re-running actions on the same plan inflate
    the count — treat it as a live progress signal, not lineage truth.
    Exact per-stage counts come from `append_stage_metrics` (a real
    aggregation)."""
    sc = sc or df.sparkSession.sparkContext
    acc = sc.accumulator(0)

    def tap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    return df.mapInPandas(tap, df.schema), acc


def partition_metrics(df: DataFrame, stage: str) -> DataFrame:
    """(stage, partition_id, rows) — one row per physical partition.
    A pure aggregation: map-side partials, tiny shuffle."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            "rows",
        )
    )


def append_stage_metrics(df: DataFrame, stage: str, metrics_dir: str) -> dict:
    """Compute partition metrics for a stage and append them to the
    metrics table (parquet dir, Iceberg in production).  Returns a
    lineage record {stage, partitions, rows}."""
    # persist the (tiny) metrics frame: the write and the aggregate are
    # two actions, and without it each re-executes the stage's full
    # upstream plan
    m = partition_metrics(df, stage).persist()
    m.write.mode("append").parquet(os.path.join(metrics_dir, "partition_metrics"))
    agg = m.agg(F.count(F.lit(1)), F.sum("rows")).first()
    m.unpersist()
    record = {"stage": stage, "partitions": int(agg[0] or 0), "rows": int(agg[1] or 0)}
    with open(os.path.join(metrics_dir, "lineage.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    return record


def explain_str(df: DataFrame) -> str:
    """The formatted physical plan as a string (for plan assertions)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
