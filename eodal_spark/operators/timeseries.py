"""Time-series reindex / gap-fill over bucketed observations.

≡ `SceneCollection.get_feature_timeseries(reindex_dataframe=True)`
(`/root/reference/eodal/core/scene.py:472-539`, reindex :532-539) —
the reference renumbers the concatenated frame to a unique index; the
relational generalization a time-series consumer actually needs is a
REGULAR time axis: every (feature, bucket) combination present between
the first and last observation, gaps either left NULL, zero-filled, or
forward-filled with the last observation (the pandas
``reindex().ffill()`` idiom the reference's notebooks apply downstream).

Scale shape: the spine is `sequence(min, max)` off a 1-row global
aggregate (no driver collect), cross-joined with the distinct feature
keys (broadcast — |features| × |buckets| rows exist only logically
until the left join), then one shuffle on (feature, bucket) for the
join and one window per feature for the fill.  Fill uses
``last(ignorenulls)`` over a row frame — deterministic because the
spine guarantees exactly one row per (feature, bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def reindex_buckets(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    fill_zero: tuple[str, ...] = (),
    fill_forward: tuple[str, ...] = (),
) -> DataFrame:
    """Complete ``df`` (one row per (key, bucket)) to a dense bucket
    spine spanning [global min, global max] for every key.

    ``fill_zero`` columns get 0 on gap rows (counts), ``fill_forward``
    columns carry the last observed value per key (measurements; stays
    NULL before a key's first observation).  All other value columns
    stay NULL on gaps.  Adds ``is_observed`` so consumers can tell
    filled rows from real ones."""
    marked = df.withColumn("_obs", F.lit(True))
    bounds = df.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    spine_buckets = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(bucket_col)
    )
    keys = df.select(key_col).distinct()
    spine = keys.crossJoin(F.broadcast(spine_buckets))
    out = (
        spine.join(marked, [key_col, bucket_col], "left")
        .withColumn("is_observed", F.coalesce(F.col("_obs"), F.lit(False)))
        .drop("_obs")
    )
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if fill_forward:
        w = (
            Window.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in fill_forward:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def sql_reindex_buckets(
    rel: str,
    key_col: str,
    bucket_col: str,
    value_cols: tuple[str, ...],
    fill_zero: tuple[str, ...] = (),
    fill_forward: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of `reindex_buckets` (for oracle gates): same spine,
    same fill semantics, bit-identical integer outputs."""
    proj = []
    for c in value_cols:
        if c in fill_zero:
            proj.append(f"coalesce(d.{c}, 0) AS {c}")
        elif c in fill_forward:
            proj.append(
                f"last_value(d.{c} IGNORE NULLS) OVER "
                f"(PARTITION BY s.{key_col} ORDER BY s.{bucket_col} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {c}"
            )
        else:
            proj.append(f"d.{c} AS {c}")
    observed = "coalesce(d._obs, FALSE)"
    cols = ",\n               ".join(proj)
    return f"""
        WITH d AS (SELECT *, TRUE AS _obs FROM {rel}),
        bounds AS (SELECT min({bucket_col}) AS lo, max({bucket_col}) AS hi FROM d),
        spine AS (
          SELECT k.{key_col}, b.{bucket_col}
          FROM (SELECT DISTINCT {key_col} FROM d) k,
               (SELECT unnest(generate_series(lo, hi)) AS {bucket_col} FROM bounds) b
        )
        SELECT s.{key_col}, s.{bucket_col},
               {cols},
               {observed} AS is_observed
        FROM spine s LEFT JOIN d
          ON d.{key_col} = s.{key_col} AND d.{bucket_col} = s.{bucket_col}
    """


def temporal_composite(
    df: DataFrame,
    cell_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Per-cell temporal composite — the EO "cloud-free mosaic"
    reduction (≡ the median/percentile compositing applied downstream
    of `SceneCollection.get_feature_timeseries`,
    `/root/reference/eodal/core/scene.py:472-539`; the reference
    composites scene-by-scene in pandas, this is the relational form):
    every (cell, time-bucket) collapses its observation stack to
    {count, min, max, exact median, integer mean}.

    Scale shape: ONE shuffle on (cell, bucket) with map-side partial
    aggregation for count/min/max/sum; the exact ``median`` is the
    only non-combinable member and is why the composite groups by the
    grid cell — the per-group stack is the number of revisits (tens to
    hundreds), never the corpus.  Mean is integer-milli (sum·1000 div
    n) and median is exact (revisit stacks are small), so outputs are
    cross-engine hashable."""
    v = F.col(value_col)
    return df.groupBy(
        F.col(cell_col).alias("cell_id"),
        F.expr(f"{ts_col} div {bucket_seconds}").alias("ts_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
        F.median(v).alias("v_median"),
        F.expr(f"sum({value_col}) * 1000 div count(*)").alias(
            "v_mean_milli"
        ),
    )


def medoid_composite(
    df: DataFrame,
    cell_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    id_col: str = "url",
) -> DataFrame:
    """Best-pixel selection: per (cell, bucket), the OBSERVATION whose
    value sits closest to the stack median — the medoid composite EO
    pipelines use when the output must be a real observation (with its
    provenance id), not a synthetic statistic.  Total order
    (|v−median|, v, id) ⇒ deterministic under any parallelism.  Two
    window passes over the same (cell, bucket) partitioning — Catalyst
    plans ONE shuffle and sorts once."""
    b = F.expr(f"{ts_col} div {bucket_seconds}")
    v = F.col(value_col)
    marked = df.select(
        F.col(cell_col).alias("cell_id"),
        b.alias("ts_bucket"),
        v.alias("v"),
        F.col(id_col).alias(id_col),
    )
    part = Window.partitionBy("cell_id", "ts_bucket")
    med = marked.withColumn("_med", F.median("v").over(part))
    w = part.orderBy(
        F.abs(F.col("v") - F.col("_med")).asc(),
        F.col("v").asc(),
        F.col(id_col).asc(),
    )
    return (
        med.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cell_id", "ts_bucket", F.col(id_col),
            F.col("v").alias("v_medoid"),
        )
    )
