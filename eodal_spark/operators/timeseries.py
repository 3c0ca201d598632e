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
