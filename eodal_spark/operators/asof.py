"""As-of (temporal nearest / latest-at) join.

The reference matches scene metadata within a ±tolerance of a target
timestamp (`eodal/mapper/mapper.py:554-563`, :650-663 — rounding to a
pandas freq + |Δt| < Timedelta).  Generalized here to a proper as-of
join: for each left row, the single most recent right row with
``right_ts <= left_ts`` (optionally within a tolerance), per key.

Implementation is the **union + window** merge (no range-join blowup):
tag both sides, union, sort within key by (ts, side-priority), carry the
last right row forward with ``last(..., ignorenulls=True)`` — one shuffle
on the key, linear in rows, the same plan at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: tuple[str, ...],
    tolerance_seconds: int | None = None,
    left_vals: tuple[str, ...] | None = None,
) -> DataFrame:
    """For each left row: values of the latest right row at-or-before
    its timestamp (NULLs when none / outside tolerance).

    ``left_vals`` prunes the left payload carried through the merge to
    the named columns (default: every left column).  The union/window
    merge ships the whole left row through its one exchange + sort, and
    Catalyst's nested-column pruning does NOT reach through the Window
    operator — an unpruned 100 TB left side would sort payload bytes
    that the caller immediately drops (guide §2.3 "project before the
    exchange"; plan-verified: plans/r07/asof_join_*.txt)."""
    if left_vals is None:
        left_vals = tuple(left.columns)
    # the right side is carried as ONE struct (_rts + all value columns)
    # so every output value comes from the SAME latest right row — a
    # per-column last(ignorenulls) would stitch columns from different
    # right rows whenever the latest row has a NULL in one of them
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(c) for c in right_vals],
        ).alias("_rrow"),
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tag.schema["_rrow"].dataType).alias("_rrow"),
        F.struct(*[F.col(c) for c in left_vals]).alias("_lrow"),
    )
    r_tag = r_tag.withColumn(
        "_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType)
    )
    # right rows sort before left rows at equal ts (inclusive as-of);
    # ties among right rows at the same ts resolve by ascending struct
    # value (carried = last ⇒ the lexicographic max wins) — a TOTAL
    # order, so the result is deterministic under any shuffle
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_ts").asc(),
            F.col("_side").asc(),
            F.col("_rrow").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_lrow",
        "_ts",
        F.last("_rrow", ignorenulls=True).over(w).alias("_c"),
    ).filter(F.col("_lrow").isNotNull())
    if tolerance_seconds is not None:
        # microsecond precision: unix_timestamp() truncates to whole
        # seconds, accepting sub-second tolerance violations (0.9 s gap
        # passes tolerance 0) and rejecting 1 ms near-misses
        in_tol = (
            F.unix_micros(F.col("_ts").cast("timestamp"))
            - F.unix_micros(F.col("_c._rts").cast("timestamp"))
        ) <= F.lit(tolerance_seconds * 1_000_000)
        carried = carried.select(
            "_lrow",
            F.when(in_tol, F.col("_c")).otherwise(None).alias("_c"),
        )
    out = carried.select(
        "_lrow.*", *[F.col(f"_c.{c}").alias(f"asof_{c}") for c in right_vals]
    )
    return out
