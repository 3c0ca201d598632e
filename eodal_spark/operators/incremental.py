"""Incremental aggregate maintenance over SnapshotCatalog tables.

`refresh_rollup` keeps a per-key aggregate table (counts / sums / mins /
maxs — the MERGEABLE aggregates) in sync with a source table at
O(delta + affected keys) cost instead of recomputing the aggregation
over the full source: the training-pipeline primitive for corpus
statistics that must stay current while ingestion appends continuously
(per-host page counts, per-cell tile stats, per-language token totals).

≡ materialized-view incremental maintenance compiled onto the catalog's
own primitives: `read_changes` supplies the exact file-level delta,
partial aggregates combine with the stored values for the affected keys
only, and :meth:`SnapshotCatalog.upsert` lands the merge atomically with
the consumed source snapshot recorded in the commit metadata — so a
crashed refresh re-runs from the last consumed snapshot, never double
counts, and a no-op refresh commits nothing.

The reference's closest surface is per-scene incremental statistics
accumulation (`eodal/mapper/mapper.py` band-stat aggregation per added
scene); this generalizes it to exactly-once table maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERGEABLE = ("count", "sum", "min", "max")


def _agg_exprs(measures: list[tuple[str, str, str]]) -> list:
    out = []
    for kind, col, alias in measures:
        if kind == "count":
            out.append(F.count(F.lit(1)).alias(alias))
        elif kind == "sum":
            out.append(F.sum(col).alias(alias))
        elif kind == "min":
            out.append(F.min(col).alias(alias))
        elif kind == "max":
            out.append(F.max(col).alias(alias))
        else:
            raise ValueError(
                f"measure kind {kind!r} is not mergeable — supported: "
                f"{MERGEABLE} (derive avg downstream as sum/count)"
            )
    return out


def _merge_expr(kind: str, alias: str):
    old, new = F.col(f"o.{alias}"), F.col(f"n.{alias}")
    if kind in ("count", "sum"):
        # both-NULL must STAY NULL (a sum over all-NULL values is NULL
        # in the defining aggregation — coalescing to 0 would make the
        # stored value depend on which code path last ran)
        return (
            F.when(old.isNull() & new.isNull(), F.lit(None))
            .otherwise(F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0)))
            .alias(alias)
        )
    if kind == "min":
        # NULL-safe: least() ignores NULLs in Spark, matching "merge of
        # a partial that never saw the key"
        return F.least(old, new).alias(alias)
    return F.greatest(old, new).alias(alias)


def refresh_rollup(
    spark: SparkSession,
    cat,
    src_table: str,
    dst_table: str,
    key_cols: tuple[str, ...],
    measures: list[tuple[str, str, str]],
    n_files: int | None = None,
) -> dict:
    """Bring ``dst_table`` = SELECT keys, aggs FROM ``src_table`` GROUP
    BY keys up to date with the source's current snapshot.

    ``measures`` is a list of ``(kind, src_col, out_col)`` with kind in
    ``("count", "sum", "min", "max")`` (``src_col`` ignored for count).

    Returns ``{"mode": "noop"|"incremental"|"full", "src_snapshot": id}``.
    Incremental when the source only APPENDED since the last consumed
    snapshot (the delta comes from `read_changes`); any overwrite /
    delete / upsert in the range makes the delta inexpressible as
    files, so the rollup falls back to one full recompute — correct for
    every source history, incremental for the common append-only one."""
    key_cols = list(key_cols)
    src_snap = cat.current_snapshot(src_table)
    if src_snap is None:
        raise FileNotFoundError(f"no snapshots for table {src_table!r}")
    sid = src_snap["snapshot_id"]
    meta = {"rollup_src_snapshot": sid, "rollup_src_table": src_table}

    dst_snap = cat.current_snapshot(dst_table)
    last = (dst_snap or {}).get("meta", {}).get("rollup_src_snapshot")

    def full_build() -> dict:
        # pin the read to the sid recorded in meta — an unpinned read
        # could resolve a NEWER snapshot committed after sid was
        # captured, aggregating rows the metadata does not mark as
        # consumed (the next incremental refresh would re-add them)
        agg = (
            cat.read(spark, src_table, snapshot_id=sid)
            .groupBy(*key_cols)
            .agg(*_agg_exprs(measures))
        )
        cat.write(
            agg, dst_table, sort_by=tuple(key_cols), n_files=n_files,
            mode="overwrite", meta=meta,
        )
        return {"mode": "full", "src_snapshot": sid}

    if last is None:
        return full_build()
    if last == sid:
        return {"mode": "noop", "src_snapshot": sid}

    try:
        delta = cat.read_changes(spark, src_table, last, sid)
    except (ValueError, KeyError):
        # ValueError: overwrite/delete/upsert in range — no file-level
        # delta exists.  KeyError: the consumed snapshot was expired
        # (routine expire_snapshots on the source) — same remedy, one
        # full recompute re-anchors the rollup on the current snapshot.
        return full_build()
    # cached: consumed by the NULL-key probe below, then by upsert's
    # data write AND its key-file write — without the cache the delta
    # files are re-scanned and the groupBy re-run 3-4 times per refresh
    partial = (
        delta.groupBy(*key_cols).agg(*_agg_exprs(measures)).cache()
    )
    # NULL group keys cannot round-trip through the incremental path:
    # upsert's equality-delete anti-join is (deliberately) null-unsafe,
    # so a NULL-key row would never REPLACE its stored counterpart and
    # the rollup would carry duplicates.  partial is tiny — one cheap
    # check routes those refreshes to the exact full rebuild.
    null_key = None
    for k in key_cols:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    if partial.filter(null_key).limit(1).count() > 0:
        partial.unpersist()
        return full_build()
    old = cat.read(spark, dst_table)
    # only the keys the delta touched are re-read and re-written; the
    # full-outer join covers keys new to the rollup AND stored keys the
    # delta updates
    affected = old.join(partial.select(*key_cols), key_cols, "semi")
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else (cond & c)
    merged = (
        affected.alias("o")
        .join(partial.alias("n"), on=cond, how="full_outer")
        .select(
            *[
                F.coalesce(f"o.{k}", f"n.{k}").alias(k)
                for k in key_cols
            ],
            *[_merge_expr(kind, alias) for kind, _, alias in measures],
        )
        # upsert consumes this twice (data files + its key file) —
        # cached so the stored-rollup scan and merge join run once
        .cache()
    )
    try:
        cat.upsert(
            spark, merged, dst_table, key_cols=tuple(key_cols),
            n_files=n_files, meta=meta,
        )
    finally:
        merged.unpersist()
        partial.unpersist()
    return {"mode": "incremental", "src_snapshot": sid}
