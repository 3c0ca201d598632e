"""Snapshot catalog: checkpoint/resume over versioned table writes.

Production target is Iceberg (snapshot ids, manifest pruning); this
sandbox has no Iceberg runtime jar, so the same contract is implemented
over parquet directories + JSON manifests.  The abstraction is what the
engine codes against — swapping `SnapshotCatalog` for
``df.writeTo(...).append()`` + Iceberg snapshot ids is a one-class
change.

≡ the reference's pickle checkpoint / reload of a SceneCollection
(`eodal/core/scene.py:658-665`, ``:307-329``) and the Mapper's temp-file
resume (`eodal/mapper/mapper.py:599-603`) — done as atomic table
snapshots instead of ad-hoc files.

Write layout: tables are written **sorted by cell_id** (≡ COG tiling,
`eodal/core/raster.py:1759-1783`) so parquet min/max footer stats prune
spatial predicates — the "layout decision" of SURVEY.md §4.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _file_stats(data_dir: str, cols: tuple[str, ...]) -> list[dict]:
    """Per-file min/max stats for the clustering columns, read from the
    parquet FOOTERS (metadata plane — no data pages touched).

    ≡ Iceberg's manifest entries: each data file carries lower/upper
    bounds per column, written at commit time.  In a cluster the task
    write-results carry these back to the commit coordinator; reading
    footers at commit is the single-process equivalent (O(files) tiny
    metadata reads, done ONCE per snapshot, amortized over every
    subsequent pruned scan).
    """
    if not cols:
        return []
    import pyarrow.parquet as pq

    def jsonable(v):
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    out = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(data_dir, name))
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, dict] = {}
        for c in cols:
            if c not in idx:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            stats[c] = {
                "min": jsonable(min(mins)) if mins else None,
                "max": jsonable(max(maxs)) if maxs else None,
            }
        out.append({"name": name, "stats": stats})
    return out


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifest.json")

    def _load_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"snapshots": []}

    def snapshots(self, table: str) -> list[dict]:
        return self._load_manifest(table)["snapshots"]

    def current_snapshot(self, table: str) -> dict | None:
        snaps = self.snapshots(table)
        return snaps[-1] if snaps else None

    def write(
        self,
        df: DataFrame,
        table: str,
        sort_by: tuple[str, ...] = (),
        meta: dict | None = None,
        n_files: int | None = None,
    ) -> dict:
        """Append a new snapshot. Sorted write (range-partitioned by the
        sort key) gives min/max pruning on those columns; ``n_files``
        pins the file count (else AQE sizes it), which also sets the
        granularity of manifest-level pruning in :meth:`scan`."""
        man = self._load_manifest(table)
        sid = len(man["snapshots"]) + 1
        data_dir = os.path.join(self._tdir(table), f"v{sid}")
        if sort_by:
            parts = (n_files,) if n_files else ()
            out = df.repartitionByRange(*parts, *sort_by).sortWithinPartitions(
                *sort_by
            )
        else:
            out = df.repartition(n_files) if n_files else df
        out.write.mode("overwrite").parquet(data_dir)
        n = out.sparkSession.read.parquet(data_dir).count()
        snap = {
            "snapshot_id": sid,
            "parent_id": sid - 1 if sid > 1 else None,
            "path": data_dir,
            "row_count": n,
            "sort_by": list(sort_by),
            "files": _file_stats(data_dir, sort_by),
            "meta": meta or {},
        }
        man["snapshots"].append(snap)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit
        return snap

    def read(self, spark: SparkSession, table: str, snapshot_id: int | None = None) -> DataFrame:
        """Time-travel read — ≡ Iceberg ``VERSION AS OF``."""
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table}")
        snap = snaps[-1] if snapshot_id is None else snaps[snapshot_id - 1]
        return spark.read.parquet(snap["path"])

    def scan(
        self,
        spark: SparkSession,
        table: str,
        ranges: dict[str, tuple],
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Manifest-pruned scan — ≡ Iceberg's manifest-level file
        skipping, the capability that makes a 100 TB table queryable
        without listing/opening 100 k files.

        ``ranges`` maps column → (lo, hi) inclusive, or a LIST of such
        ranges (OR-semantics — e.g. the OR-of-BETWEEN ranges
        `grid.morton_ranges` plans for a bbox; a file survives if any
        range overlaps, rows must fall in some range).  Combined with a
        Morton-sorted write this stacks THREE pruning levels: manifest
        file skipping here, parquet row-group stats inside the
        surviving files, then the residual filter.  File selection
        happens on the DRIVER against the manifest's per-file min/max
        stats (metadata plane, no Spark job, no file opens); Spark then
        reads only the surviving files, and parquet row-group stats
        prune further *within* them (the table is range-partitioned and
        sorted by ``sort_by`` at write).  The residual predicate is
        applied so the result is exactly ``read(...).filter(...)`` —
        pruning is a pure optimization, never a semantics change.

        Files with no recorded stats for a column are kept
        (conservative, like Iceberg's null-stats behavior).
        """
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table}")
        snap = snaps[-1] if snapshot_id is None else snaps[snapshot_id - 1]
        if not ranges:  # no predicate → plain snapshot read
            return spark.read.parquet(snap["path"])
        for c, r in ranges.items():
            if r is None or (isinstance(r, list) and not r):
                # e.g. grid.cell_disk_ranges' over-budget None forwarded
                raise ValueError(
                    f"ranges[{c!r}] is {r!r} — pass concrete (lo, hi) "
                    "range(s), or omit the column to skip filtering on it"
                )
        norm = {
            c: (r if isinstance(r, list) else [r]) for c, r in ranges.items()
        }
        files = snap.get("files") or []
        if files:
            keep = []
            for frec in files:
                stats = frec.get("stats", {})
                ok = True
                for col, rs in norm.items():
                    st = stats.get(col)
                    if st is None or st["min"] is None or st["max"] is None:
                        continue  # no stats → cannot prune this file
                    if not any(
                        st["min"] <= hi and st["max"] >= lo for lo, hi in rs
                    ):
                        ok = False
                        break
                if ok:
                    keep.append(os.path.join(snap["path"], frec["name"]))
            if not keep:
                from pyspark.sql import functions as F

                # schema-preserving empty: the optimizer folds
                # filter(false) to an empty LocalRelation — no scan
                df = spark.read.parquet(snap["path"]).where(F.lit(False))
            else:
                df = spark.read.parquet(*keep)
        else:  # pre-stats snapshot: fall back to a full read
            df = spark.read.parquet(snap["path"])
        import functools
        import operator

        from eodal_spark import grid

        residual = functools.reduce(
            operator.and_,
            [grid.ranges_predicate(c, rs) for c, rs in norm.items()],
        )
        return df.filter(residual)

    def rollback(self, table: str, snapshot_id: int) -> None:
        man = self._load_manifest(table)
        dropped = [s for s in man["snapshots"] if s["snapshot_id"] > snapshot_id]
        man["snapshots"] = [
            s for s in man["snapshots"] if s["snapshot_id"] <= snapshot_id
        ]
        # same atomic tmp+replace commit as write(): a crash mid-dump
        # must never leave a truncated manifest that bricks the table
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(table))
        for s in dropped:
            shutil.rmtree(s["path"], ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Bucketed, sorted table write (Hive-bucketed parquet; Iceberg
    bucket-partitioning in production).

    Two tables bucketed on the same key join WITHOUT an exchange — the
    co-located join strategy for repeated large×large joins on
    ``cell_id`` (SURVEY.md §2.3: "bucketing for co-located joins").
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


class ResumablePipeline:
    """Driver loop with stage-level resume: a stage whose output snapshot
    exists (matching stage name in snapshot meta) is *skipped* and its
    snapshot read back — lineage-true resume from checkpoint.

    ≡ pickle round-trip resume (scene.py:307-329) with real atomicity.
    """

    def __init__(self, catalog: SnapshotCatalog, spark: SparkSession):
        self.catalog = catalog
        self.spark = spark
        self.executed: list[str] = []
        self.skipped: list[str] = []

    def stage(
        self,
        name: str,
        fn,
        sort_by: tuple[str, ...] = (),
    ) -> DataFrame:
        """fn: () -> DataFrame, evaluated only if no snapshot exists."""
        cur = self.catalog.current_snapshot(name)
        if cur is not None and cur["meta"].get("stage") == name:
            self.skipped.append(name)
            return self.catalog.read(self.spark, name)
        df = fn()
        self.catalog.write(df, name, sort_by=sort_by, meta={"stage": name})
        self.executed.append(name)
        return self.catalog.read(self.spark, name)
