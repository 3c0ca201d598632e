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
import re
import shutil
import time

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
    import pyarrow.parquet as pq

    def jsonable(v):
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    out = []
    names = []
    for root, _dirs, fnames in os.walk(data_dir):
        rel = os.path.relpath(root, data_dir)
        for n in fnames:
            if n.endswith(".parquet"):
                # hive-partitioned writes nest files under pv= subdirs;
                # the recorded name is the dir-relative path so every
                # read path joins (table, dir, name) unchanged
                names.append(n if rel == "." else os.path.join(rel, n))
    for name in sorted(names):
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
        out.append({"name": name, "rows": md.num_rows, "stats": stats})
    return out


class ConcurrentCommitError(RuntimeError):
    """Another writer committed to the table since this commit's
    manifest was loaded — re-read and rebuild the commit."""


_ISO_TS = re.compile(r"^\d{4}-\d{2}-\d{2}T")

# segment-file entry cache (segments are immutable once committed)
_SEG_CACHE: dict[str, list] = {}


def _iso_t(v: str) -> str:
    """'YYYY-MM-DD HH:MM:SS' → isoformat 'T' separator (stats form)."""
    if len(v) > 10 and v[10] == " ":
        return v[:10] + "T" + v[11:]
    return v


def _stat_bound(v):
    """User range bound → the manifest-stats value space (the SAME
    coercion the manifest writer applies: bytes → str, datetime/date →
    isoformat)."""
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# Iceberg-style partition transforms (spec §"Partition Transforms"):
# ("year"|"month"|"day"|"hour", col) — temporal truncation, range-prunable;
# ("bucket", n, col) — xxhash64 mod n, eq-prunable (point lookups);
# ("truncate", w, col) — string prefix, eq- and range-prunable;
# ("identity", col) — raw value, eq-prunable.
_TIME_FMT = {
    "year": ("yyyy", 4),
    "month": ("yyyy-MM", 7),
    "day": ("yyyy-MM-dd", 10),
    "hour": ("yyyy-MM-dd'T'HH", 13),
}


def _partition_cols(spec: list) -> list:
    """(pv_name, Column) per spec entry — the HIDDEN derived columns the
    physical layout partitions by.  Users never see them: partitionBy
    strips them from the file data and reads go through explicit file
    paths, so the logical schema stays untouched (the 'hidden' in
    Iceberg's hidden partitioning)."""
    from pyspark.sql import functions as F

    out = []
    for i, entry in enumerate(spec):
        t = entry[0]
        name = f"_pv{i}"
        if t in _TIME_FMT:
            fmt, _w = _TIME_FMT[t]
            out.append((name, F.date_format(F.col(entry[1]), fmt)))
        elif t == "bucket":
            _t, n, c = entry
            # hash the CAST(col AS STRING) form — same contract as the
            # bloom sidecars: the scan-time probe hashes str(value), so
            # int and string keys bucket identically on both sides
            out.append(
                (
                    name,
                    F.pmod(
                        F.xxhash64(F.col(c).cast("string")), F.lit(int(n))
                    ),
                )
            )
        elif t == "truncate":
            _t, w, c = entry
            out.append((name, F.substring(F.col(c), 1, int(w))))
        elif t == "identity":
            out.append((name, F.col(entry[1]).cast("string")))
        else:
            raise ValueError(
                f"unknown partition transform {t!r} — supported: "
                f"{sorted(_TIME_FMT)} + ['bucket', 'truncate', 'identity']"
            )
    return out


def _spec_source_col(entry) -> str:
    return entry[-1]


def _parse_partition(relname: str) -> dict[str, str]:
    """Hive ``k=v`` components of a file's dir-relative path."""
    from urllib.parse import unquote

    out = {}
    for part in relname.split(os.sep)[:-1]:
        if "=" in part:
            k, v = part.split("=", 1)
            out[k] = unquote(v)
    return out


BLOOM_SUFFIX = "-bloom"


def _bloom_sidecar(data_dir: str) -> str:
    return data_dir + BLOOM_SUFFIX


def _write_bloom_sidecar(
    spark: SparkSession,
    data_dir: str,
    cols: tuple[str, ...],
    bits: int,
    k: int,
) -> None:
    """Build per-(file, column) Bloom filters for the data files in
    ``data_dir`` and write them as a SIDECAR parquet dir — the
    point-lookup pruning tier min/max stats cannot provide: on a
    high-cardinality unsorted key (url, doc_id) every file's [min, max]
    spans the whole domain, so an equality scan of a 100k-file table
    would open every file; a per-file bloom answers "provably absent"
    from O(k) stored words per file, no data pages touched.

    Engine shape: ONE extra Spark job per commit over the new files
    only (column-pruned scan of ``cols``), all-native — ``xxhash64``
    double hashing (h1 + i·h2, the standard Kirsch-Mitzenmacher
    construction), explode to (file, col, bit-position), and a
    map-side-combinable ``bit_or`` per 64-bit word.  Only SET words are
    stored (sparse for small files, ~bits/64 rows when saturated); the
    sidecar is written sorted by (col, word) so the scan-time probe
    reads ≤ k words per file via parquet row-group pushdown.

    Values are hashed as their Spark ``CAST(x AS STRING)`` form —
    restrict ``bloom_cols`` to string / integer columns so the
    scan-time probe ``str(value)`` renders identically.  NULLs are not
    indexed (an equality probe is never NULL).
    """
    import functools

    from pyspark.sql import functions as F

    src = spark.read.parquet(data_dir)
    missing = [c for c in cols if c not in src.columns]
    if missing:
        raise KeyError(
            f"bloom column(s) {missing} not in the written data "
            f"schema {src.columns}"
        )
    parts = []
    for c in cols:
        cs = F.col(c).cast("string")
        # reduce both hashes mod bits BEFORE combining: the raw 64-bit
        # h1 + i*h2 overflows under ANSI mode; with r1, r2 < bits <= 2^31
        # the combination stays far inside long range
        r1 = F.pmod(F.xxhash64(cs), F.lit(bits))
        r2 = F.pmod(F.xxhash64(cs, F.lit(1)), F.lit(bits))
        pos = F.array(
            *[F.pmod(r1 + F.lit(i) * r2, F.lit(bits)) for i in range(k)]
        )
        parts.append(
            src.where(F.col(c).isNotNull()).select(
                F.element_at(
                    F.split(F.input_file_name(), "/"), -1
                ).alias("fname"),
                F.lit(c).alias("col"),
                F.explode(pos).alias("pos"),
            )
        )
    allp = functools.reduce(lambda a, b: a.unionByName(b), parts)
    (
        allp.select(
            "fname",
            "col",
            F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("fname", "col", "word")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .repartition(1)
        .sortWithinPartitions("col", "word")
        .write.mode("overwrite")
        .parquet(_bloom_sidecar(data_dir))
    )


_POS_CACHE: dict = {}


def _bloom_positions(
    spark: SparkSession, value: str, bits: int, k: int
) -> list[tuple[int, int]]:
    """(word, bit) probe positions of ``value`` — computed BY SPARK
    (constant-folded 1-row job) so the probe hash is bit-identical to
    the build job's ``xxhash64``, with no reimplementation to drift.
    Cached per (value, bits, k): the job is the probe's only fixed
    driver cost, and repeated lookups of hot keys skip it entirely."""
    from pyspark.sql import functions as F

    ckey = (value, bits, k)
    hit = _POS_CACHE.get(ckey)
    if hit is not None:
        return hit
    lit = F.lit(value)
    # MUST mirror _write_bloom_sidecar's combination exactly
    r1 = F.pmod(F.xxhash64(lit), F.lit(bits))
    r2 = F.pmod(F.xxhash64(lit, F.lit(1)), F.lit(bits))
    row = (
        spark.range(1)
        .select(
            *[
                F.pmod(r1 + F.lit(i) * r2, F.lit(bits)).alias(f"p{i}")
                for i in range(k)
            ]
        )
        .first()
    )
    out = [(int(row[i]) >> 6, int(row[i]) & 63) for i in range(k)]
    if len(_POS_CACHE) > 65536:  # bound driver memory on adversarial use
        _POS_CACHE.clear()
    _POS_CACHE[ckey] = out
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

    def _commit_manifest(self, table: str, man: dict) -> None:
        """THE manifest commit protocol — one implementation so crash
        behavior can never diverge between write/rollback/expire.

        Optimistic concurrency (≡ Iceberg's metastore CAS): the
        manifest carries a ``version``; a commit holds an exclusive
        ``flock`` on a persistent lockfile (kernel-released on process
        death — no stale-lock breaking, no unlink races), verifies the
        on-disk version still equals the one this commit was BUILT
        against, bumps it, and atomically renames.  A concurrent
        writer that lost the race gets `ConcurrentCommitError` and must
        re-read + rebuild — never a silent lost update.  Local-FS
        scope: multi-HOST coordination needs a metastore/CAS service,
        the same caveat as Iceberg's HadoopCatalog."""
        import fcntl

        path = self._manifest_path(table)
        fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR)
        deadline = time.time() + 10.0
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    if time.time() > deadline:
                        raise TimeoutError(
                            f"could not acquire commit lock for {table!r}"
                        )
                    time.sleep(0.05)
            on_disk = self._load_manifest(table)
            if on_disk.get("version", 0) != man.get("version", 0):
                raise ConcurrentCommitError(
                    f"manifest for {table!r} moved from version "
                    f"{man.get('version', 0)} to "
                    f"{on_disk.get('version', 0)} since this commit was "
                    "built — re-read and retry"
                )
            man["version"] = man.get("version", 0) + 1
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(man, f, indent=1)
            os.replace(tmp, path)
        finally:
            os.close(fd)  # releases the flock

    def commit_with_retry(
        self, fn, retries: int = 5, backoff: float = 0.05
    ):
        """Run a commit operation with optimistic-concurrency retries.

        ``fn`` is a zero-arg callable performing ONE commit against this
        catalog (e.g. ``lambda: cat.write(df, "t", mode="append")`` or a
        ``delete_range`` call).  Every public commit path loads the
        manifest fresh at call time, so re-invoking ``fn`` after a
        ``ConcurrentCommitError`` rebuilds the commit on top of the
        winning writer's snapshot — the standard Iceberg retry loop.
        Exponential backoff decorrelates herds; the last failure is
        re-raised so a persistently-contended table surfaces loudly."""
        for attempt in range(retries + 1):
            try:
                return fn()
            except ConcurrentCommitError:
                if attempt == retries:
                    raise
                time.sleep(backoff * (2**attempt))

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
        mode: str = "overwrite",
        bloom_cols: tuple[str, ...] = (),
        bloom_bits: int = 1 << 17,
        bloom_k: int = 7,
        zorder: tuple[str, str] | tuple = (),
        zorder_bits: int = 16,
        partition_by: list | None = None,
        branch: str | None = None,
    ) -> dict:
        """Commit a new snapshot.

        ``branch`` targets a named branch created with
        :meth:`create_branch` instead of main (≡ Iceberg branch writes
        / the WAP staging step): the commit's parent is the branch
        head, main is untouched, and readers only see the rows after
        :meth:`publish_branch` fast-forwards them onto main.

        ``mode="overwrite"`` — the snapshot is exactly ``df``.
        ``mode="append"``    — the snapshot is the parent's data files
        PLUS ``df`` written as new files: the parent's bytes are never
        rewritten or copied, only re-referenced in the manifest — the
        Iceberg append-commit contract that makes incremental ingestion
        of a 100 TB table affordable (commit cost is O(new data), not
        O(table)).

        Sorted write (range-partitioned by the sort key) gives min/max
        pruning on those columns; ``n_files`` pins the NEW file count
        (else AQE sizes it), which also sets the granularity of
        manifest-level pruning in :meth:`scan`.

        Each snapshot records its FULL file list (cumulative under
        appends), so reads resolve in one manifest load with no parent
        walking; the manifest therefore grows with history and is kept
        bounded by the same maintenance Iceberg uses — :meth:`compact`
        collapses the list, :meth:`expire_snapshots` drops old entries.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unknown write mode {mode!r}")
        if zorder and sort_by:
            raise ValueError(
                "pass sort_by OR zorder — one clustering layout per "
                "snapshot"
            )
        if zorder and len(zorder) != 2:
            raise ValueError(
                "zorder takes exactly two numeric columns (the 2-D "
                "z-curve; chain more dims via cell encoding)"
            )
        partition_by = list(partition_by or [])
        pv = _partition_cols(partition_by)  # validates the spec
        man = self._load_manifest(table)
        branch_snaps = man.get("branch_snapshots") or []
        if branch is not None:
            b = (man.get("branches") or {}).get(branch)
            if b is None:
                raise KeyError(
                    f"no branch {branch!r} on table {table!r} — "
                    "create_branch() first"
                )
            parent_snap = next(
                (
                    s
                    for s in man["snapshots"] + branch_snaps
                    if s["snapshot_id"] == b["head"]
                ),
                None,
            )
            if parent_snap is None:
                raise RuntimeError(
                    f"branch {branch!r} on table {table!r} points at "
                    f"snapshot {b['head']} which no longer exists — the "
                    "ref is corrupted (expired past a branch head?); "
                    "drop_branch() and re-stage"
                )
        else:
            parent_snap = man["snapshots"][-1] if man["snapshots"] else None
        # max+1, NOT len+1: expire_snapshots truncates the front of the
        # list, and len+1 would then collide with (and clobber the
        # v-dir of) a surviving snapshot.  Branch snapshots share the
        # sid space — ids stay globally monotonic so equality-delete
        # sequence semantics survive a later publish/cherry-pick.
        sid = max(
            (
                s["snapshot_id"]
                for s in man["snapshots"] + branch_snaps
            ),
            default=0,
        ) + 1
        # unique dir per COMMIT ATTEMPT: two racing writers both compute
        # sid N, but only the manifest CAS decides the winner — a shared
        # v{N} dir would let the loser clobber the winner's committed
        # data files before its own commit is rejected.  _dir_sid parses
        # the leading digits, so sequence semantics are unaffected; the
        # loser's orphan dir is removed on ConcurrentCommitError.
        import uuid

        data_dir = os.path.join(
            self._tdir(table), f"v{sid}-{uuid.uuid4().hex[:8]}"
        )
        if zorder:
            from pyspark.sql import functions as F

            from eodal_spark import grid

            za, zb = zorder
            # ONE tiny agg for the global bounds the uniform bucketing
            # needs — same cost class as the footer-stats read
            b = df.agg(
                F.min(za), F.max(za), F.min(zb), F.max(zb)
            ).first()
            zk = grid.zorder_key_2d(
                F.col(za), F.col(zb),
                b[0] if b[0] is not None else 0.0,
                b[1] if b[1] is not None else 1.0,
                b[2] if b[2] is not None else 0.0,
                b[3] if b[3] is not None else 1.0,
                bits=zorder_bits,
            )
            parts = (n_files,) if n_files else ()
            # the projection DROPS the key after the sort — files carry
            # only the user schema; clustering shows up purely in the
            # per-file min/max stats of BOTH zorder columns
            out = (
                df.withColumn("_zorder_key", zk)
                .repartitionByRange(*parts, "_zorder_key")
                .sortWithinPartitions("_zorder_key")
                .drop("_zorder_key")
            )
        elif sort_by:
            parts = (n_files,) if n_files else ()
            out = df.repartitionByRange(*parts, *sort_by).sortWithinPartitions(
                *sort_by
            )
        else:
            out = df.repartition(n_files) if n_files else df
        # Spark's default INT96 timestamps carry NO parquet min/max
        # stats — a timestamp sort column would silently lose both
        # manifest pruning and row-group skipping.  Catalog data files
        # are written as TIMESTAMP_MICROS (the Iceberg spec type).
        spark = df.sparkSession
        ts_conf = "spark.sql.parquet.outputTimestampType"
        prev_ts = spark.conf.get(ts_conf)
        try:
            spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
            if pv:
                # hidden partitioning: derive the transform columns,
                # hive-partition the physical layout by them, and let
                # partitionBy strip them from the file bytes — the
                # logical schema never changes (≡ Iceberg hidden
                # partitioning; users query ts/host, never day/bucket)
                withpv = out
                for name, col_ in pv:
                    withpv = withpv.withColumn(name, col_)
                if n_files and not sort_by and not zorder:
                    withpv = withpv.repartition(n_files, *[n for n, _ in pv])
                withpv.write.mode("overwrite").partitionBy(
                    *[n for n, _ in pv]
                ).parquet(data_dir)
            else:
                out.write.mode("overwrite").parquet(data_dir)
        finally:
            spark.conf.set(ts_conf, prev_ts)
        dname = os.path.basename(data_dir)
        stat_cols = tuple(sort_by) if sort_by else tuple(zorder)
        files = [
            {**f, "dir": dname} for f in _file_stats(data_dir, stat_cols)
        ]
        if pv:
            for f in files:
                f["partition"] = _parse_partition(f["name"])
        if bloom_cols:
            # ONE extra job over the NEW files only — O(new data), like
            # the footer stats; appends never re-bloom the parent's dirs
            _write_bloom_sidecar(
                spark, data_dir, tuple(bloom_cols), bloom_bits, bloom_k
            )
        # row count from the same footer reads that produced the stats —
        # no second Spark job per commit
        n = sum(f["rows"] for f in files)
        if mode == "append" and parent_snap is not None:
            parent = parent_snap
            parent_files = self._snap_files(parent)
            if not parent_files:
                # legacy pre-stats snapshot: reconstruct its file list
                # from the data dir rather than silently dropping the
                # parent's rows from the child snapshot
                pdir = os.path.basename(parent["path"])
                parent_files = [
                    {**f, "dir": pdir}
                    for f in _file_stats(
                        parent["path"],
                        tuple(parent.get("sort_by") or ()),
                    )
                ]
                if not parent_files:
                    raise ValueError(
                        f"cannot append onto snapshot "
                        f"{parent['snapshot_id']}: no data files found "
                        f"under {parent['path']}"
                    )
            files = parent_files + files
            n += parent["row_count"]
        carry = (
            parent_snap
            if mode == "append" and parent_snap is not None
            else {}
        )
        delete_files = list(carry.get("delete_files") or [])
        delete_ranges = list(carry.get("delete_ranges") or [])
        pos_delete_files = list(carry.get("pos_delete_files") or [])
        blooms = dict(carry.get("blooms") or {})
        if bloom_cols:
            blooms[dname] = {
                "cols": list(bloom_cols),
                "bits": int(bloom_bits),
                "k": int(bloom_k),
            }
        pspecs = dict(carry.get("partition_specs") or {})
        if pv:
            # spec recorded PER DIR: partition EVOLUTION is just a later
            # write with a different spec — old dirs keep theirs, scan
            # consults each file's own dir spec (≡ Iceberg spec-id)
            pspecs[dname] = [list(e) for e in partition_by]
        segments = self._seal_files(table, sid, files)
        snap = {
            "snapshot_id": sid,
            "parent_id": (
                parent_snap["snapshot_id"]
                if parent_snap is not None
                else None
            ),
            "committed_at": time.time(),
            "path": data_dir,
            "row_count": n,
            "sort_by": list(sort_by),
            "zorder": list(zorder),
            "mode": mode,
            "segments": segments,
            "delete_files": delete_files,
            "delete_ranges": delete_ranges,
            "pos_delete_files": pos_delete_files,
            "blooms": blooms,
            "partition_specs": pspecs,
            "meta": meta or {},
        }
        self._register_new_columns(man, df)
        if branch is not None:
            man.setdefault("branch_snapshots", []).append(snap)
            man["branches"][branch]["head"] = sid
        else:
            man["snapshots"].append(snap)
        try:
            self._commit_manifest(table, man)  # atomic commit
        except ConcurrentCommitError:
            shutil.rmtree(data_dir, ignore_errors=True)  # orphan loser dir
            shutil.rmtree(_bloom_sidecar(data_dir), ignore_errors=True)
            self._drop_new_segments(table, segments, sid)
            raise
        return snap

    # -- segmented manifests (≡ Iceberg manifest-list + manifests) -------
    #
    # The root manifest.json holds snapshots/schema/refs/branches; each
    # snapshot's FILE ENTRIES live in immutable per-commit SEGMENT files
    # under <table>/manifests/.  A snapshot references segments by name
    # plus coarse per-segment stats (rows, dirs, column bounds), so:
    #   * a commit appends O(new files) manifest bytes — reused parent
    #     segments are re-referenced, never rewritten (at 100 TB / 100k
    #     files the old single-JSON design serialized the whole file
    #     list per commit and parsed it per query — the last O(table)
    #     driver cost in the engine);
    #   * scan() prunes whole SEGMENTS from the ref bounds before
    #     loading any entry — manifest-level skipping above the
    #     file-level skipping (Iceberg's manifest-list partition
    #     summaries).
    # Legacy snapshots with inline "files" lists keep working; the
    # first new commit on top of one migrates its entries into a
    # segment.  Segments are immutable → cached per path.

    @staticmethod
    def _seg_dir(tdir: str) -> str:
        return os.path.join(tdir, "manifests")

    def _load_segment(self, tdir: str, name: str) -> list[dict]:
        path = os.path.join(self._seg_dir(tdir), name)
        cached = _SEG_CACHE.get(path)
        if cached is None:
            with open(path) as f:
                cached = json.load(f)
            if len(_SEG_CACHE) > 4096:  # bound driver memory
                _SEG_CACHE.clear()
            _SEG_CACHE[path] = cached
        return cached

    @staticmethod
    def _seg_ref(name: str, entries: list[dict]) -> dict:
        """Segment reference for the root manifest: name + the coarse
        stats segment-level pruning and dir liveness need WITHOUT
        loading the segment.  A column's bounds are recorded only when
        every entry has same-typed min/max stats for it (else pruning
        on that column must fall through to the file level —
        conservative, like Iceberg's null-stats manifests)."""
        bounds: dict[str, list] = {}
        cols: set[str] = set()
        for e in entries:
            cols |= set((e.get("stats") or {}).keys())
        for c in cols:
            mins, maxs = [], []
            for e in entries:
                st = (e.get("stats") or {}).get(c)
                if st is None or st["min"] is None or st["max"] is None:
                    mins = []
                    break
                mins.append(st["min"])
                maxs.append(st["max"])
            if not mins:
                continue
            if len({isinstance(v, str) for v in mins + maxs}) > 1:
                continue  # mixed-type stats: not comparable segment-wide
            bounds[c] = [min(mins), max(maxs)]
        return {
            "name": name,
            "n_files": len(entries),
            "rows": sum(int(e.get("rows") or 0) for e in entries),
            "dirs": sorted({e["dir"] for e in entries}),
            "bounds": bounds,
        }

    @staticmethod
    def _seg_ref_excluded(ref: dict, norm: dict) -> bool:
        """True iff the segment's coarse bounds PROVABLY exclude every
        normalized range on some predicate column — the same interval
        arithmetic as the per-file pass (string/iso coercions included);
        any doubt (missing bounds, type mismatch) keeps the segment and
        defers to the file level."""
        bounds = ref.get("bounds") or {}
        for col, rs in norm.items():
            b = bounds.get(col)
            if b is None:
                continue
            mn, mx = b
            is_str = isinstance(mn, str)
            if is_str and _ISO_TS.match(mn):
                rs = [
                    (
                        _iso_t(lo) if isinstance(lo, str) else lo,
                        _iso_t(hi) if isinstance(hi, str) else hi,
                    )
                    for lo, hi in rs
                ]
            if any(
                isinstance(lo, str) != is_str or isinstance(hi, str) != is_str
                for lo, hi in rs
            ):
                continue  # mismatched types: the file pass raises for the user
            if not any(mn <= hi and mx >= lo for lo, hi in rs):
                return True
        return False

    def _seal_files(self, table: str, sid: int, files: list[dict]) -> list[dict]:
        """Turn a new snapshot's resolved file-entry list into segment
        refs.  Entries still carrying their source segment tag (set by
        :meth:`_snap_files`) re-reference that segment VERBATIM when the
        whole segment survives; everything else — brand-new files, or
        survivors of a partially-deleted segment — is written as ONE new
        segment named for this commit.  Commit cost in manifest bytes is
        therefore O(new + rewritten entries), never O(table)."""
        tdir = self._tdir(table)
        groups: dict = {}
        for f in files:
            groups.setdefault(f.get("_seg"), []).append(f)
        refs: list[dict] = []
        leftover: list[dict] = []
        for name, entries in groups.items():
            if name is None:
                leftover.extend(entries)
                continue
            seg_full = self._load_segment(tdir, name)
            same = len(entries) == len(seg_full) and {
                (e["dir"], e["name"]) for e in entries
            } == {(s["dir"], s["name"]) for s in seg_full}
            if same:
                refs.append(self._seg_ref(name, seg_full))
            else:
                leftover.extend(entries)
        if leftover:
            import uuid

            segdir = self._seg_dir(tdir)
            os.makedirs(segdir, exist_ok=True)
            newname = f"seg-{sid:08d}-{uuid.uuid4().hex[:8]}.json"
            clean = [
                {k: v for k, v in e.items() if k != "_seg"} for e in leftover
            ]
            tmp = os.path.join(segdir, newname + ".tmp")
            with open(tmp, "w") as f:
                json.dump(clean, f)
            os.replace(tmp, os.path.join(segdir, newname))
            _SEG_CACHE[os.path.join(segdir, newname)] = clean
            refs.append(self._seg_ref(newname, clean))
        return refs

    def _drop_new_segments(self, table: str, refs: list[dict], sid: int) -> None:
        """Remove segments written by a commit attempt that lost the
        manifest CAS (reused refs from older commits stay — they are
        live via the winning history)."""
        prefix = f"seg-{sid:08d}-"
        for r in refs:
            if r["name"].startswith(prefix):
                p = os.path.join(self._seg_dir(self._tdir(table)), r["name"])
                _SEG_CACHE.pop(p, None)
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def _snap_dirs(self, snap: dict) -> set[str]:
        """Data dirs a snapshot's files live in — from the segment refs
        when segmented (no segment load), else from the inline list."""
        segs = snap.get("segments")
        if segs is not None:
            out: set[str] = set()
            for r in segs:
                out |= set(r.get("dirs") or [])
            return out
        return {f["dir"] for f in self._snap_files(snap)}

    def _live_segments(self, snaps: list[dict]) -> set[str]:
        return {
            r["name"] for s in snaps for r in (s.get("segments") or [])
        }

    def _snap_files(self, snap: dict) -> list[dict]:
        """File entries of a snapshot.  Segmented snapshots resolve
        their segment refs (each entry tagged ``_seg`` with its source
        segment so :meth:`_seal_files` can re-reference intact segments
        on the next commit); legacy snapshots read the inline list
        (entries written before the append feature lack 'dir' — they
        belong to the snapshot's own v-dir)."""
        segs = snap.get("segments")
        if segs is not None:
            tdir = os.path.dirname(snap["path"])
            out: list[dict] = []
            for ref in segs:
                out.extend(
                    {**f, "_seg": ref["name"]}
                    for f in self._load_segment(tdir, ref["name"])
                )
            return out
        d = os.path.basename(snap["path"])
        return [
            (f if "dir" in f else {**f, "dir": d})
            for f in (snap.get("files") or [])
        ]

    def _file_paths(self, table: str, snap: dict) -> list[str]:
        return [
            os.path.join(self._tdir(table), f["dir"], f["name"])
            for f in self._snap_files(snap)
        ]

    def _get_snap(
        self,
        table: str,
        snapshot_id: int | None,
        snaps: list[dict] | None = None,
    ) -> dict:
        """Resolve a snapshot; pass ``snaps`` to reuse one manifest load
        across multiple lookups (one consistent view, no TOCTOU between
        them)."""
        if snaps is None:
            snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table}")
        if snapshot_id is None:
            return snaps[-1]
        for s in snaps:
            if s["snapshot_id"] == snapshot_id:
                return s
        raise KeyError(f"no snapshot {snapshot_id} for table {table}")

    @staticmethod
    def _read_files(
        spark: SparkSession, paths: list[str], merge: bool | None = None
    ) -> DataFrame:
        """Read a snapshot's file set.  When the files span multiple
        v-dirs (append chains), footers are schema-MERGED so additive
        column evolution works: an appended batch may carry new
        columns, and older files surface them as NULL — Iceberg's
        add-column semantics.  Single-dir snapshots skip the merge
        (it costs a footer read per file).

        ``merge`` overrides the inference: a PRUNED read must pass the
        SNAPSHOT's multi-dir-ness, not the surviving subset's —
        otherwise the result schema would depend on which files a
        predicate happens to keep."""
        if merge is None:
            merge = len({os.path.dirname(p) for p in paths}) > 1
        reader = spark.read
        if merge:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    # -- schema evolution (≡ Iceberg field-id schema evolution) ----------
    #
    # The manifest carries a field-id schema: every live column has a
    # stable integer id; renames change only the NAME bound to an id,
    # drops retire the id, adds mint a fresh one.  Data files keep their
    # write-time physical names forever; the read path binds each file's
    # physical columns to ids via the schema version that was current
    # when the file's snapshot committed, then projects ids to CURRENT
    # names.  This is exactly Iceberg's contract (spec §4 "Schema
    # Evolution"): renames never rewrite data, re-adding a dropped name
    # gets a NEW id so the old column's bytes can never resurface, and
    # all changes are O(manifest) metadata commits.  The reference
    # (eodal) has no table format at all; this extends the catalog tier
    # the same way its Band API fixes band names at load
    # (`eodal/core/raster.py` band_names) but here names may evolve.
    #
    # Version resolution: schema changes do not create snapshots; each
    # superseded version is logged with ``last_sid`` = the max snapshot
    # id at the moment it was replaced.  A data dir ``v{S}-…`` was
    # written under the OLDEST logged version with ``last_sid >= S``
    # (falling through to the current fields) — no per-file bookkeeping.

    def table_schema(self, table: str) -> list[dict] | None:
        """Current field-id schema: ``[{"id", "name", "type"}, ...]`` in
        column order, or ``None`` when the table has never had a schema
        change (plain name-based reads)."""
        st = self._load_manifest(table).get("schema")
        return [dict(f) for f in st["fields"]] if st else None

    def _ensure_schema(self, spark: SparkSession, table: str, man: dict) -> dict:
        """Lazily initialize field-id tracking from the current
        snapshot's merged read schema (footer reads only).  Until the
        first rename/drop/add, tables carry no schema state and reads
        stay purely name-based — zero cost for the common case."""
        st = man.get("schema")
        if st:
            return st
        if not man["snapshots"]:
            raise FileNotFoundError(
                f"no snapshots for table {table!r} — write data before "
                "evolving its schema"
            )
        snap = man["snapshots"][-1]
        files = self._snap_files(snap)
        paths = (
            [
                os.path.join(self._tdir(table), f["dir"], f["name"])
                for f in files
            ]
            if files
            else [snap["path"]]
        )
        schema = self._read_files(spark, paths, merge=True).schema
        fields = [
            {"id": i + 1, "name": f.name, "type": f.dataType.simpleString()}
            for i, f in enumerate(schema.fields)
        ]
        man["schema"] = {
            "next_id": len(fields) + 1,
            "version": 0,
            "fields": fields,
            "log": [],
        }
        return man["schema"]

    @staticmethod
    def _push_schema_version(man: dict, st: dict) -> None:
        st["log"].append(
            {
                "version": st["version"],
                "last_sid": max(
                    (s["snapshot_id"] for s in man["snapshots"]), default=0
                ),
                "fields": [dict(f) for f in st["fields"]],
            }
        )
        st["version"] += 1

    @staticmethod
    def _fields_for_sid(st: dict, sid: int) -> list[dict]:
        """Schema version a data dir with snapshot id ``sid`` was
        written under — oldest logged version still covering it."""
        for entry in st["log"]:
            if sid <= entry["last_sid"]:
                return entry["fields"]
        return st["fields"]

    def _translate_cols(
        self, st: dict | None, names: list[str], sid: int
    ) -> list[str]:
        """Map column ``names`` recorded at snapshot ``sid`` (e.g. a
        delete file's key columns) to their CURRENT names via field
        ids.  Identity when no schema state exists."""
        if not st or not st["log"]:
            return list(names)
        then = {f["name"]: f["id"] for f in self._fields_for_sid(st, sid)}
        now = {f["id"]: f["name"] for f in st["fields"]}
        out = []
        for n in names:
            fid = then.get(n)
            if fid is None or fid not in now:
                raise KeyError(
                    f"column {n!r} (recorded at snapshot {sid}) no "
                    "longer exists in the current schema"
                )
            out.append(now[fid])
        return out

    def rename_column(
        self, spark: SparkSession, table: str, old: str, new: str
    ) -> None:
        """Rename a column — O(manifest) metadata commit, no data
        rewritten; old files keep their physical name and are re-bound
        at read via the field id (≡ ``ALTER TABLE RENAME COLUMN``)."""
        man = self._load_manifest(table)
        st = self._ensure_schema(spark, table, man)
        names = [f["name"] for f in st["fields"]]
        if old not in names:
            raise KeyError(f"no column {old!r} in table {table!r}")
        if new in names:
            raise ValueError(
                f"column {new!r} already exists in table {table!r}"
            )
        self._push_schema_version(man, st)
        next(f for f in st["fields"] if f["name"] == old)["name"] = new
        self._commit_manifest(table, man)

    def drop_column(self, spark: SparkSession, table: str, name: str) -> None:
        """Drop a column — metadata-only: the field id is retired, old
        files' bytes stay but can never resurface (re-adding the same
        name mints a NEW id).  Refuses when an active delete file or
        range delete references the column (same constraint Iceberg
        places on identifier/partition fields)."""
        man = self._load_manifest(table)
        st = self._ensure_schema(spark, table, man)
        names = [f["name"] for f in st["fields"]]
        if name not in names:
            raise KeyError(f"no column {name!r} in table {table!r}")
        fid = next(f["id"] for f in st["fields"] if f["name"] == name)
        # guard EVERY retained snapshot, not just the current one: an
        # older snapshot (still addressable by id/tag/as_of — the tag
        # docs promise it stays readable) may carry delete entries on
        # this field even after a compact() cleared them from HEAD, and
        # its time-travel read would raise KeyError post-drop
        for snap_ in man["snapshots"]:
            for d in snap_.get("delete_files") or []:
                then = {
                    f["name"]: f["id"]
                    for f in self._fields_for_sid(
                        st, d.get("schema_sid", d["sid"])
                    )
                }
                if fid in {then.get(c) for c in d["key_cols"]}:
                    raise ValueError(
                        f"column {name!r} is a key of an equality delete "
                        f"in retained snapshot {snap_['snapshot_id']} — "
                        "compact() + expire_snapshots() first"
                    )
            for r in snap_.get("delete_ranges") or []:
                then = {
                    f["name"]: f["id"]
                    for f in self._fields_for_sid(st, r["sid"])
                }
                if then.get(r["col"]) == fid:
                    raise ValueError(
                        f"column {name!r} is referenced by a range delete "
                        f"in retained snapshot {snap_['snapshot_id']} — "
                        "compact() + expire_snapshots() first"
                    )
        self._push_schema_version(man, st)
        st["fields"] = [f for f in st["fields"] if f["name"] != name]
        self._commit_manifest(table, man)

    def add_column(
        self, spark: SparkSession, table: str, name: str, dtype: str = "string"
    ) -> None:
        """Add a column (typed, reads as NULL for every existing row) —
        metadata-only.  A previously-dropped name may be re-used; it
        gets a fresh field id, so the dropped column's stored values
        never reappear."""
        man = self._load_manifest(table)
        st = self._ensure_schema(spark, table, man)
        if name in {f["name"] for f in st["fields"]}:
            raise ValueError(
                f"column {name!r} already exists in table {table!r}"
            )
        self._push_schema_version(man, st)
        st["fields"].append(
            {"id": st["next_id"], "name": name, "type": dtype}
        )
        st["next_id"] += 1
        self._commit_manifest(table, man)

    @staticmethod
    def _register_new_columns(man: dict, df: DataFrame) -> None:
        """Auto-register columns a write introduces (Iceberg
        mergeSchema-on-write): new names get fresh ids appended to the
        CURRENT version — no log push needed, because files lacking the
        column physically already project it as NULL."""
        st = man.get("schema")
        if not st:
            return
        live = {f["name"] for f in st["fields"]}
        for f in df.schema.fields:
            if f.name not in live:
                st["fields"].append(
                    {
                        "id": st["next_id"],
                        "name": f.name,
                        "type": f.dataType.simpleString(),
                    }
                )
                st["next_id"] += 1

    def _read_resolved(
        self,
        spark: SparkSession,
        table: str,
        paths: list[str],
        merge: bool | None = None,
        state: dict | None = None,
        with_pos_meta: bool = False,
    ) -> DataFrame:
        """Schema-evolution-aware file read: groups ``paths`` by the
        schema version their dir was written under, binds physical
        names to field ids per group, projects every group to the
        CURRENT names/types, and unions.  With no schema state (or no
        logged changes) it is exactly :meth:`_read_files`.

        ``with_pos_meta=True`` additionally materializes ``_dfile``
        (dir/name) and ``_pos`` (``_metadata.row_index``) — the row
        identity the position-delete tier anti-joins on; they must be
        captured at the scan (``_metadata`` is only resolvable there),
        which is why the reader owns them."""
        from pyspark.sql import functions as F

        def attach(df: DataFrame) -> DataFrame:
            if not with_pos_meta:
                return df
            return df.select(
                "*",
                F.regexp_extract(
                    F.col("_metadata.file_path"), r"([^/]+/[^/]+)$", 1
                ).alias("_dfile"),
                F.col("_metadata.row_index").alias("_pos"),
            )

        if not state or not state["log"]:
            return attach(self._read_files(spark, paths, merge=merge))
        by_ver: dict[int, list[str]] = {}
        for p in paths:
            sid = self._dir_sid(os.path.basename(os.path.dirname(p)))
            vi = next(
                (
                    i
                    for i, e in enumerate(state["log"])
                    if sid <= e["last_sid"]
                ),
                -1,
            )
            by_ver.setdefault(vi, []).append(p)
        cur = state["fields"]
        out: DataFrame | None = None
        for vi, ps in sorted(by_ver.items()):
            df = attach(
                spark.read.option("mergeSchema", "true").parquet(
                    *sorted(ps)
                )
            )
            have = set(df.columns)
            gmap = {
                f["id"]: f["name"]
                for f in (
                    state["log"][vi]["fields"] if vi >= 0 else cur
                )
            }
            cols = []
            for f in cur:
                gname = gmap.get(f["id"])
                if gname is not None and gname in have:
                    cols.append(F.col(gname).alias(f["name"]))
                else:
                    cols.append(
                        F.lit(None).cast(f["type"]).alias(f["name"])
                    )
            if with_pos_meta:
                cols += [F.col("_dfile"), F.col("_pos")]
            df = df.select(*cols)
            out = df if out is None else out.unionByName(df)
        assert out is not None
        return out

    def delete_keys(
        self,
        spark: SparkSession,
        table: str,
        keys: DataFrame,
        n_files: int = 1,
    ) -> dict:
        """Commit an EQUALITY-DELETE snapshot (≡ Iceberg v2 equality
        deletes, merge-on-read): rows whose ``keys.columns`` tuple
        matches any key row disappear from subsequent reads WITHOUT
        rewriting a byte of data — the curation/GDPR primitive a
        training corpus needs ("purge these urls") at 100 TB, where an
        overwrite commit would cost a full-table rewrite.

        Sequence semantics match Iceberg: a delete applies only to data
        files committed AT OR BEFORE it — a key re-ingested by a LATER
        append reappears (re-crawled url after a purge).  Commit cost is
        O(|keys|); the read path anti-joins the keys (broadcast when
        small).  :meth:`compact` applies deletes physically and drops
        the delete files; :meth:`read_changes` across a delete raises
        (no file-level delta exists).  ``row_count`` on delete/append
        snapshots is the pre-delete upper bound (exact counts need a
        scan — same contract as Iceberg).
        """
        man = self._load_manifest(table)
        if not man["snapshots"]:
            raise FileNotFoundError(f"no snapshots for table {table}")
        parent = man["snapshots"][-1]
        parent_files = self._snap_files(parent)
        if not parent_files:
            # legacy pre-stats parent: reconstruct its file list (same
            # as write(mode="append")) — an empty files list would make
            # read() fall through to the delete-KEYS dir and return the
            # keys as table data
            pdir = os.path.basename(parent["path"])
            parent_files = [
                {**f, "dir": pdir}
                for f in _file_stats(
                    parent["path"], tuple(parent.get("sort_by") or ())
                )
            ]
            if not parent_files:
                raise ValueError(
                    f"cannot delete from snapshot "
                    f"{parent['snapshot_id']}: no data files found "
                    f"under {parent['path']}"
                )
        key_cols = list(keys.columns)
        schema_state = man.get("schema")
        for d in parent.get("delete_files") or []:
            # compare in CURRENT names — an old delete's recorded names
            # may predate a rename of the same field
            if self._translate_cols(
                schema_state, d["key_cols"], d.get("schema_sid", d["sid"])
            ) != key_cols:
                raise ValueError(
                    f"table {table!r} already has equality deletes on "
                    f"{d['key_cols']} — mixed delete keys are not "
                    "supported; compact() first"
                )
        # a mistyped key column would commit fine and then break every
        # read until rollback — validate against the data schema now
        # (the CURRENT logical schema when evolution is active: a probe
        # file may physically predate a rename)
        if schema_state:
            live = {f["name"] for f in schema_state["fields"]}
            missing = [c for c in key_cols if c not in live]
        else:
            import pyarrow.parquet as pq

            probe = os.path.join(
                self._tdir(table),
                parent_files[0]["dir"],
                parent_files[0]["name"],
            )
            live = set(pq.read_schema(probe).names)
            missing = [c for c in key_cols if c not in live]
        if missing:
            raise ValueError(
                f"delete key column(s) {missing} not in table "
                f"{table!r}'s data schema {sorted(live)}"
            )
        import uuid

        sid = max(s["snapshot_id"] for s in man["snapshots"]) + 1
        ddir = os.path.join(
            self._tdir(table), f"v{sid}-{uuid.uuid4().hex[:8]}"
        )
        keys.select(*key_cols).distinct().repartition(n_files).write.mode(
            "overwrite"
        ).parquet(ddir)
        new_dels = [
            {
                "dir": os.path.basename(ddir),
                "name": f["name"],
                "rows": f["rows"],
                # on-disk size feeds the read-time broadcast decision:
                # row count alone ignores key WIDTH (1M long-URL keys
                # can be hundreds of MB — too big to force-broadcast)
                "bytes": os.path.getsize(os.path.join(ddir, f["name"])),
                "key_cols": key_cols,
                "sid": sid,
            }
            for f in _file_stats(ddir, tuple(key_cols))
        ]
        segments = self._seal_files(table, sid, parent_files)
        snap = {
            "snapshot_id": sid,
            "parent_id": parent["snapshot_id"],
            "committed_at": time.time(),
            "path": ddir,
            "row_count": parent["row_count"],
            "sort_by": list(parent.get("sort_by") or ()),
            "mode": "delete",
            "segments": segments,
            "delete_files": (
                list(parent.get("delete_files") or []) + new_dels
            ),
            "delete_ranges": list(parent.get("delete_ranges") or []),
            "pos_delete_files": list(parent.get("pos_delete_files") or []),
            "blooms": dict(parent.get("blooms") or {}),
            "partition_specs": dict(parent.get("partition_specs") or {}),
            "meta": {},
        }
        man["snapshots"].append(snap)
        try:
            self._commit_manifest(table, man)
        except ConcurrentCommitError:
            shutil.rmtree(ddir, ignore_errors=True)
            self._drop_new_segments(table, segments, sid)
            raise
        return snap

    def upsert(
        self,
        spark: SparkSession,
        df: DataFrame,
        table: str,
        key_cols: tuple[str, ...] | list[str],
        n_files: int | None = None,
        meta: dict | None = None,
    ) -> dict:
        """MERGE INTO, merge-on-read, ONE atomic commit (≡ Iceberg
        ``MERGE`` compiled to equality deletes + appended data files):
        rows of ``df`` REPLACE existing rows with matching ``key_cols``
        tuples and insert otherwise — the re-crawl primitive ("this
        url's page changed") a training corpus needs at 100 TB, where
        copy-on-write MERGE would rewrite every touched file.

        Commit cost is O(|df|): ``df`` is written as new data files and
        its distinct key tuples as an equality-delete file whose
        sequence number is the PARENT snapshot's — it suppresses
        matching rows in all pre-existing data files but not in the
        upsert's own (or any later) files, which is exactly MERGE
        semantics under the catalog's existing sequence rules.  Either
        the whole merge is visible or none of it (single manifest CAS);
        a two-commit delete_keys+append would expose a window where the
        old rows are gone and the new ones not yet there.  ``df`` rows
        are appended verbatim — de-duplicate on the key upstream if it
        may carry several versions of one key.  :meth:`compact` applies
        the merge physically; :meth:`read_changes` across an upsert
        raises (replaced rows are not a file-level delta)."""
        key_cols = list(key_cols)
        missing = [c for c in key_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"upsert key column(s) {missing} not in the DataFrame "
                f"columns {df.columns}"
            )
        man = self._load_manifest(table)
        if not man["snapshots"]:
            # MERGE into an empty target is pure insert
            return self.write(
                df, table, meta=meta, n_files=n_files, mode="overwrite"
            )
        parent = man["snapshots"][-1]
        parent_files = self._snap_files(parent)
        if not parent_files:
            pdir = os.path.basename(parent["path"])
            parent_files = [
                {**f, "dir": pdir}
                for f in _file_stats(
                    parent["path"], tuple(parent.get("sort_by") or ())
                )
            ]
            if not parent_files:
                raise ValueError(
                    f"cannot upsert into snapshot "
                    f"{parent['snapshot_id']}: no data files found "
                    f"under {parent['path']}"
                )
        schema_state = man.get("schema")
        for d in parent.get("delete_files") or []:
            # compare in CURRENT names — an old delete's recorded names
            # may predate a rename of the same field
            if self._translate_cols(
                schema_state, d["key_cols"], d.get("schema_sid", d["sid"])
            ) != key_cols:
                raise ValueError(
                    f"table {table!r} already has equality deletes on "
                    f"{d['key_cols']} — mixed delete keys are not "
                    "supported; compact() first"
                )
        # a mistyped key column would commit fine and break every read
        # until rollback — validate against the data schema now (same
        # guard as delete_keys; CURRENT logical schema when evolution is
        # active, since a probe file may physically predate a rename)
        if schema_state:
            live = {f["name"] for f in schema_state["fields"]}
        else:
            import pyarrow.parquet as pq

            probe = os.path.join(
                self._tdir(table),
                parent_files[0]["dir"],
                parent_files[0]["name"],
            )
            live = set(pq.read_schema(probe).names)
        not_in_data = [c for c in key_cols if c not in live]
        if not_in_data:
            raise ValueError(
                f"upsert key column(s) {not_in_data} not in table "
                f"{table!r}'s data schema {sorted(live)}"
            )
        import uuid

        sid = max(s["snapshot_id"] for s in man["snapshots"]) + 1
        ts_conf = "spark.sql.parquet.outputTimestampType"
        prev_ts = spark.conf.get(ts_conf)
        data_dir = os.path.join(
            self._tdir(table), f"v{sid}-{uuid.uuid4().hex[:8]}"
        )
        kdir = os.path.join(
            self._tdir(table), f"v{sid}-{uuid.uuid4().hex[:8]}"
        )
        sort_by = tuple(parent.get("sort_by") or ())
        out = df
        if sort_by and all(c in df.columns for c in sort_by):
            parts = (n_files,) if n_files else ()
            out = df.repartitionByRange(*parts, *sort_by).sortWithinPartitions(
                *sort_by
            )
        elif n_files:
            out = df.repartition(n_files)
        try:
            spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
            out.write.mode("overwrite").parquet(data_dir)
            df.select(*key_cols).distinct().repartition(1).write.mode(
                "overwrite"
            ).parquet(kdir)
        finally:
            spark.conf.set(ts_conf, prev_ts)
        dname = os.path.basename(data_dir)
        new_files = [
            {**f, "dir": dname} for f in _file_stats(data_dir, sort_by)
        ]
        n_new = sum(f["rows"] for f in new_files)
        new_dels = [
            {
                "dir": os.path.basename(kdir),
                "name": f["name"],
                "rows": f["rows"],
                "bytes": os.path.getsize(os.path.join(kdir, f["name"])),
                "key_cols": key_cols,
                # PARENT's sequence number: the delete applies to every
                # file committed at or before the parent, never to this
                # commit's own data files (dir sid > parent sid)
                "sid": parent["snapshot_id"],
                # names in ``key_cols`` are CURRENT at *this* commit,
                # not the parent's — a rename committed between the
                # parent snapshot and this upsert changes which schema
                # version the names belong to, so schema translation
                # must anchor on this commit's own sid (sequence
                # semantics above stay on the parent's)
                "schema_sid": sid,
            }
            for f in _file_stats(kdir, tuple(key_cols))
        ]
        segments = self._seal_files(table, sid, parent_files + new_files)
        snap = {
            "snapshot_id": sid,
            "parent_id": parent["snapshot_id"],
            "committed_at": time.time(),
            "path": data_dir,
            "row_count": parent["row_count"] + n_new,
            "sort_by": list(sort_by),
            "mode": "upsert",
            "segments": segments,
            "delete_files": (
                list(parent.get("delete_files") or []) + new_dels
            ),
            "delete_ranges": list(parent.get("delete_ranges") or []),
            "pos_delete_files": list(parent.get("pos_delete_files") or []),
            "blooms": dict(parent.get("blooms") or {}),
            "partition_specs": dict(parent.get("partition_specs") or {}),
            "meta": meta or {},
        }
        self._register_new_columns(man, df)
        man["snapshots"].append(snap)
        try:
            self._commit_manifest(table, man)
        except ConcurrentCommitError:
            shutil.rmtree(data_dir, ignore_errors=True)
            shutil.rmtree(kdir, ignore_errors=True)
            self._drop_new_segments(table, segments, sid)
            raise
        return snap

    def delete_range(
        self,
        table: str,
        col: str,
        ranges,
    ) -> dict:
        """Commit a METADATA range delete (≡ Iceberg's metadata delete /
        partition-level drop): rows with ``col`` in any inclusive
        ``(lo, hi)`` range disappear from subsequent reads — the
        region/time purge primitive ("drop everything in this bbox /
        before this date").  Commit cost is O(manifest): NO data is
        read or written; data files whose manifest stats lie entirely
        inside a deleted range are dropped from the snapshot outright,
        partially-covered files get a residual NOT-in-ranges filter at
        read.  Same sequence semantics as :meth:`delete_keys` (later
        appends into the range reappear); :meth:`compact` applies
        physically."""
        ranges = ranges if isinstance(ranges, list) else [ranges]
        if not ranges:
            raise ValueError("empty range list")
        # coerce bounds into the manifest value space up front: the
        # stored ranges must be JSON-serializable (datetime/bytes
        # bounds otherwise crash the commit) and compare consistently
        # with the stats AND the read-time residual (Spark casts ISO
        # strings back to timestamps)
        ranges = [(_stat_bound(lo), _stat_bound(hi)) for lo, hi in ranges]
        for lo, hi in ranges:
            try:
                inverted = lo > hi
            except TypeError:
                inverted = False
            if inverted:
                raise ValueError(
                    f"inverted range ({lo!r}, {hi!r}) — a silent no-op "
                    "purge; pass (lo, hi) with lo <= hi"
                )
        man = self._load_manifest(table)
        if not man["snapshots"]:
            raise FileNotFoundError(f"no snapshots for table {table}")
        parent = man["snapshots"][-1]
        parent_files = self._snap_files(parent)
        if not parent_files:
            raise ValueError(
                f"cannot delete from pre-stats snapshot "
                f"{parent['snapshot_id']} — compact() first"
            )
        sid = max(s["snapshot_id"] for s in man["snapshots"]) + 1
        schema_state = man.get("schema")
        _cur_id = (
            {f["name"]: f["id"] for f in schema_state["fields"]}
            if schema_state
            else {}
        )

        def _stat_name(f: dict) -> str | None:
            # pre-rename files keep stats under their write-time name.
            # None = the file's write-time schema has NO column with the
            # CURRENT field id (e.g. ``col`` was dropped and re-added:
            # old files hold only the RETIRED column's bytes/stats under
            # the same name) → treat as no-stats, never fall back to the
            # raw name — matching by the retired column's stats would
            # judge files "fully deleted" by values the current column
            # does not contain (irreversible data loss)
            if not schema_state or not schema_state["log"]:
                return col
            then = self._fields_for_sid(
                schema_state, self._dir_sid(f["dir"])
            )
            return {x["id"]: x["name"] for x in then}.get(_cur_id.get(col))

        def fully_deleted(f: dict) -> bool:
            # dropping a file here is IRREVERSIBLE after expire/compact,
            # so any bound/stat representation mismatch must KEEP the
            # file (the read-time residual filter, which compares in the
            # column's real type, still removes the in-range rows).
            # Mirrors scan()'s guards: a 'YYYY-MM-DD HH:MM:SS' string
            # bound sorts BEFORE every same-day 'T'-isoformat stat
            # (' ' < 'T') and would otherwise misclassify coverage.
            st = (f.get("stats") or {}).get(_stat_name(f))
            if not st or st["min"] is None or st["max"] is None:
                return False
            stat_is_str = isinstance(st["min"], str)
            stat_is_iso = stat_is_str and _ISO_TS.match(st["min"])
            for lo, hi in ranges:
                if (
                    isinstance(lo, str) != stat_is_str
                    or isinstance(hi, str) != stat_is_str
                ):
                    continue  # type mismatch → not provably covered
                if stat_is_iso:
                    lo, hi = _iso_t(lo), _iso_t(hi)
                try:
                    if lo <= st["min"] and st["max"] <= hi:
                        return True
                except TypeError:
                    continue  # incomparable → keep the file
            return False

        kept, dropped_rows = [], 0
        for f in parent_files:
            if fully_deleted(f):
                dropped_rows += int(f.get("rows") or 0)
            else:
                kept.append(f)
        if not kept and parent_files:
            # full-table purge: keep the smallest covered file as a
            # SCHEMA ANCHOR.  A files==[] snapshot is indistinguishable
            # from a legacy pre-stats one, so read()/scan()/compact()
            # would fall back to snap['path'] — the never-created
            # v{sid}-meta dir — and append would listdir it.  The
            # anchor's rows are still removed by the read-time residual
            # filter (its dir sid < this delete's sid), so reads return
            # a schema-correct EMPTY relation; row_count stays 0.
            anchor = min(parent_files, key=lambda f: int(f.get("rows") or 0))
            kept = [anchor]
        snap = {
            "snapshot_id": sid,
            "parent_id": parent["snapshot_id"],
            "committed_at": time.time(),
            # metadata-only commit: the v-dir is named but NEVER created
            # (rollback/expire rmtree it harmlessly; pointing at the
            # table dir instead would let rollback delete the table)
            "path": os.path.join(self._tdir(table), f"v{sid}-meta"),
            "row_count": parent["row_count"] - dropped_rows,
            "sort_by": list(parent.get("sort_by") or ()),
            "mode": "delete",
            "segments": self._seal_files(table, sid, kept),
            "delete_files": list(parent.get("delete_files") or []),
            "delete_ranges": (
                list(parent.get("delete_ranges") or [])
                + [{"col": col, "ranges": ranges, "sid": sid}]
            ),
            "pos_delete_files": list(parent.get("pos_delete_files") or []),
            "blooms": dict(parent.get("blooms") or {}),
            "partition_specs": dict(parent.get("partition_specs") or {}),
            "meta": {"dropped_files": len(parent_files) - len(kept)},
        }
        man["snapshots"].append(snap)
        try:
            self._commit_manifest(table, man)
        except ConcurrentCommitError:
            self._drop_new_segments(table, snap["segments"], sid)
            raise
        return snap

    def delete_where(
        self,
        spark: SparkSession,
        table: str,
        predicate,
        n_files: int = 1,
    ) -> dict:
        """``DELETE WHERE <predicate>`` compiled to POSITION-DELETE
        files (≡ Iceberg v2 position deletes) — the third delete tier:
        equality deletes need a key, metadata range deletes need
        manifest stats on the column; an arbitrary predicate
        ("text LIKE '%spam%'") needs neither.  One scan of the current
        snapshot's data files records the (file, row-ordinal) pairs of
        matching rows (``_metadata.row_index`` — stable physical
        positions); commit cost is O(matches) bytes, no data rewritten.
        Reads anti-join the positions (broadcast when small) with the
        same sequence semantics as the other delete kinds: later
        appends are untouched (a position can only name a file that
        existed at commit).  :meth:`compact` applies physically.

        Positions are computed over the RAW referenced files — rows
        already hidden by earlier deletes may be recorded again, which
        is harmless (they are already invisible) and keeps the commit a
        single scan."""
        from pyspark.sql import functions as F

        man = self._load_manifest(table)
        if not man["snapshots"]:
            raise FileNotFoundError(f"no snapshots for table {table}")
        parent = man["snapshots"][-1]
        parent_files = self._snap_files(parent)
        if not parent_files:
            pdir = os.path.basename(parent["path"])
            parent_files = [
                {**f, "dir": pdir}
                for f in _file_stats(
                    parent["path"], tuple(parent.get("sort_by") or ())
                )
            ]
            if not parent_files:
                raise ValueError(
                    f"cannot delete from snapshot "
                    f"{parent['snapshot_id']}: no data files found "
                    f"under {parent['path']}"
                )
        import uuid

        sid = max(s["snapshot_id"] for s in man["snapshots"]) + 1
        tdir = self._tdir(table)
        paths = [os.path.join(tdir, f["dir"], f["name"]) for f in parent_files]
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        # schema-resolved read: the predicate is written in CURRENT
        # column names and must match rows in files that predate a
        # rename; positions are captured at the scan by the reader
        positions = (
            self._read_resolved(
                spark,
                table,
                paths,
                state=man.get("schema"),
                with_pos_meta=True,
            )
            .filter(pred)
            .select(
                F.col("_dfile").alias("dfile"),
                F.col("_pos").alias("pos"),
            )
        )
        ddir = os.path.join(tdir, f"v{sid}-{uuid.uuid4().hex[:8]}")
        positions.repartition(n_files).write.mode("overwrite").parquet(ddir)
        new_pdels = [
            {
                "dir": os.path.basename(ddir),
                "name": f["name"],
                "rows": f["rows"],
                "bytes": os.path.getsize(os.path.join(ddir, f["name"])),
                "sid": sid,
            }
            for f in _file_stats(ddir, ())
        ]
        snap = {
            "snapshot_id": sid,
            "parent_id": parent["snapshot_id"],
            "committed_at": time.time(),
            "path": ddir,
            "row_count": parent["row_count"],
            "sort_by": list(parent.get("sort_by") or ()),
            "mode": "delete",
            "segments": self._seal_files(table, sid, parent_files),
            "delete_files": list(parent.get("delete_files") or []),
            "delete_ranges": list(parent.get("delete_ranges") or []),
            "pos_delete_files": (
                list(parent.get("pos_delete_files") or []) + new_pdels
            ),
            "blooms": dict(parent.get("blooms") or {}),
            "partition_specs": dict(parent.get("partition_specs") or {}),
            "meta": {},
        }
        man["snapshots"].append(snap)
        try:
            self._commit_manifest(table, man)
        except ConcurrentCommitError:
            shutil.rmtree(ddir, ignore_errors=True)
            self._drop_new_segments(table, snap["segments"], sid)
            raise
        return snap

    @staticmethod
    def _dir_sid(d: str) -> int:
        """Commit sequence of a data dir ('v12' / 'v12-ab34cd' → 12);
        legacy dirs without the v-prefix sort oldest (every delete
        applies — conservative and correct for pre-delete-era files)."""
        if d.startswith("v"):
            head = d[1:].split("-", 1)[0]
            if head.isdigit():
                return int(head)
        return 0

    def _read_with_deletes(
        self,
        spark: SparkSession,
        table: str,
        snap: dict,
        files: list[dict],
        merge: bool,
        state: dict | None = None,
        *,
        state_from_caller: bool = False,
    ) -> DataFrame:
        """Read ``files`` applying the snapshot's equality-delete files
        AND metadata range deletes with Iceberg sequence semantics: a
        delete at commit D removes matching rows only from data files
        committed at sid ≤ D.  Data files are segmented at the delete
        commit boundaries; each segment anti-joins the union of the
        key deletes that apply to it (broadcast when the key count is
        small) and filters NOT-in-ranges for the applicable range
        deletes."""
        from pyspark.sql import functions as F

        from eodal_spark import grid

        dels = snap.get("delete_files") or []
        rdels = snap.get("delete_ranges") or []
        pdels = snap.get("pos_delete_files") or []
        tdir = self._tdir(table)
        if not state_from_caller:
            # back-compat load; callers that already hold the manifest
            # pass state= for ONE consistent snapshot+schema view (a
            # rename committed between two loads would translate this
            # snapshot's delete entries against the wrong version)
            state = self._load_manifest(table).get("schema")
        paths = [os.path.join(tdir, f["dir"], f["name"]) for f in files]
        if (not dels and not rdels and not pdels) or not files:
            return self._read_resolved(
                spark, table, paths, merge=merge, state=state
            )
        # delete/data columns may have been RENAMED since a delete
        # committed: all joins/filters below run in CURRENT names (the
        # data side is projected by _read_resolved), so each delete
        # entry's recorded names are translated via its field ids
        key_cols = (
            self._translate_cols(
                state,
                dels[0]["key_cols"],
                dels[0].get("schema_sid", dels[0]["sid"]),
            )
            if dels
            else []
        )
        del_sids = sorted(
            {d["sid"] for d in dels}
            | {r["sid"] for r in rdels}
            | {p["sid"] for p in pdels}
        )

        def range_pred_from(min_sid: int):
            # NULL-valued rows are in NO range: keep them (a bare
            # ~BETWEEN evaluates to NULL and filter() would silently
            # drop them — inconsistent with the key-delete anti-join,
            # which preserves NULL keys)
            conds = [
                F.col(c).isNull()
                | ~grid.ranges_predicate(c, [tuple(x) for x in r["ranges"]])
                for r in rdels
                if r["sid"] >= min_sid
                for c in self._translate_cols(state, [r["col"]], r["sid"])
            ]
            out = None
            for c in conds:
                out = c if out is None else (out & c)
            return out

        # one tagged base relation over ALL delete files — each segment
        # filters its applicable suffix from it, so stacked deletes
        # don't re-scan older delete files once per segment (cached when
        # more than one segment will consume it)
        # group by (sequence sid, schema sid): an upsert's entry carries
        # its PARENT's sequence number but records key names current at
        # its OWN commit, so a delete_keys at sid N and an upsert whose
        # parent is N may share a sequence sid yet need different
        # name translations
        by_sid: dict[tuple[int, int], list[str]] = {}
        for d in dels:
            by_sid.setdefault(
                (d["sid"], d.get("schema_sid", d["sid"])), []
            ).append(os.path.join(tdir, d["dir"], d["name"]))
        base_keys: DataFrame | None = None
        for (sid, ssid), ps in by_sid.items():
            # each delete parquet stores its WRITE-TIME key names —
            # alias to current so all parts (and the data side) align
            then_cols = next(
                d["key_cols"]
                for d in dels
                if d["sid"] == sid and d.get("schema_sid", d["sid"]) == ssid
            )
            cur_cols = self._translate_cols(state, then_cols, ssid)
            if sorted(cur_cols) != sorted(key_cols):
                raise ValueError(
                    f"equality deletes at snapshot {sid} use key "
                    f"{cur_cols}, others use {key_cols} — mixed delete "
                    "keys are not supported; compact() first"
                )
            part = spark.read.parquet(*ps).select(
                *[
                    F.col(a).alias(b)
                    for a, b in zip(then_cols, cur_cols)
                ]
            ).withColumn("_del_sid", F.lit(sid))
            base_keys = part if base_keys is None else base_keys.unionByName(part)
        if base_keys is not None and len(by_sid) > 1:
            base_keys = base_keys.cache()

        max_key_sid = max((d["sid"] for d in dels), default=-1)

        def keys_from(min_sid: int) -> DataFrame | None:
            # no key delete applies to this segment (base empty, or the
            # boundary comes from a RANGE delete newer than every key
            # delete) — skip the provably-empty anti-join
            if base_keys is None or min_sid > max_key_sid:
                return None
            k = (
                base_keys.filter(F.col("_del_sid") >= min_sid)
                .select(*key_cols)
                .distinct()
            )
            # force-broadcast only when the key SET is provably small by
            # BYTES (parquet-compressed footprint × a decompression
            # fudge), not by row count alone — 1M wide string keys can
            # be a several-hundred-MB broadcast that would override
            # Spark's size-based threshold and OOM the driver.  Entries
            # without a recorded size (pre-upgrade) get a conservative
            # row cap; above the gates, Spark's own
            # autoBroadcastJoinThreshold decides.
            applicable = [d for d in dels if d["sid"] >= min_sid]
            if all("bytes" in d for d in applicable):
                small = sum(d["bytes"] for d in applicable) <= 32 << 20
            else:
                small = sum(d["rows"] for d in applicable) <= 100_000
            return F.broadcast(k) if small else k

        # position deletes (≡ Iceberg v2 position delete files): one
        # tagged base relation of (dfile, pos) rows, filtered per
        # segment like the key deletes.  Positions can only reference
        # files that existed at the delete's commit, so the per-segment
        # filter is an efficiency (skip provably-empty joins), not a
        # correctness requirement.
        pos_base: DataFrame | None = None
        for p in pdels:
            part = spark.read.parquet(
                os.path.join(tdir, p["dir"], p["name"])
            ).withColumn("_del_sid", F.lit(p["sid"]))
            pos_base = part if pos_base is None else pos_base.unionByName(part)
        if pos_base is not None and len(pdels) > 1:
            pos_base = pos_base.cache()
        max_pos_sid = max((p["sid"] for p in pdels), default=-1)

        def pos_keys_from(min_sid: int) -> DataFrame | None:
            if pos_base is None or min_sid > max_pos_sid:
                return None
            k = (
                pos_base.filter(F.col("_del_sid") >= min_sid)
                .select("dfile", "pos")
                .distinct()
            )
            applicable = [p for p in pdels if p["sid"] >= min_sid]
            # same conservative gate as keys_from: entries without a
            # recorded size (foreign/migrated manifests) must NOT
            # default to "tiny" — that would force-broadcast a position
            # set of unknown size
            if all("bytes" in p for p in applicable):
                small = sum(p["bytes"] for p in applicable) <= 32 << 20
            else:
                small = sum(p["rows"] for p in applicable) <= 100_000
            return F.broadcast(k) if small else k

        # segment boundaries: files with sid in (prev_del, del] share
        # the same applicable-delete suffix {del, ...}
        out: DataFrame | None = None
        bounds = [0] + del_sids
        for i in range(1, len(bounds) + 1):
            lo = bounds[i - 1]
            hi = bounds[i] if i < len(bounds) else None
            seg = [
                os.path.join(tdir, f["dir"], f["name"])
                for f in files
                if self._dir_sid(f["dir"]) > lo
                and (hi is None or self._dir_sid(f["dir"]) <= hi)
            ] + ([p for f, p in zip(files, paths)
                  if self._dir_sid(f["dir"]) == 0] if lo == 0 else [])
            if not seg:
                continue
            pk = pos_keys_from(hi) if hi is not None else None
            df = self._read_resolved(
                spark,
                table,
                sorted(set(seg)),
                merge=merge,
                state=state,
                with_pos_meta=pk is not None,
            )
            if hi is not None:
                if pk is not None:
                    # row identity = ("dir/name", row ordinal in file) —
                    # the reader materialized _dfile/_pos at the scan
                    # (stable physical positions the delete file
                    # recorded at commit time)
                    data_cols = [
                        c for c in df.columns if c not in ("_dfile", "_pos")
                    ]
                    df = (
                        df.withColumnRenamed("_dfile", "dfile")
                        .withColumnRenamed("_pos", "pos")
                        .join(pk, ["dfile", "pos"], "left_anti")
                        .select(*data_cols)
                    )
                keys = keys_from(hi)
                if keys is not None:
                    df = df.join(keys, key_cols, "left_anti")
                rp = range_pred_from(hi)
                if rp is not None:
                    df = df.filter(rp)
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
        assert out is not None
        return out

    def snapshot_as_of(self, table: str, ts) -> dict:
        """Newest snapshot committed at or before ``ts`` (epoch seconds
        or datetime) — ≡ Iceberg ``TIMESTAMP AS OF`` resolution.
        Snapshots predating the ``committed_at`` field sort oldest."""
        if hasattr(ts, "timestamp"):
            ts = ts.timestamp()
        eligible = [
            s
            for s in self.snapshots(table)
            if s.get("committed_at", 0.0) <= ts
        ]
        if not eligible:
            raise KeyError(
                f"no snapshot of {table!r} committed at or before {ts}"
            )
        return eligible[-1]

    def read(
        self,
        spark: SparkSession,
        table: str,
        snapshot_id: int | None = None,
        as_of=None,
        tag: str | None = None,
        branch: str | None = None,
    ) -> DataFrame:
        """Time-travel read — ≡ Iceberg ``VERSION AS OF`` by snapshot
        id, ``TIMESTAMP AS OF`` via ``as_of``, a named ref via ``tag``,
        or a branch head via ``branch`` — the WAP audit read (equality
        deletes applied merge-on-read, see :meth:`delete_keys`)."""
        if sum(x is not None for x in (snapshot_id, as_of, tag, branch)) > 1:
            raise ValueError(
                "pass only one of snapshot_id / as_of / tag / branch"
            )
        # ONE manifest load for ref/snapshot/schema resolution — a
        # second load anywhere below would be a TOCTOU against
        # concurrent expiry/rollback/rename
        man = self._load_manifest(table)
        snaps = man["snapshots"]
        if tag is not None:
            refs = dict(man.get("refs") or {})
            if tag not in refs:
                raise KeyError(f"no tag {tag!r} on table {table!r}")
            snapshot_id = refs[tag]
        if branch is not None:
            b = (man.get("branches") or {}).get(branch)
            if b is None:
                raise KeyError(f"no branch {branch!r} on table {table!r}")
            snapshot_id = b["head"]
        if as_of is not None:
            ts = as_of.timestamp() if hasattr(as_of, "timestamp") else as_of
            eligible = [
                s for s in snaps if s.get("committed_at", 0.0) <= ts
            ]
            if not eligible:
                raise KeyError(
                    f"no snapshot of {table!r} committed at or before {ts}"
                )
            snap = eligible[-1]
        else:
            # explicit-id lookups also resolve branch snapshots (the
            # audit-by-id path); the default head stays main's
            lookup = (
                snaps
                if snapshot_id is None
                else snaps + (man.get("branch_snapshots") or [])
            )
            snap = self._get_snap(table, snapshot_id, lookup)
        files = self._snap_files(snap)
        if files:
            merge = len({f["dir"] for f in files}) > 1
            return self._read_with_deletes(
                spark,
                table,
                snap,
                files,
                merge,
                state=man.get("schema"),
                state_from_caller=True,
            )
        return spark.read.parquet(snap["path"])  # pre-stats snapshot

    def read_changes(
        self,
        spark: SparkSession,
        table: str,
        from_snapshot: int,
        to_snapshot: int | None = None,
    ) -> DataFrame:
        """Incremental consumption — the rows ADDED after
        ``from_snapshot`` up to ``to_snapshot`` (default: current), read
        from exactly the data files the later snapshot references that
        the earlier one does not (≡ Iceberg incremental scan).  Only
        append commits have well-defined change semantics; an overwrite
        in the range raises, as the delta is not expressible as a file
        difference."""
        man = self._load_manifest(table)  # ONE load → one consistent view
        snaps = man["snapshots"]
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table}")
        lo = self._get_snap(table, from_snapshot, snaps)
        hi = self._get_snap(table, to_snapshot, snaps)
        if lo["snapshot_id"] > hi["snapshot_id"]:
            # an inverted range would also sail past the overwrite check
            # below and return the old snapshot's whole content as a
            # "delta"
            raise ValueError(
                f"from_snapshot {lo['snapshot_id']} is newer than "
                f"to_snapshot {hi['snapshot_id']}"
            )
        for s in snaps:
            if (
                lo["snapshot_id"] < s["snapshot_id"] <= hi["snapshot_id"]
                and s.get("mode", "overwrite") != "append"
            ):
                raise ValueError(
                    f"snapshot {s['snapshot_id']} is a "
                    f"{s.get('mode', 'overwrite')} commit — the range "
                    "holds no file-level delta; read it directly"
                )
        seen = {(f["dir"], f["name"]) for f in self._snap_files(lo)}
        new = [
            os.path.join(self._tdir(table), f["dir"], f["name"])
            for f in self._snap_files(hi)
            if (f["dir"], f["name"]) not in seen
        ]
        if not new:
            from pyspark.sql import functions as F

            paths = self._file_paths(table, hi)
            if not paths:  # legacy pre-stats snapshot: dir-level read
                return spark.read.parquet(hi["path"]).where(F.lit(False))
            return self._read_resolved(
                spark, table, paths, state=man.get("schema")
            ).where(F.lit(False))
        return self._read_resolved(
            spark, table, new, state=man.get("schema")
        )

    def count(
        self,
        spark: SparkSession,
        table: str,
        snapshot_id: int | None = None,
        ranges: dict | None = None,
        eq: dict | None = None,
    ) -> int:
        """COUNT(*) with a manifest fast path (≡ Iceberg metadata
        aggregate pushdown): a snapshot with no merge-on-read deletes
        answers from its recorded ``row_count`` — ZERO data I/O, O(1)
        on a 100 TB table.  Any delete tier in play (equality /
        position deletes, or range deletes whose residuals the
        row_count cannot see) or any predicate falls back to the exact
        pruned-scan count."""
        snap = self._get_snap(table, snapshot_id)
        mor = (
            (snap.get("delete_files") or [])
            or (snap.get("pos_delete_files") or [])
            or (snap.get("delete_ranges") or [])
        )
        if not ranges and not eq:
            if not mor:
                return int(snap["row_count"])
            return self.read(spark, table, snap["snapshot_id"]).count()
        return self.scan(
            spark,
            table,
            ranges,
            snapshot_id=snap["snapshot_id"],
            eq=eq,
        ).count()

    def file_metrics(
        self, spark: SparkSession, table: str, snapshot_id: int | None = None
    ) -> DataFrame:
        """Per-file lineage of a snapshot as a queryable relation:
        (dir, name, rows, per-column min/max as a JSON string) — the
        north rule's partition-level row-count/lineage surface, read
        straight from the manifest (no data I/O)."""
        snap = self._get_snap(table, snapshot_id)
        rows = [
            (
                f["dir"],
                f["name"],
                # NULL (not a sentinel) for pre-upgrade entries without
                # a recorded count — sums stay honest, gaps stay visible
                int(f["rows"]) if "rows" in f else None,
                json.dumps(f.get("stats", {}), sort_keys=True),
            )
            for f in self._snap_files(snap)
        ]
        return spark.createDataFrame(
            rows, "dir string, name string, rows long, stats string"
        )

    def compact(
        self,
        spark: SparkSession,
        table: str,
        n_files: int | None = None,
        target_file_bytes: int | None = None,
        min_input_files: int = 2,
    ) -> dict | None:
        """Compaction (≡ Iceberg ``rewrite_data_files``), two modes:

        ``n_files`` — FULL rewrite of the current snapshot into
        ``n_files`` files as a new overwrite snapshot: long append
        chains accumulate many small files whose per-file open cost
        eventually dominates scans; compaction restores the target
        layout (including the sort order recorded at write time)
        without changing a single row.

        ``target_file_bytes`` — SELECTIVE binpack (Iceberg's binpack
        strategy): only groups of ≥ ``min_input_files`` undersized
        files (below the target, grouped per partition value where
        partitioned) are rewritten; every other file is re-referenced
        untouched — byte-identical on disk, O(small files) rewrite
        cost instead of O(table).  Merge-on-read deletes are RE-BASED
        for the rewritten rows only: the rewrite reads its inputs with
        the snapshot's full delete semantics applied, so the new files
        physically exclude deleted rows, while untouched files keep
        their delete files in force (their sequence numbers are
        unchanged).  Returns None when no group qualifies (nothing to
        do — no empty commit).  See :meth:`_compact_binpack`.

        Old snapshots stay readable until :meth:`expire_snapshots`
        reclaims them."""
        if (n_files is None) == (target_file_bytes is None):
            raise ValueError(
                "pass exactly one of n_files (full rewrite) or "
                "target_file_bytes (selective binpack)"
            )
        if target_file_bytes is not None:
            return self._compact_binpack(
                spark, table, int(target_file_bytes), int(min_input_files)
            )
        snap = self._get_snap(table, None)
        # carry any ingest marker forward: the compacted snapshot
        # represents the same committed state, and drain_to_catalog's
        # replay/foreign-checkpoint guard reads these from the NEWEST
        # snapshots — compaction followed by expiry must not erase the
        # last batch's exactly-once evidence
        meta = {"compacted_from": snap["snapshot_id"]}
        # walk back past marker-less delete/compaction commits (e.g. a
        # GDPR purge on top of the last ingest batch) to the newest
        # ingest marker — but STOP at a plain overwrite: it reset the
        # table's lineage, so an older marker no longer describes this
        # data and resurrecting it would corrupt the exactly-once guard
        for s in reversed(self.snapshots(table)):
            if "checkpoint" in s.get("meta", {}):
                for k in ("checkpoint", "batch_id"):
                    if k in s["meta"]:
                        meta[k] = s["meta"][k]
                break
            lineage_reset = (
                s.get("mode", "overwrite") == "overwrite"
                and "compacted_from" not in s.get("meta", {})
            )
            if lineage_reset:
                break
        # inherit the bloom config (newest dir's) so compaction does not
        # silently lose point-lookup pruning; the rewrite re-blooms the
        # compacted files in the same commit
        bcfg = None
        for bcfg in (snap.get("blooms") or {}).values():
            pass  # insertion order: the last entry is the newest dir's
        return self.write(
            self.read(spark, table),
            table,
            sort_by=tuple(snap.get("sort_by") or ()),
            zorder=tuple(snap.get("zorder") or ()),
            n_files=n_files,
            meta=meta,
            bloom_cols=tuple(bcfg["cols"]) if bcfg else (),
            bloom_bits=bcfg["bits"] if bcfg else 1 << 17,
            bloom_k=bcfg["k"] if bcfg else 7,
        )

    def _compact_binpack(
        self,
        spark: SparkSession,
        table: str,
        target: int,
        min_input: int,
    ) -> dict | None:
        """Selective small-file compaction (Iceberg binpack): rewrite
        ONLY groups of ≥ ``min_input`` files below ``target`` bytes —
        grouped per partition value on partitioned tables — into
        ~ceil(group_bytes/target) files preserving the snapshot's
        sort/z-order clustering.  Untouched files are re-referenced
        byte-identical (their manifest segments reused verbatim), so a
        100 TB table pays O(small files), never O(table).

        Delete re-base: inputs are read through the snapshot's FULL
        merge-on-read delete semantics, so the rewritten files
        physically exclude deleted rows; untouched files keep their
        delete files in force (sequence numbers unchanged), and the
        new dir's sid exceeds every carried delete's, so no delete
        re-applies to the rewrite.

        Spec-evolution rail: on partitioned tables only files under
        the CURRENT spec are candidates (rewriting an old-spec dir is
        a relayout, not a binpack — use the full rewrite).  Returns
        None when no group qualifies: nothing to do, no empty commit."""
        import uuid

        from pyspark.sql import functions as F

        man = self._load_manifest(table)
        if not man["snapshots"]:
            raise FileNotFoundError(f"no snapshots for table {table}")
        snap = man["snapshots"][-1]
        parent_files = self._snap_files(snap)
        if not parent_files:
            raise ValueError(
                f"cannot binpack pre-stats snapshot "
                f"{snap['snapshot_id']} — run a full compact() first"
            )
        tdir = self._tdir(table)
        pspecs = snap.get("partition_specs") or {}
        cur_spec = None
        for cur_spec in pspecs.values():
            pass  # insertion order: last = the current spec
        groups: dict = {}
        for f in parent_files:
            try:
                sz = os.path.getsize(os.path.join(tdir, f["dir"], f["name"]))
            except OSError:
                continue  # vanished → leave untouched, never rewrite blind
            if sz >= target:
                continue
            spec = pspecs.get(f["dir"])
            if cur_spec is not None:
                if spec != cur_spec or not f.get("partition"):
                    continue  # old-spec / unpartitioned stragglers: skip
                key = tuple(sorted(f["partition"].items()))
            else:
                if f.get("partition"):
                    continue
                key = None
            groups.setdefault(key, []).append((f, sz))
        inputs: list[dict] = []
        n_out = 0
        n_groups = 0
        for lst in groups.values():
            if len(lst) < min_input:
                continue
            n_groups += 1
            inputs.extend(f for f, _ in lst)
            n_out += max(1, -(-sum(sz for _, sz in lst) // target))
        if not inputs:
            return None
        schema_state = man.get("schema")
        in_multi = len({f["dir"] for f in inputs}) > 1
        rows = self._read_with_deletes(
            spark,
            table,
            snap,
            inputs,
            merge=in_multi,
            state=schema_state,
            state_from_caller=True,
        )
        sort_by = tuple(snap.get("sort_by") or ())
        zorder = tuple(snap.get("zorder") or ())
        keys: list[str] = []
        if zorder:
            from eodal_spark import grid

            za, zb = zorder
            b = rows.agg(F.min(za), F.max(za), F.min(zb), F.max(zb)).first()
            zk = grid.zorder_key_2d(
                F.col(za), F.col(zb),
                b[0] if b[0] is not None else 0.0,
                b[1] if b[1] is not None else 1.0,
                b[2] if b[2] is not None else 0.0,
                b[3] if b[3] is not None else 1.0,
                bits=16,
            )
            rows = rows.withColumn("_zorder_key", zk)
            keys = ["_zorder_key"]
        elif sort_by:
            keys = list(sort_by)
        pv = (
            _partition_cols([tuple(e) for e in cur_spec])
            if cur_spec is not None
            else []
        )
        out = rows
        for name, colx in pv:
            out = out.withColumn(name, colx)
        order_cols = [n for n, _ in pv] + keys
        if order_cols:
            # partition cols lead the range key → each partition's rows
            # land in contiguous tasks (per-group packing), sort order
            # preserved within files
            out = out.repartitionByRange(n_out, *order_cols)
            out = out.sortWithinPartitions(*order_cols)
        else:
            out = out.repartition(n_out)
        if zorder:
            out = out.drop("_zorder_key")
        sid = max(
            s["snapshot_id"]
            for s in man["snapshots"] + (man.get("branch_snapshots") or [])
        ) + 1
        data_dir = os.path.join(tdir, f"v{sid}-{uuid.uuid4().hex[:8]}")
        ts_conf = "spark.sql.parquet.outputTimestampType"
        prev_ts = spark.conf.get(ts_conf)
        try:
            spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
            if pv:
                out.write.mode("overwrite").partitionBy(
                    *[n for n, _ in pv]
                ).parquet(data_dir)
            else:
                out.write.mode("overwrite").parquet(data_dir)
        finally:
            spark.conf.set(ts_conf, prev_ts)
        dname = os.path.basename(data_dir)
        stat_cols = sort_by if sort_by else zorder
        new_files = [
            {**f, "dir": dname} for f in _file_stats(data_dir, stat_cols)
        ]
        if pv:
            for f in new_files:
                f["partition"] = _parse_partition(f["name"])
        blooms = dict(snap.get("blooms") or {})
        bcfg = None
        for bcfg in blooms.values():
            pass
        if bcfg is not None and {f["dir"] for f in inputs} & set(blooms):
            _write_bloom_sidecar(
                spark, data_dir, tuple(bcfg["cols"]), bcfg["bits"], bcfg["k"]
            )
            blooms[dname] = dict(bcfg)
        n_new = sum(f["rows"] for f in new_files)
        in_rows = sum(int(f.get("rows") or 0) for f in inputs)
        inset = {(f["dir"], f["name"]) for f in inputs}
        untouched = [
            f for f in parent_files if (f["dir"], f["name"]) not in inset
        ]
        new_pspecs = dict(pspecs)
        if pv:
            new_pspecs[dname] = [list(e) for e in cur_spec]
        segments = self._seal_files(table, sid, untouched + new_files)
        new_snap = {
            "snapshot_id": sid,
            "parent_id": snap["snapshot_id"],
            "committed_at": time.time(),
            "path": data_dir,
            "row_count": snap["row_count"] - in_rows + n_new,
            "sort_by": list(sort_by),
            "zorder": list(zorder),
            "mode": "compact",
            "segments": segments,
            "delete_files": list(snap.get("delete_files") or []),
            "delete_ranges": list(snap.get("delete_ranges") or []),
            "pos_delete_files": list(snap.get("pos_delete_files") or []),
            "blooms": blooms,
            "partition_specs": new_pspecs,
            "meta": {
                "binpack_inputs": len(inputs),
                "binpack_groups": n_groups,
                "compacted_from": snap["snapshot_id"],
            },
        }
        man["snapshots"].append(new_snap)
        try:
            self._commit_manifest(table, man)
        except ConcurrentCommitError:
            shutil.rmtree(data_dir, ignore_errors=True)
            shutil.rmtree(_bloom_sidecar(data_dir), ignore_errors=True)
            self._drop_new_segments(table, segments, sid)
            raise
        return new_snap

    # -- named refs (≡ Iceberg tags) ------------------------------------

    def tag(
        self, table: str, name: str, snapshot_id: int | None = None
    ) -> dict:
        """Pin a NAMED REF to a snapshot (≡ Iceberg tags): a stable,
        human-meaningful handle — ``cat.read(spark, t, tag="v1-train")``
        — that :meth:`expire_snapshots` RETAINS regardless of the
        keep-last horizon and :meth:`rollback` refuses to orphan.  The
        reproducibility primitive for training runs: tag the snapshot a
        model was trained on and the exact bytes stay addressable while
        routine expiry reclaims everything else.  Commit is the same
        manifest CAS as every other metadata change."""
        man = self._load_manifest(table)
        refs = man.setdefault("refs", {})
        if name in refs:
            raise ValueError(
                f"tag {name!r} already points at snapshot {refs[name]} — "
                "remove_tag() first (retags must be explicit)"
            )
        snap = self._get_snap(table, snapshot_id, man["snapshots"])
        refs[name] = snap["snapshot_id"]
        self._commit_manifest(table, man)
        return {"name": name, "snapshot_id": snap["snapshot_id"]}

    def remove_tag(self, table: str, name: str) -> None:
        man = self._load_manifest(table)
        refs = man.get("refs") or {}
        if name not in refs:
            raise KeyError(f"no tag {name!r} on table {table!r}")
        del refs[name]
        self._commit_manifest(table, man)

    def tags(self, table: str) -> dict[str, int]:
        return dict(self._load_manifest(table).get("refs") or {})

    # -- branches (≡ Iceberg branch refs / write-audit-publish) --------
    #
    # The WAP workflow for a training-data pipeline: stage a day's
    # ingest on an ``audit`` branch (``write(..., branch="audit")``),
    # run validation queries against ``read(branch="audit")`` — main
    # readers never see a row — then ``publish_branch`` fast-forwards
    # main to the audited head, or ``drop_branch`` discards the lot
    # (data dirs reclaimed by :meth:`remove_orphan_files`).  Every
    # mutation is one manifest CAS, so branch commits inherit the
    # optimistic-concurrency protocol.

    def create_branch(
        self, table: str, name: str, snapshot_id: int | None = None
    ) -> dict:
        """Fork a named branch from a MAIN snapshot (default: current
        head).  Returns ``{"head": sid, "fork": sid}``."""
        man = self._load_manifest(table)
        branches = man.setdefault("branches", {})
        if name in branches:
            raise ValueError(
                f"branch {name!r} already exists (head "
                f"{branches[name]['head']}) — drop_branch() first"
            )
        snap = self._get_snap(table, snapshot_id, man["snapshots"])
        branches[name] = {
            "head": snap["snapshot_id"],
            "fork": snap["snapshot_id"],
        }
        self._commit_manifest(table, man)
        return dict(branches[name])

    def branches(self, table: str) -> dict[str, dict]:
        return {
            n: dict(b)
            for n, b in (
                self._load_manifest(table).get("branches") or {}
            ).items()
        }

    def _branch_chain(self, man: dict, name: str) -> list[dict]:
        """The branch's own snapshots, fork-exclusive, in commit order."""
        b = (man.get("branches") or {}).get(name)
        if b is None:
            raise KeyError(f"no branch {name!r}")
        by_id = {
            s["snapshot_id"]: s
            for s in man.get("branch_snapshots") or []
        }
        chain, cur = [], b["head"]
        while cur is not None and cur != b["fork"]:
            s = by_id.get(cur)
            if s is None:
                raise ValueError(
                    f"branch {name!r} chain broken at snapshot {cur}"
                )
            chain.append(s)
            cur = s.get("parent_id")
        chain.reverse()
        return chain

    def publish_branch(self, table: str, name: str) -> list[int]:
        """Fast-forward main to the branch head (≡ Iceberg
        ``fast_forward`` / the WAP publish step) and delete the branch
        ref.  Requires main's head to still be the branch's fork point;
        if main advanced, raises — re-stage on a fresh branch or apply
        individual appends with :meth:`cherrypick_snapshot`.  Returns
        the published snapshot ids."""
        man = self._load_manifest(table)
        b = (man.get("branches") or {}).get(name)
        if b is None:
            raise KeyError(f"no branch {name!r} on table {table!r}")
        main = man["snapshots"]
        if not main or main[-1]["snapshot_id"] != b["fork"]:
            head = main[-1]["snapshot_id"] if main else None
            raise ValueError(
                f"non-fast-forward: main head is {head} but branch "
                f"{name!r} forked at {b['fork']} — re-branch from the "
                "current head or cherrypick_snapshot() each append"
            )
        chain = self._branch_chain(man, name)
        ids = {s["snapshot_id"] for s in chain}
        man["snapshots"] = main + chain
        man["branch_snapshots"] = [
            s
            for s in man.get("branch_snapshots") or []
            if s["snapshot_id"] not in ids
        ]
        del man["branches"][name]
        self._commit_manifest(table, man)
        return sorted(ids)

    def drop_branch(self, table: str, name: str) -> list[int]:
        """Discard a branch and its snapshots (the WAP reject step).
        Data dirs are NOT deleted here — a concurrent cherry-pick may
        reference them; :meth:`remove_orphan_files` reclaims anything
        truly unreferenced after its age rail.  Returns dropped ids."""
        man = self._load_manifest(table)
        chain = self._branch_chain(man, name)  # KeyError if absent
        ids = {s["snapshot_id"] for s in chain}
        man["branch_snapshots"] = [
            s
            for s in man.get("branch_snapshots") or []
            if s["snapshot_id"] not in ids
        ]
        del man["branches"][name]
        self._commit_manifest(table, man)
        return sorted(ids)

    def cherrypick_snapshot(self, table: str, snapshot_id: int) -> dict:
        """Apply ONE append snapshot's own files onto the CURRENT main
        head (≡ Iceberg ``cherrypick_snapshot`` — the publish primitive
        when main moved past the branch's fork).  The new snapshot
        carries main head's delete state; the picked files keep their
        write-time sequence number, so equality deletes committed after
        the original write still remove their rows (Iceberg v2
        sequence semantics)."""
        man = self._load_manifest(table)
        all_snaps = man["snapshots"] + (man.get("branch_snapshots") or [])
        src = next(
            (s for s in all_snaps if s["snapshot_id"] == snapshot_id), None
        )
        if src is None:
            raise KeyError(
                f"no snapshot {snapshot_id} for table {table!r}"
            )
        if src.get("mode") != "append":
            raise ValueError(
                f"snapshot {snapshot_id} is mode={src.get('mode')!r} — "
                "only append snapshots compose onto a moved head "
                "(overwrite/delete commits don't cherry-pick)"
            )
        if not man["snapshots"]:
            raise FileNotFoundError(f"no snapshots for table {table}")
        head = man["snapshots"][-1]
        own_dir = os.path.basename(src["path"])
        head_files = self._snap_files(head)
        if any(f["dir"] == own_dir for f in head_files):
            raise ValueError(
                f"snapshot {snapshot_id}'s files are already referenced "
                "by main — cherry-pick would double-count its rows"
            )
        own = [f for f in self._snap_files(src) if f["dir"] == own_dir]
        sid = max(s["snapshot_id"] for s in all_snaps) + 1
        blooms = dict(head.get("blooms") or {})
        if own_dir in (src.get("blooms") or {}):
            blooms[own_dir] = src["blooms"][own_dir]
        pspecs = dict(head.get("partition_specs") or {})
        if own_dir in (src.get("partition_specs") or {}):
            pspecs[own_dir] = src["partition_specs"][own_dir]
        snap = {
            "snapshot_id": sid,
            "parent_id": head["snapshot_id"],
            "committed_at": time.time(),
            # metadata-only commit: the picked files live in the source
            # snapshot's dir; this v-dir is named but never created
            "path": os.path.join(self._tdir(table), f"v{sid}-meta"),
            "row_count": head["row_count"]
            + sum(int(f.get("rows") or 0) for f in own),
            "sort_by": list(head.get("sort_by") or ()),
            "mode": "append",
            "segments": self._seal_files(table, sid, head_files + own),
            "delete_files": list(head.get("delete_files") or []),
            "delete_ranges": list(head.get("delete_ranges") or []),
            "pos_delete_files": list(head.get("pos_delete_files") or []),
            "blooms": blooms,
            "partition_specs": pspecs,
            "meta": {"cherrypicked_from": snapshot_id},
        }
        man["snapshots"].append(snap)
        try:
            self._commit_manifest(table, man)
        except ConcurrentCommitError:
            self._drop_new_segments(table, snap["segments"], sid)
            raise
        return snap

    def remove_orphan_files(
        self,
        table: str,
        dry_run: bool = False,
        older_than_seconds: float = 86_400.0,
    ) -> list[str]:
        """Delete data dirs under the table location that NO snapshot
        (or delete file) references — ≡ Iceberg's
        ``remove_orphan_files``.  Orphans arise from crashes between a
        data write and its manifest commit, and from rolling back past
        an upsert (whose delete-file dir is not the snapshot's own
        path).

        ``older_than_seconds`` (default 1 day) is the SAFETY RAIL, not
        an optimization: a writer's data files land BEFORE its manifest
        CAS, so a dir that is unreferenced *right now* may belong to an
        in-flight commit — deleting it would let that commit succeed
        over vanished files (the same race Iceberg's 3-day default
        guards).  Only dirs whose mtime predates the cutoff are
        candidates; pass 0 ONLY when no writer can be running.  The
        commit lock is held across listing+deletion so no commit lands
        mid-sweep; only ``v*`` dirs are candidates — the manifest and
        lock files are never touched."""
        import fcntl

        lockpath = self._manifest_path(table) + ".lock"
        fd = os.open(lockpath, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            man = self._load_manifest(table)
            all_snaps = man["snapshots"] + (man.get("branch_snapshots") or [])
            live: set[str] = set()
            for s in all_snaps:
                live.add(os.path.basename(s["path"]))
                live |= self._snap_dirs(s)
                live |= {d["dir"] for d in (s.get("delete_files") or [])}
                live |= {d["dir"] for d in (s.get("pos_delete_files") or [])}
            # a live dir's bloom sidecar is live (named <dir>-bloom)
            live |= {d + BLOOM_SUFFIX for d in live}
            tdir = self._tdir(table)
            cutoff = time.time() - older_than_seconds

            def old_enough(d: str) -> bool:
                try:
                    return os.path.getmtime(os.path.join(tdir, d)) <= cutoff
                except OSError:
                    return False  # vanished mid-listing: not ours to sweep

            orphans = sorted(
                d
                for d in os.listdir(tdir)
                if d.startswith("v")
                and os.path.isdir(os.path.join(tdir, d))
                and d not in live
                and old_enough(d)
            )
            if not dry_run:
                for d in orphans:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
            # manifest-tier orphans: segments written by a commit whose
            # CAS never landed (crash between seal and commit) — same
            # age rail as data dirs, for the same in-flight-writer race
            live_segs = self._live_segments(all_snaps)
            segdir = self._seg_dir(tdir)
            if os.path.isdir(segdir):
                for name in sorted(os.listdir(segdir)):
                    p = os.path.join(segdir, name)
                    try:
                        stale = os.path.getmtime(p) <= cutoff
                    except OSError:
                        continue
                    if (
                        name.startswith("seg-")
                        and name not in live_segs
                        and stale
                    ):
                        orphans.append(os.path.join("manifests", name))
                        if not dry_run:
                            _SEG_CACHE.pop(p, None)
                            try:
                                os.unlink(p)
                            except OSError:
                                pass
            return orphans
        finally:
            os.close(fd)

    def expire_snapshots(self, table: str, keep_last: int) -> list[int]:
        """Drop all but the last ``keep_last`` snapshots and delete the
        data dirs no surviving snapshot references (append snapshots
        share files with their parents — sharing is refcounted at the
        dir level).  TAGGED and BRANCH-REFERENCED snapshots are always
        retained (≡ Iceberg ref-aware expiry): a branch's head/fork may
        be a MAIN snapshot (a branch with no commits yet), and expiring
        it would rmtree data dirs the branch ref still points at —
        a later write(branch=) would then hit a corrupted-ref error.
        Returns the expired snapshot ids."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        man = self._load_manifest(table)
        snaps = man["snapshots"]
        if len(snaps) <= keep_last:
            return []
        tagged = set((man.get("refs") or {}).values())
        for b in (man.get("branches") or {}).values():
            tagged |= {b["head"], b["fork"]}
        horizon = {s["snapshot_id"] for s in snaps[-keep_last:]}
        kept = [
            s
            for s in snaps
            if s["snapshot_id"] in horizon or s["snapshot_id"] in tagged
        ]
        dropped = [
            s
            for s in snaps
            if s["snapshot_id"] not in horizon
            and s["snapshot_id"] not in tagged
        ]
        if not dropped:
            return []
        # branch snapshots share data dirs with their (possibly
        # expired) main ancestors — their references keep dirs alive
        alive = kept + (man.get("branch_snapshots") or [])
        live_dirs = set().union(*(self._snap_dirs(s) for s in alive))
        live_dirs |= {
            d["dir"] for s in alive for d in (s.get("delete_files") or [])
        }
        live_dirs |= {
            d["dir"] for s in alive for d in (s.get("pos_delete_files") or [])
        }
        live_dirs |= {os.path.basename(s["path"]) for s in alive}
        man["snapshots"] = kept
        self._commit_manifest(table, man)
        dead_dirs = {
            d
            for s in dropped
            for d in (
                self._snap_dirs(s)
                | {df["dir"] for df in (s.get("delete_files") or [])}
                | {df["dir"] for df in (s.get("pos_delete_files") or [])}
                | {os.path.basename(s["path"])}
            )
        } - live_dirs
        for d in dead_dirs:
            shutil.rmtree(
                os.path.join(self._tdir(table), d), ignore_errors=True
            )
            shutil.rmtree(
                os.path.join(self._tdir(table), d + BLOOM_SUFFIX),
                ignore_errors=True,
            )
        # manifest-tier GC: segments only expired snapshots referenced
        dead_segs = self._live_segments(dropped) - self._live_segments(alive)
        segdir = self._seg_dir(self._tdir(table))
        for name in dead_segs:
            _SEG_CACHE.pop(os.path.join(segdir, name), None)
            try:
                os.unlink(os.path.join(segdir, name))
            except OSError:
                pass
        return [s["snapshot_id"] for s in dropped]

    def _partition_prune(
        self,
        spark: SparkSession,
        snap: dict,
        files: list[dict],
        norm: dict,
        eq: dict,
        stat_name_fn,
    ) -> list[dict]:
        """Drop files whose hive partition value provably excludes the
        predicate — hidden-partition pruning (≡ Iceberg's transform-
        aware file filtering): the user predicates on ts/host; each
        file's dir spec says which transform of which write-time column
        produced its partition value, and the predicate is translated
        into that transform's value space.  Time transforms prune
        ranges (+the folded eq points), truncate prunes string ranges,
        bucket and identity prune equality probes.  Purely an
        optimization: unknown specs, type mismatches, or missing values
        keep the file (the residual filter still applies).  A
        ``__HIVE_DEFAULT_PARTITION__`` file holds only NULL rows for
        the source column, which no concrete predicate can match."""
        pspecs = snap.get("partition_specs") or {}
        if not pspecs or (not norm and not eq):
            return files
        from pyspark.sql import functions as F

        bcache: dict = {}

        def bucket_of(v, n: int) -> int:
            key = (str(v), n)
            if key not in bcache:
                bcache[key] = int(
                    spark.range(1)
                    .select(
                        F.pmod(F.xxhash64(F.lit(str(v))), F.lit(n))
                    )
                    .first()[0]
                )
            return bcache[key]

        pred_cols = set(norm) | set(eq)
        out = []
        for frec in files:
            spec = pspecs.get(frec["dir"])
            pvals = frec.get("partition") or {}
            if not spec or not pvals:
                out.append(frec)
                continue
            keep = True
            for i, entry in enumerate(spec):
                t, wcol = entry[0], entry[-1]
                pvs = pvals.get(f"_pv{i}")
                if pvs is None:
                    continue
                cols = [
                    c for c in pred_cols if stat_name_fn(frec, c) == wcol
                ]
                if not cols:
                    continue
                col = cols[0]
                if t in _TIME_FMT:
                    w = _TIME_FMT[t][1]
                    rs = [
                        (_iso_t(lo)[:w], _iso_t(hi)[:w])
                        for lo, hi in (norm.get(col) or [])
                        if isinstance(lo, str) and isinstance(hi, str)
                    ]
                    if rs and (
                        pvs == _HIVE_NULL
                        or not any(lo <= pvs <= hi for lo, hi in rs)
                    ):
                        keep = False
                elif t == "truncate":
                    w = entry[1]
                    rs = [
                        (lo[:w], hi[:w])
                        for lo, hi in (norm.get(col) or [])
                        if isinstance(lo, str) and isinstance(hi, str)
                    ]
                    if rs and (
                        pvs == _HIVE_NULL
                        or not any(lo <= pvs <= hi for lo, hi in rs)
                    ):
                        keep = False
                elif t == "bucket":
                    v = eq.get(col)
                    if v is not None and (
                        pvs == _HIVE_NULL
                        or int(pvs) != bucket_of(v, int(entry[1]))
                    ):
                        keep = False
                elif t == "identity":
                    v = eq.get(col)
                    if v is not None and (
                        pvs == _HIVE_NULL or str(v) != pvs
                    ):
                        keep = False
                if not keep:
                    break
            if keep:
                out.append(frec)
        return out

    def _bloom_prune(
        self,
        spark: SparkSession,
        table: str,
        snap: dict,
        files: list[dict],
        eq: dict,
        stat_name_fn,
    ) -> list[dict]:
        """Drop files whose Bloom sidecar proves an ``eq`` value absent.
        Purely an optimization: a missing/unreadable sidecar, a column
        without a bloom, or a value type whose string form could drift
        from Spark's CAST (bytes/float/datetime) keeps the file.  Reads
        ≤ k sidecar words per (dir, col) via parquet predicate pushdown;
        no data file is opened."""
        import pyarrow.parquet as pq

        blooms = snap.get("blooms") or {}
        pos_cache: dict = {}
        side_cache: dict = {}
        out = []
        for frec in files:
            cfg = blooms.get(frec["dir"])
            drop = False
            if cfg:
                for c, v in eq.items():
                    if not isinstance(v, (str, int)) or isinstance(v, bool):
                        continue  # str(v) may differ from CAST AS STRING
                    wname = stat_name_fn(frec, c)
                    if wname is None or wname not in cfg["cols"]:
                        continue
                    pkey = (cfg["bits"], cfg["k"], str(v))
                    pts = pos_cache.get(pkey)
                    if pts is None:
                        pts = pos_cache[pkey] = _bloom_positions(
                            spark, str(v), cfg["bits"], cfg["k"]
                        )
                    skey = (frec["dir"], wname, pkey)
                    if skey not in side_cache:
                        sidecar = _bloom_sidecar(
                            os.path.join(self._tdir(table), frec["dir"])
                        )
                        try:
                            tbl = pq.read_table(
                                sidecar,
                                filters=[
                                    ("col", "=", wname),
                                    (
                                        "word",
                                        "in",
                                        sorted({w for w, _ in pts}),
                                    ),
                                ],
                            )
                            side_cache[skey] = dict(
                                zip(
                                    zip(
                                        tbl["fname"].to_pylist(),
                                        tbl["word"].to_pylist(),
                                    ),
                                    tbl["bits"].to_pylist(),
                                )
                            )
                        except (FileNotFoundError, OSError):
                            side_cache[skey] = None  # sidecar gone: keep
                    words = side_cache[skey]
                    if words is None:
                        continue
                    for w, b in pts:
                        # sidecars record basenames (input_file_name);
                        # partitioned dirs prepend pv= subpaths to the
                        # manifest name — part-file uuids keep basenames
                        # unique within a dir
                        bits = words.get(
                            (os.path.basename(frec["name"]), w), 0
                        )
                        # python ints are two's-complement under >>, so
                        # the sign bit of the stored long extracts fine
                        if not (bits >> b) & 1:
                            drop = True
                            break
                    if drop:
                        break
            if not drop:
                out.append(frec)
        return out

    def scan(
        self,
        spark: SparkSession,
        table: str,
        ranges: dict[str, tuple] | None = None,
        snapshot_id: int | None = None,
        eq: dict | None = None,
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

        ``eq`` maps column → value for POINT LOOKUPS.  Each equality
        contributes a degenerate (v, v) range to the min/max pass AND —
        when the table was written with ``bloom_cols`` — consults the
        per-file Bloom sidecars: a file whose bloom provably lacks the
        value is skipped even though its [min, max] covers it, which on
        a high-cardinality unsorted key (url) is the difference between
        opening k words per file and opening every file.  False
        positives only cost a read (the residual filter still applies);
        false negatives cannot happen (probe and build share Spark's
        ``xxhash64``).  NULL is not a value — use a filter on the read.
        """
        ranges = dict(ranges or {})
        eq = dict(eq or {})
        for c, v in eq.items():
            if v is None:
                raise ValueError(
                    f"eq[{c!r}] is None — equality probes need a value; "
                    "filter IS NULL on read() instead"
                )
            if c in ranges:
                raise ValueError(
                    f"column {c!r} appears in both ranges and eq"
                )
            ranges[c] = (v, v)
        man = self._load_manifest(table)  # ONE load → one consistent view
        if not man["snapshots"]:
            raise FileNotFoundError(f"no snapshots for table {table}")
        snap = self._get_snap(table, snapshot_id, man["snapshots"])
        if not ranges:  # no predicate → plain snapshot read
            return self.read(spark, table, snap["snapshot_id"])
        for c, r in ranges.items():
            if r is None or (isinstance(r, list) and not r):
                # e.g. grid.cell_disk_ranges' over-budget None forwarded
                raise ValueError(
                    f"ranges[{c!r}] is {r!r} — pass concrete (lo, hi) "
                    "range(s), or omit the column to skip filtering on it"
                )
        def _bound(v):
            # the SAME coercion the manifest writer applies to stats
            # (bytes → str, datetime/date → isoformat) — an int/datetime
            # user range must compare against JSON-ified stats
            # consistently, not raise TypeError mid-prune
            if isinstance(v, bytes):
                return v.decode("utf-8", "replace")
            if hasattr(v, "isoformat"):
                return v.isoformat()
            return v

        norm = {
            c: [
                (_bound(lo), _bound(hi))
                for lo, hi in (r if isinstance(r, list) else [r])
            ]
            for c, r in ranges.items()
        }
        # merge behavior must reflect the SNAPSHOT's layout, not the
        # post-pruning survivor set — computed before any segment skip
        snap_multi_dir = len(self._snap_dirs(snap)) > 1
        schema_log = (man.get("schema") or {}).get("log")
        segs = snap.get("segments")
        if segs is not None and not schema_log:
            # manifest-LIST-level pruning (≡ Iceberg's manifest-list
            # partition summaries): drop whole segments whose coarse
            # bounds provably exclude every range BEFORE loading any
            # file entry — on a 100k-file table a point lookup loads a
            # handful of segment files, not the whole manifest tier.
            # Skipped entirely when the schema log is non-empty:
            # segment bounds are keyed by write-time column names, and
            # only the per-file pass knows each file's field-id mapping
            # (kept = conservative, never wrongly pruned).
            tdir = os.path.dirname(snap["path"])
            files = []
            for ref in segs:
                if self._seg_ref_excluded(ref, norm):
                    continue
                files.extend(
                    {**f, "_seg": ref["name"]}
                    for f in self._load_segment(tdir, ref["name"])
                )
        else:
            files = self._snap_files(snap)
        # schema evolution: per-file stats are keyed by WRITE-TIME
        # names; a predicate on a renamed column must consult the name
        # its file's schema version bound to the same field id —
        # otherwise every pre-rename file loses pruning (kept, never
        # wrongly dropped, but the scan degrades to a full read)
        schema_state = man.get("schema")
        cur_id_by_name = (
            {f["name"]: f["id"] for f in schema_state["fields"]}
            if schema_state
            else {}
        )

        def _stat_name(frec: dict, col: str) -> str | None:
            # None = the file's write-time schema has no column bound to
            # the CURRENT field id (drop + re-add of the same name):
            # its same-named stats describe the RETIRED column, so the
            # file must be kept un-pruned (the current column reads as
            # NULL there — conservative, like Iceberg's null-stats)
            if not schema_state or not schema_state["log"]:
                return col
            then = self._fields_for_sid(
                schema_state, self._dir_sid(frec["dir"])
            )
            by_id = {f["id"]: f["name"] for f in then}
            return by_id.get(cur_id_by_name.get(col))

        if files or segs is not None:
            # segs with every segment pruned is "provably empty", NOT a
            # pre-stats snapshot: flow through to the schema-preserving
            # empty-relation branch below, never to a full read
            files = self._partition_prune(
                spark, snap, files, norm, eq, _stat_name
            )
            keep = []
            for frec in files:
                stats = frec.get("stats", {})
                ok = True
                for col, rs in norm.items():
                    st = stats.get(_stat_name(frec, col))
                    if st is None or st["min"] is None or st["max"] is None:
                        continue  # no stats → cannot prune this file
                    stat_is_str = isinstance(st["min"], str)
                    if stat_is_str and _ISO_TS.match(st["min"]):
                        # stats are 'T'-separated isoformat; a Spark-
                        # style 'YYYY-MM-DD HH:MM:SS' bound would sort
                        # BEFORE every 'T' form lexicographically and
                        # silently prune wrong files — normalize it
                        rs = [
                            (
                                _iso_t(lo) if isinstance(lo, str) else lo,
                                _iso_t(hi) if isinstance(hi, str) else hi,
                            )
                            for lo, hi in rs
                        ]
                    if any(
                        isinstance(lo, str) != stat_is_str
                        or isinstance(hi, str) != stat_is_str
                        for lo, hi in rs
                    ):
                        raise TypeError(
                            f"ranges[{col!r}] bounds are "
                            f"{type(rs[0][0]).__name__} but the manifest "
                            f"stats for {col!r} are "
                            f"{type(st['min']).__name__} — pass bounds of "
                            "the stored column's type (timestamps as "
                            "datetime/isoformat strings)"
                        )
                    if not any(
                        st["min"] <= hi and st["max"] >= lo for lo, hi in rs
                    ):
                        ok = False
                        break
                if ok:
                    keep.append(frec)
            if eq and (snap.get("blooms") or {}):
                keep = self._bloom_prune(
                    spark, table, snap, keep, eq, _stat_name
                )
            if not keep:
                from pyspark.sql import functions as F

                # schema-preserving empty: the optimizer folds
                # filter(false) to an empty LocalRelation — no scan.
                # ONE file per dir suffices for the merged schema (a
                # dir = one write = one physical schema), so a no-match
                # scan on a 100k-file table opens n_dirs footers, not
                # 100k
                probe, probed = [], set()
                for frec in self._snap_files(snap):
                    if frec["dir"] not in probed:
                        probed.add(frec["dir"])
                        probe.append(
                            os.path.join(
                                self._tdir(table), frec["dir"], frec["name"]
                            )
                        )
                df = self._read_resolved(
                    spark,
                    table,
                    probe or self._file_paths(table, snap),
                    merge=snap_multi_dir,
                    state=schema_state,
                ).where(F.lit(False))
            else:
                # delete-aware: equality deletes apply to the surviving
                # files with the same sequence semantics as read()
                df = self._read_with_deletes(
                    spark,
                    table,
                    snap,
                    keep,
                    merge=snap_multi_dir,
                    state=schema_state,
                    state_from_caller=True,
                )
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
        dangling = {
            n: s
            for n, s in (man.get("refs") or {}).items()
            if s > snapshot_id
        }
        if dangling:
            raise ValueError(
                f"rollback past tagged snapshot(s) {dangling} would "
                "dangle the tag(s) — remove_tag() first"
            )
        forked = {
            n: b["fork"]
            for n, b in (man.get("branches") or {}).items()
            if b["fork"] > snapshot_id
        }
        if forked:
            # the branch's appends re-reference its fork ancestors'
            # data dirs — rmtree'ing them below would corrupt the branch
            raise ValueError(
                f"rollback past branch fork point(s) {forked} would "
                "orphan the branch(es) — publish_branch()/drop_branch() "
                "first"
            )
        dropped = [s for s in man["snapshots"] if s["snapshot_id"] > snapshot_id]
        man["snapshots"] = [
            s for s in man["snapshots"] if s["snapshot_id"] <= snapshot_id
        ]
        self._commit_manifest(table, man)
        for s in dropped:
            shutil.rmtree(s["path"], ignore_errors=True)
            shutil.rmtree(_bloom_sidecar(s["path"]), ignore_errors=True)
        alive = man["snapshots"] + (man.get("branch_snapshots") or [])
        dead_segs = self._live_segments(dropped) - self._live_segments(alive)
        segdir = self._seg_dir(self._tdir(table))
        for name in dead_segs:
            _SEG_CACHE.pop(os.path.join(segdir, name), None)
            try:
                os.unlink(os.path.join(segdir, name))
            except OSError:
                pass


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
