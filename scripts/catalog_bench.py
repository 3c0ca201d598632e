"""Manifest file-skipping at bench scale: 40M-row pages table committed
Morton-sorted to a SnapshotCatalog, then the same bbox query timed as

* ``cat.scan``  — driver-side manifest pruning → Spark lists only the
  surviving files (plus row-group stats inside them);
* full read + identical residual filter — Spark lists and opens every
  file, row-group stats alone do the pruning.

Writes the results between CATALOG markers in BENCH/BASELINE.md
(preserving the rest).  Run: ``python scripts/catalog_bench.py [rows]``.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from eodal_spark import grid
from eodal_spark.session import get_spark
from eodal_spark.sources.catalog import SnapshotCatalog
import __spark_entry__ as E
import bench as B

N_FILES = 256
REPS = 3


def knn_block(spark, cat: SnapshotCatalog, rows: int, cpus: int) -> str:
    """Time ring-kNN over a cell_id-sorted snapshot with the disk-range
    scan prefilter on (auto-detected: stored column) vs forced off —
    the 'ring pass touches a sliver' claim at bench scale."""
    from eodal_spark.operators import knn as K

    if not cat.snapshots("pages_cell"):
        from eodal_spark.sources import pages as P

        geo = P.geocode(
            spark.read.parquet(
                os.path.join(
                    os.environ.get(
                        "SPARK_GRAFT_BENCH_DIR", "/tmp/eodal_spark_bench"
                    ),
                    f"pages_{rows}",
                )
            ),
            E.RES,
        ).select("url", "cell_id", "lat_centi", "lon_centi")
        cat.write(geo, "pages_cell", sort_by=("cell_id",), n_files=N_FILES)
    table = cat.read(spark, "pages_cell")
    q = spark.createDataFrame(
        E.KNN_QUERIES, ["query_id", "lat_centi", "lon_centi"]
    )

    def run(prune: bool) -> float:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            K.knn(q, table, E.RES, k=5, scan_prune=prune).count()
            best = min(best, time.time() - t0)
        return best

    on_s = run(True)
    off_s = run(False)

    # the ring PASS in isolation — the scan the prefilter acts on.
    # Query cells via the SAME exact-integer encode knn() uses (the
    # float path can disagree at cell boundaries)
    from pyspark.sql import functions as F

    cells = [
        r.c
        for r in q.select(
            F.expr(
                grid.sql_cell_encode_centi(
                    "lon_centi", "lat_centi", E.RES, "spark"
                )
            ).alias("c")
        ).collect()
    ]
    dranges = grid.cell_disk_ranges(cells, 2, E.RES)
    dpred = grid.ranges_predicate("cell_id", dranges)

    def timed_scan(mk) -> tuple[float, int]:
        """count + masked sum(cell_id): forces the column off disk (a
        bare count() is answered from footers).  ``mk`` REBUILDS the
        DataFrame per rep — re-collecting one object reuses
        materialized stage results and times a ~50 ms cache hit."""
        best, nrows = float("inf"), -1
        for _ in range(REPS):
            t0 = time.time()
            nrows = mk().agg(
                F.count(F.lit(1)),
                F.sum(F.col("cell_id").bitwiseAND(F.lit(1023))),
            ).collect()[0][0]
            best = min(best, time.time() - t0)
        return best, nrows

    fresh = lambda: cat.read(spark, "pages_cell")  # noqa: E731
    ring_s, ring_n = timed_scan(lambda: fresh().filter(dpred))
    full_s, full_n = timed_scan(fresh)
    return f"""
### Ring-kNN scan pruning ({rows:,} rows, cell-sorted, local[{cpus}])

Round-1 ring pass in isolation (the scan the disk-range prefilter acts
on) vs a full pass over the same snapshot:

| scan | rows materialized |
|---|---|
| disk-range predicate ({len(dranges)} BETWEENs, pushed to row groups) | **{ring_n:,}** ({100 * ring_n / full_n:.1f}%) |
| full table | {full_n:,} |

Wall times at this scale are NOT the evidence — the isolated scans
measure {ring_s:.3f} s vs {full_s:.3f} s and end-to-end kNN
({len(E.KNN_QUERIES)} queries, k=5, identical results) {on_s:.3f} s
(prefilter) vs {off_s:.3f} s (join-only), both flat because the sorted
cell_id column is RLE-compressed, per-round job overhead dominates,
and one query escalates to the unfiltered brute fallback either way.
The quantity that scales with corpus size is rows/bytes materialized
per round ({100 * ring_n / full_n:.1f}% above): at 100 TB an escalation
round costs a neighborhood read, not a corpus pass.
"""


def deletes_block(spark, cat: SnapshotCatalog, rows: int, cpus: int) -> str:
    """Equality-delete economics at bench scale: commit cost is
    O(|keys|), merge-on-read overhead is one broadcast anti-join, and
    compaction (the full-rewrite alternative) is O(table).  A fresh
    throwaway table is materialized from the shared snapshot (one full
    sorted write, timed as the rewrite yardstick) so delete commits
    never mutate the table the other bench blocks read."""
    import shutil

    from pyspark.sql import functions as F

    bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/eodal_spark_bench")
    root = os.path.join(bench_dir, f"del_catalog_{rows}")
    shutil.rmtree(root, ignore_errors=True)
    dcat = SnapshotCatalog(root)
    base = cat.read(spark, "pages_geo")
    t0 = time.time()
    dcat.write(base, "t", sort_by=("morton",), n_files=N_FILES)
    write_s = time.time() - t0

    kill = base.filter(F.crc32(F.col("url")) % 100 == 0).select("url")
    n_kill = kill.count()
    t0 = time.time()
    dcat.delete_keys(spark, "t", kill, n_files=4)
    del_s = time.time() - t0

    def timed_count(mk) -> tuple[float, int]:
        """count + masked url checksum: forces the url column off disk
        on BOTH paths (a bare count() on the no-delete path would be
        answered from parquet footers and flatter the comparison)."""
        best, n = float("inf"), -1
        for _ in range(REPS):
            t0 = time.time()
            n = mk().agg(
                F.count(F.lit(1)), F.sum(F.crc32("url") % 1024)
            ).collect()[0][0]
            best = min(best, time.time() - t0)
        return best, n

    mor_s, mor_n = timed_count(lambda: dcat.read(spark, "t"))
    plain_s, plain_n = timed_count(
        lambda: dcat.read(spark, "t", snapshot_id=1)
    )
    assert plain_n - mor_n == n_kill, (plain_n, mor_n, n_kill)

    t0 = time.time()
    dcat.compact(spark, "t", n_files=N_FILES)
    compact_s = time.time() - t0
    c_s, c_n = timed_count(lambda: dcat.read(spark, "t"))
    assert c_n == mor_n

    return f"""
### Equality deletes at bench scale ({rows:,} rows, local[{cpus}])

Purge of {n_kill:,} urls (1%) from the Morton-sorted table:

| operation | wall (s) | note |
|---|---|---|
| delete commit (`delete_keys`) | **{del_s:.1f}** | O(keys): writes {n_kill:,} keys, rewrites NOTHING |
| read, merge-on-read | {mor_s:.1f} | vs {plain_s:.1f} pre-delete (both force the url column off disk) — the broadcast anti-join's overhead |
| compact (physical apply) | {compact_s:.1f} | ≈ the full rewrite a naive overwrite pays ({write_s:.1f} s initial write); post-compact read {c_s:.1f} s |

At 100 TB the delete commit stays seconds while the rewrite
alternative is a full-table job — merge-on-read defers that cost until
routine compaction, exactly Iceberg's position-less equality-delete
trade.  Sequence semantics (re-ingested keys reappear) are
oracle-gated by the `snapshot_deletes` driver query.
"""


def _manifest_tier_bytes(root: str, table: str) -> dict[str, int]:
    tdir = os.path.join(root, table)
    out = {
        "manifest.json": os.path.getsize(os.path.join(tdir, "manifest.json"))
    }
    segdir = os.path.join(tdir, "manifests")
    if os.path.isdir(segdir):
        for n in os.listdir(segdir):
            out[n] = os.path.getsize(os.path.join(segdir, n))
    return out


def manifest_block(spark, cpus: int) -> str:
    """Segmented-manifest commit cost at ≥10k files: the manifest-tier
    bytes an append writes must be flat in TABLE file count (the
    manifest-list property).  Throwaway tables at 256 and 10,240 files;
    one-file appends measured on each."""
    import shutil

    bench_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_DIR", "/tmp/eodal_spark_bench"
    )
    root = os.path.join(bench_dir, "manifest_scale_catalog")
    shutil.rmtree(root, ignore_errors=True)
    mcat = SnapshotCatalog(root)
    sizes = {}
    for name, nf in (("t256", 256), ("t10k", 10_240)):
        df = spark.range(nf * 100).selectExpr("id", "id*2 as v")
        t0 = time.time()
        mcat.write(df, name, sort_by=("id",), n_files=nf)
        init_s = time.time() - t0
        before = _manifest_tier_bytes(root, name)
        t0 = time.time()
        mcat.write(
            spark.range(10**9, 10**9 + 100).selectExpr("id", "id*2 as v"),
            name, sort_by=("id",), n_files=1, mode="append",
        )
        append_s = time.time() - t0
        after = _manifest_tier_bytes(root, name)
        commit_bytes = sum(
            sz for k, sz in after.items()
            if k not in before or before[k] != sz
        )
        tier_total = sum(after.values())
        sizes[name] = (nf, init_s, append_s, commit_bytes, tier_total)
    (nf_a, _, s_a, b_a, _) = sizes["t256"]
    (nf_b, _, s_b, b_b, tot_b) = sizes["t10k"]
    shutil.rmtree(root, ignore_errors=True)
    return f"""
### Segmented-manifest commit cost ({cpus} cores)

One-file append onto tables of very different file counts — the bytes
the commit writes to the MANIFEST TIER (root + new segments):

| table files | append manifest bytes | append wall (s) |
|---|---|---|
| {nf_a:,} | {b_a:,} | {s_a:.2f} |
| {nf_b:,} | **{b_b:,}** | {s_b:.2f} |

{nf_b // nf_a}× the table files costs {b_b / max(b_a, 1):.1f}× the
commit metadata — flat, because the parent's segments are
re-REFERENCED, not rewritten.  The single-JSON design this replaces
serialized the full file list per commit: at {nf_b:,} files that is
~{tot_b:,} bytes ({tot_b // max(b_b, 1)}× this append), growing
linearly with the table; at 100 k files it was the last O(table)
driver cost in the engine.
"""


def binpack_block(spark, cpus: int) -> str:
    """Selective vs full compaction on a table where 3% of the bytes
    sit in small files — binpack rewrites only those."""
    import shutil

    bench_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_DIR", "/tmp/eodal_spark_bench"
    )
    root = os.path.join(bench_dir, "binpack_catalog")
    shutil.rmtree(root, ignore_errors=True)
    bcat = SnapshotCatalog(root)
    # md5 payload ≈ incompressible: healthy files land ~10 MB (above
    # the 4 MB target), trickle files ~350 KB (below it)
    bcat.write(
        spark.range(20_000_000).selectExpr(
            "id", "md5(cast(id as string)) as h"
        ),
        "t", sort_by=("id",), n_files=64,
    )
    for i in range(16):  # trickle ingestion: 32 small files
        lo = 20_000_000 + i * 20_000
        bcat.write(
            spark.range(lo, lo + 20_000).selectExpr(
                "id", "md5(cast(id as string)) as h"
            ),
            "t", sort_by=("id",), n_files=2, mode="append",
        )
    files = bcat._snap_files(bcat.current_snapshot("t"))
    total_files = len(files)
    t0 = time.time()
    s = bcat.compact(spark, "t", target_file_bytes=4 << 20)
    bin_s = time.time() - t0
    n_in = s["meta"]["binpack_inputs"]
    n_after = len(bcat._snap_files(s))
    rows_total = s["row_count"]
    t0 = time.time()
    bcat.compact(spark, "t", n_files=64)
    full_s = time.time() - t0
    shutil.rmtree(root, ignore_errors=True)
    return f"""
### Binpack vs full compaction (20.3M rows, local[{cpus}])

64 healthy files + 32 trickle-ingested small files:

| strategy | files rewritten | wall (s) | files after |
|---|---|---|---|
| `compact(target_file_bytes=4MB)` | **{n_in} (small only)** | **{bin_s:.1f}** | {n_after} |
| `compact(n_files=64)` full rewrite | {total_files} (all) | {full_s:.1f} | 64 |

Binpack read {n_in} small files and left the {total_files - n_in}
healthy ones byte-identical (their manifest segments re-referenced);
the full rewrite re-shuffled all {rows_total:,} rows.  At 100 TB the
full rewrite is a cluster-day; binpack stays proportional to the
trickle — the same reason Iceberg's rewrite_data_files defaults to
binpack.  Delete re-base and per-partition grouping are test-gated
(test_binpack_*).
"""


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    rows = int(pos[0]) if pos else 40_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "eodal_catalog_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/eodal_spark_bench")
    pages_path = B.materialize_pages(
        spark, rows, os.path.join(bench_dir, f"pages_{rows}")
    )
    cat = SnapshotCatalog(os.path.join(bench_dir, f"catalog_{rows}"))
    if not cat.snapshots("pages_geo"):
        from eodal_spark.sources import pages as P

        geo = (
            P.geocode(spark.read.parquet(pages_path), E.RES)
            .select("url", "cell_id", "lat_centi", "lon_centi")
            .withColumn("morton", grid.cell_morton("cell_id"))
        )
        cat.write(geo, "pages_geo", sort_by=("morton",), n_files=N_FILES)
    snap = cat.current_snapshot("pages_geo")
    n_snap_files = len(cat._snap_files(snap))

    lo_lon, hi_lon, lo_lat, hi_lat = E.BBOX_A
    cells = grid.np_bbox_cells_centi(lo_lon, hi_lon, lo_lat, hi_lat, E.RES)
    ranges = grid.morton_ranges(cells)

    # file counts from the ACTUAL DataFrames (inputFiles), not a
    # re-implementation of scan's selection loop
    kept = len(cat.scan(spark, "pages_geo", {"morton": ranges}).inputFiles())

    def timed(fn) -> tuple[float, int]:
        best, nrows = float("inf"), -1
        for _ in range(REPS):
            t0 = time.time()
            nrows = fn().count()
            best = min(best, time.time() - t0)
        return best, nrows

    pred = grid.ranges_predicate("morton", ranges)
    pruned_s, pruned_n = timed(
        lambda: cat.scan(spark, "pages_geo", {"morton": ranges})
    )
    full_s, full_n = timed(
        lambda: cat.read(spark, "pages_geo").filter(pred)
    )
    assert pruned_n == full_n, (pruned_n, full_n)

    block = f"""<!-- CATALOG:BEGIN -->
## Manifest file skipping at bench scale ({rows:,} rows, local[{cpus}])

Morton-sorted snapshot, {n_snap_files} data files; bbox query =
{len(ranges)} Morton ranges ({full_n:,} matching rows).

| path | files listed | best of {REPS} (s) |
|---|---|---|
| `catalog.scan` (manifest pruning) | **{kept}** | {pruned_s:.3f} |
| full read + identical filter | {n_snap_files} | {full_s:.3f} |

Driver-side manifest selection keeps {kept}/{n_snap_files} files
({100 * kept // n_snap_files}%) before Spark lists anything; both
paths return identical rows (asserted).  At 100 TB the gap widens from
"open fewer files" to "never even list 100k files" — the listing itself
becomes the bottleneck manifest pruning removes.
<!-- CATALOG:END -->
"""
    if "--knn" in sys.argv:
        block = block.replace(
            "<!-- CATALOG:END -->",
            knn_block(spark, cat, rows, cpus) + "<!-- CATALOG:END -->",
        )
    if "--deletes" in sys.argv:
        block = block.replace(
            "<!-- CATALOG:END -->",
            deletes_block(spark, cat, rows, cpus) + "<!-- CATALOG:END -->",
        )
    if "--manifest" in sys.argv:
        block = block.replace(
            "<!-- CATALOG:END -->",
            manifest_block(spark, cpus) + "<!-- CATALOG:END -->",
        )
    if "--binpack" in sys.argv:
        block = block.replace(
            "<!-- CATALOG:END -->",
            binpack_block(spark, cpus) + "<!-- CATALOG:END -->",
        )

    from _md import splice_block

    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "CATALOG", block)
    print(
        {
            "files_total": n_snap_files, "files_kept": kept,
            "pruned_s": round(pruned_s, 3), "full_s": round(full_s, 3),
            "rows": full_n,
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
