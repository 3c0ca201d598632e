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

Morton-sorted snapshot, {len(snap["files"])} data files; bbox query =
{len(ranges)} Morton ranges ({full_n:,} matching rows).

| path | files listed | best of {REPS} (s) |
|---|---|---|
| `catalog.scan` (manifest pruning) | **{kept}** | {pruned_s:.3f} |
| full read + identical filter | {len(snap["files"])} | {full_s:.3f} |

Driver-side manifest selection keeps {kept}/{len(snap["files"])} files
({100 * kept // len(snap["files"])}%) before Spark lists anything; both
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

    from _md import splice_block

    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "CATALOG", block)
    print(
        {
            "files_total": len(snap["files"]), "files_kept": kept,
            "pruned_s": round(pruned_s, 3), "full_s": round(full_s, 3),
            "rows": full_n,
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
