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

import numpy as np

from eodal_spark import grid
from eodal_spark.session import get_spark
from eodal_spark.sources.catalog import SnapshotCatalog
import __spark_entry__ as E
import bench as B

N_FILES = 256
REPS = 3


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
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
    n = 1 << E.RES
    x = np.arange(lo_lon * n // 36000, ((hi_lon - 1) * n // 36000) + 1)
    y = np.arange(lo_lat * n // 18000, ((hi_lat - 1) * n // 18000) + 1)
    gx, gy = np.meshgrid(x, y)
    cells = (E.RES << 58) + (gx.ravel().astype(np.int64) << 29) + gy.ravel()
    ranges = grid.morton_ranges(cells)

    # driver-side: how many files does the manifest keep?
    kept = 0
    for f in snap["files"]:
        st = f["stats"].get("morton")
        if st is None or any(
            st["min"] <= hi and st["max"] >= lo for lo, hi in ranges
        ):
            kept += 1

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
    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    prev = open(md_path).read()
    if "<!-- CATALOG:BEGIN -->" in prev:
        head = prev.split("<!-- CATALOG:BEGIN -->", 1)[0]
        tail = prev.split("<!-- CATALOG:END -->", 1)[1]
        out = head + block.rstrip("\n") + tail
    else:
        out = prev.rstrip("\n") + "\n\n" + block
    with open(md_path, "w") as f:
        f.write(out)
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
