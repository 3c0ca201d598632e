"""Composed streaming-ingest throughput: the north-rule crawl pipeline

    WARC archives land → stream_warc (incremental discovery + parse)
    → geocode (cell assignment, pure Catalyst) → drain_to_catalog
    (one exactly-once append snapshot per micro-batch, cell-sorted)
    → read_changes (file-level delta to downstream consumers)

measured end-to-end at bench scale, with the exactly-once property
ASSERTED (an idempotent re-drain must add zero snapshots / zero rows,
and the delta must equal the newly-landed urls exactly).

Writes the results between INGEST markers in BENCH/BASELINE.md.
Run: ``python scripts/ingest_bench.py [rows]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as E
from _md import splice_block
from eodal_spark.session import get_spark
from eodal_spark.sources import pages as P
from eodal_spark.sources import warc as W
from eodal_spark.sources.catalog import SnapshotCatalog
from eodal_spark.streaming.ingest import drain_to_catalog

N_FILES = 32
COLS = ["url", "warc_ts", "cell_id", "lat_centi", "lon_centi"]


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    rows = int(pos[0]) if pos else 1_000_000
    rows_b = rows // 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "eodal_ingest_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
        # the landing archives here are ~5 MB; the default 128 MB split
        # packs ~25 of them into one partition and the Arrow parse runs
        # on 3 tasks out of 32 cores (measured 70 s for 1M rows).  Real
        # crawl archives are ~1 GB and pack 1:1 — locally, size the
        # split to the archive so parse parallelism = archive count.
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/eodal_spark_bench"),
        f"ingest_{rows}",
    )
    shutil.rmtree(work, ignore_errors=True)
    land = os.path.join(work, "landing")
    ckpt = os.path.join(work, "ckpt")
    cat = SnapshotCatalog(os.path.join(work, "cat"))

    # landings: batch A = rows, batch B = rows/5 later arrivals with
    # disjoint urls (archive creation is NOT part of the timed path —
    # in production the crawler wrote these)
    a = P.synth_pages(spark, rows, partitions=cpus * 2)
    W.write_warc(a, land).collect()
    # repartition AFTER the url filter: the filter keeps only the id
    # tail, which otherwise lands in a couple of fat archives (a
    # crawler writes evenly-sized ones)
    b = P.synth_pages(spark, rows + rows_b, partitions=max(cpus // 2, 2)).filter(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") >= rows
    ).repartition(max(cpus // 2, 2))

    def drain() -> float:
        t0 = time.time()
        drain_to_catalog(
            P.geocode(W.stream_warc(spark, land), E.RES).select(*COLS),
            ckpt, cat, "pages_geo", sort_by=("cell_id",), n_files=N_FILES,
        )
        return time.time() - t0

    # initial drain: parse + geocode + sorted snapshot commit of batch A
    full_s = drain()
    n_rows = cat.read(spark, "pages_geo").count()
    assert n_rows == rows, (n_rows, rows)
    snaps_after_a = len(cat.snapshots("pages_geo"))

    # exactly-once: re-drain with nothing new is a no-op
    redrain_s = drain()
    assert len(cat.snapshots("pages_geo")) == snaps_after_a
    assert cat.read(spark, "pages_geo").count() == rows

    # batch B lands → incremental drain touches only the new archives
    W.write_warc(b, land, prefix="b2-").collect()
    incr_s = drain()
    total = cat.read(spark, "pages_geo").count()
    assert total == rows + rows_b, (total, rows + rows_b)

    # downstream consumption: file-level delta, exactly the new urls
    t0 = time.time()
    delta = cat.read_changes(spark, "pages_geo", from_snapshot=snaps_after_a)
    delta_urls = delta.select("url").count()
    delta_s = time.time() - t0
    assert delta_urls == rows_b, (delta_urls, rows_b)
    null_cells = delta.filter(F.col("cell_id").isNull()).count()
    assert null_cells == 0

    block = f"""<!-- INGEST:BEGIN -->
## Streaming ingest: WARC → geocode → append snapshots → read_changes (local[{cpus}])

The composed north-rule pipeline, exactly-once asserted in-run (re-drain
adds 0 snapshots / 0 rows; the delta equals the newly-landed urls):

| stage | rows | wall (s) | rows/s |
|---|---|---|---|
| initial drain (parse + geocode + cell-sorted append commit) | {rows:,} | {full_s:.1f} | **{rows / full_s:,.0f}** |
| idempotent re-drain (nothing new — checkpointed file log) | 0 | {redrain_s:.1f} | — |
| incremental drain (batch B lands, only new archives parsed) | {rows_b:,} | {incr_s:.1f} | {rows_b / incr_s:,.0f} |
| read_changes file-level delta (downstream consumer) | {rows_b:,} | {delta_s:.1f} | {rows_b / delta_s:,.0f} |

The incremental drain costs O(new archives), not O(table): the
streaming source's file log skips consumed archives, and the append
commit re-references the parent snapshot's files.  At 100 TB the same
plan holds — per-executor WARC parsing is one Arrow stage, the
geocode is whole-stage codegen, and the commit writes only the batch.
<!-- INGEST:END -->"""
    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "INGEST", block)
    print(block)
    spark.stop()


if __name__ == "__main__":
    main()
