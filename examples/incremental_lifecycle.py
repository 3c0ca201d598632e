"""Round-5 table lifecycle: MERGE upserts, DELETE WHERE position
deletes, incremental rollup maintenance, tags and vacuum — the full
re-crawl curation loop on one SnapshotCatalog table.

    python examples/incremental_lifecycle.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eodal_spark.operators.incremental import refresh_rollup
from eodal_spark.session import get_spark
from eodal_spark.sources import pages as P
from eodal_spark.sources.catalog import SnapshotCatalog

spark = get_spark("example_lifecycle")
spark.sparkContext.setLogLevel("ERROR")

root = os.path.join(tempfile.gettempdir(), "example_lifecycle_cat")
shutil.rmtree(root, ignore_errors=True)
cat = SnapshotCatalog(root)

# 1. initial crawl lands sorted by cell
geo = P.geocode(P.synth_pages(spark, 50_000), res=12).select(
    "url", "cell_id", F.length("text").alias("n_chars")
)
s1 = cat.write(geo, "pages", sort_by=("cell_id",), n_files=8)
print("initial crawl:", cat.read(spark, "pages").count(), "pages")

# 2. tag it — the snapshot a model trains on stays addressable forever
cat.tag("pages", "train-v1")

# 3. maintain a per-cell rollup incrementally
refresh_rollup(
    spark, cat, "pages", "cell_stats", ("cell_id",),
    [("count", "", "n_pages"), ("sum", "n_chars", "total_chars")],
)

# 4. a re-crawl: 10% of urls changed → ONE atomic MERGE commit
recrawl = geo.filter(F.crc32("url") % 10 == 0).withColumn(
    "n_chars", F.col("n_chars") + 7
)
cat.upsert(spark, recrawl, "pages", key_cols=("url",), n_files=2)
print("after upsert:", cat.read(spark, "pages").count(), "pages (same urls, new bytes)")

# 5. DELETE WHERE — arbitrary predicate, O(matches) position deletes
cat.delete_where(spark, "pages", "n_chars < 120")
print("after delete_where:", cat.read(spark, "pages").count(), "pages")

# 6. rollup refresh: the upsert/delete history has no file delta, so
#    this one is a full rebuild; afterwards appends go incremental
print("refresh:", refresh_rollup(
    spark, cat, "pages", "cell_stats", ("cell_id",),
    [("count", "", "n_pages"), ("sum", "n_chars", "total_chars")],
))

# 7. the tagged snapshot still reads the ORIGINAL crawl
print("train-v1 pages:", cat.read(spark, "pages", tag="train-v1").count())

# 8. maintenance: compact applies deletes physically, expiry keeps the
#    tagged snapshot regardless, vacuum sweeps orphan dirs
cat.compact(spark, "pages", n_files=4)
cat.expire_snapshots("pages", keep_last=2)
print("tags after expiry:", cat.tags("pages"))
print("orphans removed:", cat.remove_orphan_files("pages", older_than_seconds=0))
print("final:", cat.read(spark, "pages").count(), "pages;",
      cat.read(spark, "cell_stats").count(), "cells in rollup")
spark.stop()
