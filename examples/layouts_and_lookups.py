"""Physical-layout tour: the same pages table committed three ways —
hidden-partitioned (day × bucket), Z-ordered, and bloom-indexed — and
the scans each layout accelerates.

    python examples/layouts_and_lookups.py
"""

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eodal_spark.session import get_spark
from eodal_spark.sources import pages as P
from eodal_spark.sources.catalog import SnapshotCatalog

spark = get_spark("example_layouts")
spark.sparkContext.setLogLevel("ERROR")

root = os.path.join(tempfile.gettempdir(), "example_layouts_cat")
shutil.rmtree(root, ignore_errors=True)
cat = SnapshotCatalog(root)

pages = P.synth_pages(spark, 50_000).select("url", "warc_ts", "lang")
pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")

# 1. hidden partitioning: users query warc_ts/lang; the layout
#    partitions by day(warc_ts) x bucket(4, lang) invisibly
cat.write(
    pages, "by_day", partition_by=[["day", "warc_ts"], ["bucket", 4, "lang"]]
)
day = (dt.datetime(2019, 6, 15), dt.datetime(2019, 6, 15, 23, 59, 59))
n = cat.scan(spark, "by_day", {"warc_ts": day}).count()
print(f"partitioned: one UTC day = {n} rows (whole dirs pruned)")

# 2. z-order: clustered in BOTH derived dims; a y-only box still prunes
xy = pages.select("url", (pid % 1000).alias("x"),
                  ((pid * 2654435761) % 1000).alias("y"))
cat.write(xy, "zorded", zorder=("x", "y"), n_files=16)
n = cat.scan(spark, "zorded", {"y": (300, 350)}).count()
print(f"z-ordered:   y-only box = {n} rows (x-sort could prune nothing)")

# 3. bloom point lookup on the unsorted high-cardinality url key
cat.write(pages, "by_url", sort_by=("warc_ts",), n_files=16,
          bloom_cols=("url",))
probe = cat.read(spark, "by_url").filter(pid == 12345).first()["url"]
hit = cat.scan(spark, "by_url", eq={"url": probe}).count()
miss = cat.scan(spark, "by_url", eq={"url": "https://nope.example/p/1"}).count()
print(f"bloomed:     present url -> {hit} row; absent url -> {miss} rows, 0 files opened")

spark.stop()
