"""Corpus curation on a SnapshotCatalog table: equality-delete a set of
urls (merge-on-read, nothing rewritten), time-travel to audit the
pre-purge state, re-ingest a key (sequence semantics resurrect it),
then compact to apply the deletes physically.

    python examples/curate_catalog.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eodal_spark.session import get_spark
from eodal_spark.sources import pages as P
from eodal_spark.sources.catalog import SnapshotCatalog

spark = get_spark("example_curate")
spark.sparkContext.setLogLevel("ERROR")

root = os.path.join(tempfile.gettempdir(), "example_curate_cat")
shutil.rmtree(root, ignore_errors=True)
cat = SnapshotCatalog(root)

geo = P.geocode(P.synth_pages(spark, 50_000), res=12).select(
    "url", "cell_id", "lang"
)
cat.write(geo, "pages", sort_by=("cell_id",), n_files=8)
before = time.time()
print("ingested:", cat.read(spark, "pages").count(), "pages")

# curation pass: purge every page a (toy) policy flags — O(keys) commit
flagged = geo.filter(F.crc32("url") % 50 == 0).select("url")
cat.delete_keys(spark, "pages", flagged)
print("after purge:", cat.read(spark, "pages").count())

# audit: TIMESTAMP AS OF sees the pre-purge corpus
print("as-of audit:", cat.read(spark, "pages", as_of=before).count())

# a purged url is re-crawled later — the append resurrects it
recrawled = geo.join(F.broadcast(flagged), "url", "left_semi").limit(1)
cat.write(recrawled, "pages", sort_by=("cell_id",), mode="append", n_files=1)
print("after re-crawl:", cat.read(spark, "pages").count())

# maintenance: apply deletes physically, drop history
cat.compact(spark, "pages", n_files=8)
cat.expire_snapshots("pages", keep_last=1)
print("post-compact:", cat.read(spark, "pages").count())

spark.stop()
