"""Training-data dedup sweep over a document corpus: exact dedup →
MinHash-LSH near-dup pairs → survivor selection.

    python examples/dedup_corpus.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eodal_spark.operators import dedup
from eodal_spark.session import get_spark

spark = get_spark("example_dedup")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

exact = dedup.exact_dedup(docs)
print("exact survivors:", exact.count(), "of", docs.count())

pairs = dedup.minhash_dedup(docs, threshold_milli=600)
print("near-dup pairs (jaccard >= 0.6):")
pairs.orderBy(F.desc(F.col("inter") / F.col("uni"))).show(10)

# survivor rule: canonical GROUPS via transitive closure (a doc
# duplicated 3 ways keeps exactly one copy, not one per pair), then
# keep each group's min id
groups = dedup.dup_groups(docs, pairs)
survivors = exact.join(
    groups.filter(F.col("doc_id") == F.col("group_id")).select("doc_id"),
    "doc_id",
)
print("after near-dup group removal:", survivors.count())

# deterministic 10% curation sample — stable across reruns/partitions
from eodal_spark.operators import text as TX

sample = TX.hash_sample(survivors, "doc_id", 100)
print("10% curated sample:", sample.count())
spark.stop()
