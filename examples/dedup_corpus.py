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

# survivor rule: drop the higher id of every verified pair
drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
survivors = exact.join(drop, "doc_id", "left_anti")
print("after near-dup removal:", survivors.count())
spark.stop()
