"""Bigram-LM scoring bench — the CCNet perplexity tier at bench scale.

Trains on the deterministic 10% md5 slice of a 1M-doc corpus, scores
every doc, and times the two phases separately: training is two
vocab-shaped aggregations over the slice; scoring is one corpus
explode + broadcast model joins + one map-side-combinable groupBy.
The quantity that matters at 100 TB is the model SIZE the corpus side
joins against (broadcast while small, shuffle join via AQE when not) —
recorded alongside wall-clock.  Writes an LM block into
BENCH/BASELINE.md.

    python scripts/lm_bench.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from eodal_spark.operators import lm as LM
from eodal_spark.session import get_spark

REPS = 2


def corpus(spark, n: int):
    """~40 words/doc from a zipf-ish 50k-word vocabulary (same shape
    as bpe_bench): realistic bigram mass concentration."""
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(
            F.xxhash64(F.col("id") * 53 + i)
            % F.pmod(F.xxhash64(F.lit(7) + i), F.lit(49_999)) + 1,
            F.lit(50_000),
        ).cast("string"),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(F.sequence(F.lit(1), F.lit(40)), lambda i: word(i)),
        ).alias("text"),
    )


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "eodal_lm_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = corpus(spark, n).cache()
    n_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]

    t0 = time.time()
    model = LM.train_bigram_lm(docs, ref_milli=100)
    n_bigram_types = model.bigrams.count()
    train_s = time.time() - t0

    best, scored = float("inf"), 0
    for _ in range(REPS):
        t0 = time.time()
        scored = LM.score_bigram_lm(docs, model).count()
        best = min(best, time.time() - t0)
    docs.unpersist()

    rate = n / best / 1e3
    block = f"""<!-- LM:BEGIN -->
## Bigram-LM perplexity scoring at bench scale ({n:,} docs, {n_tokens:,} tokens, local[{cpus}])

Model trained on the 10% md5 slice ({n_bigram_types:,} bigram types,
vocab {model.vocab:,}) in {train_s:.1f} s; scoring ALL
{scored:,} docs: **{best:.1f} s** best of {REPS} =
{rate:.0f}k docs/s.

Training is two vocab-shaped aggregations over the slice (the only
driver action is the vocabulary scalar); scoring is one corpus
explode + model joins + one map-side-combinable groupBy.  The model
relations broadcast here (Catalyst size-estimate gate, the
`spatial_join` rule); a corpus whose slice produces a giant model
falls back to an AQE shuffle join on the bigram key — either way the
corpus side is touched once.  The gated integers and the float
log/exp edge are split per `operators/lm.py`; quantize-then-sum makes
the scoring partitioning-invariant (test-asserted).
<!-- LM:END -->
"""
    from _md import splice_block

    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "LM", block)
    print(
        {
            "n_docs": n,
            "tokens": int(n_tokens),
            "bigram_types": n_bigram_types,
            "vocab": model.vocab,
            "train_sec": round(train_s, 1),
            "score_sec": round(best, 1),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
