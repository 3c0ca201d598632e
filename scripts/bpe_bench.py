"""BPE training bench — the one-corpus-pass / vocab-sized-rounds
split that makes tokenizer training tractable at 100 TB.

Corpus: n docs × ~50 words drawn zipf-ishly from a 100k-word base
vocabulary.  The bench times the single corpus aggregation
(``word_freq``) separately from the merge rounds, because that split
IS the scale contract: the corpus pass is O(corpus) once, every one
of the hundreds of rounds after it is O(|vocab|) — megabytes, not
terabytes.  Writes a TOKENIZER block into BENCH/BASELINE.md.

    python scripts/bpe_bench.py [n_docs] [n_merges]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from eodal_spark.operators import bpe as B
from eodal_spark.session import get_spark

BASE_VOCAB = 100_000
WORDS_PER_DOC = 50


def corpus(spark, n: int):
    """~50 words/doc; word ids folded quadratically so frequencies are
    zipf-ish (small ids appear in many docs, the tail is rare)."""
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(
            F.xxhash64(F.col("id") * 53 + i)
            % F.pmod(F.xxhash64(F.lit(7) + i), F.lit(BASE_VOCAB - 1)) + 1,
            F.lit(BASE_VOCAB),
        ).cast("string"),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)), lambda i: word(i)
            ),
        ).alias("text"),
    )


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 1_000_000
    n_merges = int(pos[1]) if len(pos) > 1 else 48
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "eodal_bpe_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = corpus(spark, n).cache()
    n_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]

    t0 = time.time()
    vocab_rows = B.word_freq(docs).count()
    corpus_pass = time.time() - t0

    t0 = time.time()
    merges = B.train_bpe(docs, n_merges=n_merges)
    total = time.time() - t0
    rounds = len(merges)
    per_round = (total - corpus_pass) / max(rounds, 1)
    docs.unpersist()

    block = f"""<!-- TOKENIZER:BEGIN -->
## BPE training at bench scale ({n:,} docs, {n_tokens:,} tokens, local[{cpus}])

`train_bpe`, {rounds} merge rounds over a {vocab_rows:,}-word
vocabulary: **{total:.1f} s** total, of which the ONE corpus
aggregation costs {corpus_pass:.1f} s and each round
~{per_round:.2f} s.

That split is the scale contract: the corpus is touched ONCE
(`word_freq`, map-side combined); all {rounds} rounds after it run on
the vocabulary relation — pair explode, one groupBy, one total-ordered
driver action, one native replace.  At 10^12 corpus tokens the corpus
pass grows with the data; the rounds still cost vocabulary-sized work
(millions of rows), so a 500-merge production run adds minutes, not
corpus scans.  Apply (`bpe_pieces`) is zero-shuffle map-side and
rides whatever scan follows.
<!-- TOKENIZER:END -->
"""
    from _md import splice_block

    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "TOKENIZER", block)
    print(
        {
            "n_docs": n,
            "tokens": int(n_tokens),
            "vocab": vocab_rows,
            "rounds": rounds,
            "corpus_pass_sec": round(corpus_pass, 1),
            "per_round_sec": round(per_round, 2),
            "total_sec": round(total, 1),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
