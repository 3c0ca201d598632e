"""ExactSubstr bench — duplicate-span detection over a boilerplate-
heavy corpus at bench scale.

The adversarial-but-realistic shape for substring dedup is web
boilerplate: a modest set of passages (license blocks, nav footers,
quoted templates) repeated across a meaningful fraction of the corpus.
This bench builds a corpus where 20% of docs embed one of 200 shared
24-word passages inside otherwise-unique text, runs
``duplicate_span_stats`` (the xxhash64 scale path) end-to-end, and
records wall-clock plus the two quantities the scale contract is
about: the exploded-window count (the unavoidable suffix-array-sized
shuffle) and the duplicated sliver that reaches the lag-merge stage.
Writes a SUBSTR block into BENCH/BASELINE.md.

    python scripts/substr_bench.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from eodal_spark.operators import exact_substr as ES
from eodal_spark.session import get_spark

N_PASSAGES = 200
PASSAGE_WORDS = 24
N = 20  # window size (words)
REPS = 2


def corpus(spark, n: int):
    """~60 unique hash-words per doc; every 5th doc splices one of
    ``N_PASSAGES`` shared 24-word passages into the middle."""
    uniq = lambda lo, hi, salt: F.concat_ws(  # noqa: E731
        " ",
        F.transform(
            F.sequence(F.lit(lo), F.lit(hi)),
            lambda i: F.hex(F.xxhash64(F.col("id") * 1009 + i * salt)),
        ),
    )
    passage = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(PASSAGE_WORDS)),
            lambda i: F.concat(
                F.lit("bp"),
                ((F.col("id") % N_PASSAGES) * 1000 + i).cast("string"),
            ),
        ),
    )
    body = F.when(
        F.col("id") % 5 == 0,
        F.concat_ws(" ", uniq(1, 30, 7), passage, uniq(31, 60, 13)),
    ).otherwise(uniq(1, 60, 7))
    return spark.range(n).select(F.col("id").alias("doc_id"), body.alias("text"))


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "eodal_substr_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = corpus(spark, n).cache()
    docs.count()

    wins = ES.window_positions(docs, N)
    n_windows = wins.count()
    hot = (
        wins.groupBy("ng").agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
    )
    n_hot = hot.count()
    sliver = wins.join(hot.select("ng"), "ng", "left_semi").count()

    best, flagged = float("inf"), 0
    for _ in range(REPS):
        t0 = time.time()
        stats = ES.duplicate_span_stats(docs, n=N)
        flagged = stats.filter(F.col("n_dup_windows") > 0).count()
        best = min(best, time.time() - t0)
    docs.unpersist()

    rate = n / best / 1e3
    block = f"""<!-- SUBSTR:BEGIN -->
## ExactSubstr span detection at bench scale ({n:,} docs, local[{cpus}])

20% of docs embed one of {N_PASSAGES} shared {PASSAGE_WORDS}-word
passages; `duplicate_span_stats` (word-{N}-gram windows, xxhash64
keys): **{best:.1f} s** best of {REPS} = {rate:.0f}k docs/s end-to-end,
{flagged:,} docs flagged.

The cost anatomy the 100 TB design rests on: {n_windows:,} exploded
windows pay ONE 8-byte-key groupBy shuffle (the suffix-array-sized
pass that corpus-GLOBAL substring dedup cannot avoid — Lee et al.'s
distributed suffix array is the same order), while only the
{n_hot:,} duplicated window keys and their {sliver:,} positions
(~{1000 * sliver // max(n_windows, 1)}‰ of the windows) proceed to
the join-back and per-doc lag merge.  Everything downstream of the
multiplicity count scales with the DUPLICATED mass, not the corpus.
<!-- SUBSTR:END -->
"""
    from _md import splice_block

    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "SUBSTR", block)
    print(
        {
            "n_docs": n,
            "seconds": round(best, 1),
            "windows": n_windows,
            "hot_keys": n_hot,
            "sliver_rows": sliver,
            "flagged_docs": flagged,
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
