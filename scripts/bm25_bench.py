"""BM25 stopword df-cap bench — the retrieval hot-bucket defense.

The adversarial shape for a relational BM25 is a query containing
corpus-wide terms: "the" joins a posting list covering every document,
so one query term drags |corpus| candidate rows through the join while
contributing near-zero idf.  This bench builds a corpus where every
doc shares 10 stopwords, runs stopword-laden queries with the df cap
OFF (``max_df_frac=1.0``) and ON (the 0.5 default), and records the
candidate-row counts that explain the wall-clock.  Writes a BM25 block
into BENCH/BASELINE.md.

    python scripts/bm25_bench.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from eodal_spark.operators import retrieval as RET
from eodal_spark.session import get_spark

STOPWORDS = "the of and a in to is it for on"  # df = N, every doc
N_TOPICS = 1_000
REPS = 2


def corpus(spark, n: int):
    """Every doc: 10 corpus-wide stopwords + 1 topic word
    (df ≈ N/1000) + 4 unique hash words (df = 1)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(STOPWORDS + " topic"),
            (F.col("id") % N_TOPICS).cast("string"),
            F.lit(" "),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(4)),
                    lambda i: F.hex(F.xxhash64(F.col("id") * 257 + i)),
                ),
            ),
        ).alias("text"),
    )


def queries(spark):
    rows = [
        (q, f"the of and in topic{q * 117 % N_TOPICS}") for q in range(8)
    ]
    return spark.createDataFrame(rows, ["query_id", "qtext"])


def candidate_rows(docs, qs, max_df_frac: float) -> int:
    """Rows entering the scoring join under the given cap — the same
    postings/stats/term-explode construction bm25_topk runs."""
    postings = RET.build_postings(docs, "doc_id", "text")
    stats = RET.term_stats(postings)
    n = docs.count()
    if max_df_frac < 1.0:
        stats = stats.filter(F.col("df") <= int(max_df_frac * n))
    from eodal_spark.operators.text import _words

    qt = qs.select(
        "query_id", F.explode(_words(F.col("qtext"))).alias("term")
    ).dropDuplicates(["query_id", "term"])
    return qt.join(stats, "term").join(postings, "term").count()


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "eodal_bm25_bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = corpus(spark, n).cache()
    docs.count()
    qs = queries(spark)

    cand_raw = candidate_rows(docs, qs, 1.0)
    cand_capped = candidate_rows(docs, qs, 0.5)

    def run(frac: float, reps: int) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(reps):
            t0 = time.time()
            out = RET.bm25_topk(docs, qs, k=10, max_df_frac=frac)
            rows = out.count()
            best = min(best, time.time() - t0)
        return best, rows

    capped_s, capped_rows = run(0.5, REPS)
    raw_s, raw_rows = run(1.0, 1)
    docs.unpersist()

    block = f"""<!-- BM25:BEGIN -->
## BM25 df-cap on a stopword-laden corpus ({n:,} docs, local[{cpus}])

Every doc shares 10 corpus-wide stopwords; 8 queries each carry 4
stopwords + 1 topic term (df ≈ {n // N_TOPICS:,}):

| pipeline | candidate rows into scoring | top-10 rows out | seconds |
|---|---|---|---|
| df cap 0.5 (default) | **{cand_capped:,}** | {capped_rows} | **{capped_s:.1f}** (best of {REPS}) |
| cap off (`max_df_frac=1.0`) | {cand_raw:,} | {raw_rows} | {raw_s:.1f} (1 rep) |

The cap cuts the scoring join {cand_raw / max(cand_capped, 1):,.0f}×:
each uncapped stopword drags its full |corpus| posting list through
the join for every query that mentions it, while its floored idf
contributes ~0 to the ranking — the same quadratic-ish shape the LSH
exact-collapse defends against, and the same trade Lucene's stopword
filter makes.  At 10^12 docs the uncapped join is a corpus scan per
stopword per query; the capped join stays proportional to the CONTENT
terms' posting lists.  Ranking correctness under the cap is
hash-gated by the `docs_bm25_topk` driver battery (which includes a
stopword-heavy query).
<!-- BM25:END -->
"""
    from _md import splice_block

    splice_block(os.path.join(REPO, "BENCH", "BASELINE.md"), "BM25", block)
    print(
        {
            "n_docs": n,
            "cand_capped": cand_capped,
            "cand_raw": cand_raw,
            "capped_s": round(capped_s, 1),
            "raw_s": round(raw_s, 1),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
