"""BM25 keyword retrieval over an inverted index — the search tier a
training-data pipeline needs for targeted curation (pull every page
about X), decontamination audits, and relevance-weighted sampling.

Spark shape (Robertson & Walker BM25, the Okapi formulation):

* the inverted index IS a relation: ``postings(term, doc_id, tf, dl)``
  from one explode → groupBy pass (map-side combined); at 10^12 docs
  it lives bucketed by ``term`` in the catalog and every query is a
  broadcast-join probe of a few posting lists, never a corpus scan;
* stopword skew is handled at the DATA level: a term appearing in more
  than ``max_df_frac`` of docs is dropped from the index (its posting
  list is the hot bucket AND its idf ≈ 0 — pruning it removes the
  skew and barely moves the scores; same reason Lucene offers stopword
  filters);
* scoring is INTEGER-EXACT: with k1 = 6/5 and b = 3/4 the per-term
  contribution multiplies out to pure bigint arithmetic (micro-scaled
  idf, see :func:`bm25_topk`), so rankings are reproducible bit-for-bit
  across engines — no float summation order anywhere.

No per-row Python: tokenization is native split/filter, scoring is
Catalyst integer expressions, top-k is the shared rank pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eodal_spark.operators.text import _words


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The inverted index as a relation: one row per (term, doc) with
    the term frequency and the doc's token length attached —
    ``(term, doc_id, tf, dl)``.  One explode + one groupBy (partial
    aggregation map-side); ``dl`` rides along via ``first`` so no
    second pass over the text is needed."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _words(F.col(text_col)).alias("ws"),
    ).select(
        "doc_id",
        F.size("ws").alias("dl"),
        F.explode("ws").alias("term"),
    )
    return toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """Document frequency per term — ``(term, df)``.  Postings are
    distinct on (term, doc), so df is a plain count."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))


def bm25_micro_scale(n: int, t: int, dl_max: int) -> int:
    """The idf micro-scale the corpus envelope admits — the largest
    power-of-ten factor ≤ 10^6 keeping every per-term product inside
    int64 (the binding product is ``idf_micro * 44*T*tf`` with
    ``idf_micro ≤ (2N+1)·micro`` and ``tf ≤ dl_max``).  Derived at
    runtime from the collected corpus scalars instead of trusting a
    docstring bound; raises when even micro = 1 cannot fit — at that
    point the scoring needs a corpus split or a 128-bit engine, and a
    silent wraparound (ANSI off) or a runtime ANSI failure mid-query
    are both worse than failing here with the numbers in hand.

    Power-of-ten steps keep the scale a round, explainable constant
    (10^6 except on astronomically large corpora) and make the oracle
    twin's arithmetic trivially identical."""
    term2_max = 44 * t * dl_max
    denom_max = 20 * t * dl_max + 6 * t + 18 * dl_max * n
    if term2_max >= 2**63 or denom_max >= 2**63:
        raise ValueError(
            f"BM25 integer envelope exceeded: corpus N={n}, T={t}, "
            f"max dl={dl_max} puts 44*T*tf at {term2_max} "
            f"(denominator {denom_max}) — beyond int64 even unscaled. "
            "Split the corpus or score per-shard and merge."
        )
    micro = 10**6
    while micro > 1 and (2 * n + 1) * micro * term2_max >= 2**62:
        micro //= 10
    if (2 * n + 1) * micro * term2_max >= 2**62:
        raise ValueError(
            f"BM25 integer envelope exceeded: (2N+1)*44*T*dl_max = "
            f"{(2 * n + 1) * term2_max} leaves no idf headroom in "
            "int64. Split the corpus or score per-shard and merge."
        )
    return micro


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
    min_score: int = 1,
) -> DataFrame:
    """Top-``k`` docs per query by integer-exact BM25
    (k1 = 6/5, b = 3/4).  ``queries`` is ``(query_id, qtext)``.

    Per-term contribution, multiplied through by ``20·T`` (T = total
    corpus tokens, N = doc count, dl = doc tokens, so avgdl = T/N and
    every denominator is integral)::

        idf_micro * 44*T*tf  div  (20*T*tf + 6*T + 18*dl*N)

    summed per (query, doc).  ``idf_micro`` uses the largest
    power-of-ten scale the corpus admits (:func:`bm25_micro_scale` —
    10^6 until ~10^10 corpus tokens, then stepped down), derived from
    the SAME one-pass corpus scalars, so the arithmetic provably fits
    int64 instead of relying on a docstring bound; an envelope no
    scale can satisfy raises with the numbers in hand.  Docs scoring
    0 on every query term (possible when idf_micro floors to 0 for
    corpus-wide terms) are dropped via ``min_score`` so ties among
    zero-relevance docs can't enter the ranking.

    ``max_df_frac`` (default 0.5, ON) is the hot-bucket defense: a
    term in more than half the corpus is a stopword whose posting
    list would dominate the term join (at 10^12 docs, "the" joins a
    list covering the whole corpus) while contributing near-zero idf —
    it is dropped from the index, the same trade Lucene's stopword
    filters make.  Pass 1.0 to disable.

    Scale shape: corpus stats (N, T, max dl) are ONE three-scalar
    aggregate; query terms are exploded and joined against the
    postings relation on ``term`` — with postings bucketed by term
    this is a co-located probe of |query terms| lists; the final sum
    + rank shuffles only candidate (query, doc) pairs."""
    postings = build_postings(docs, id_col, text_col)
    stats = term_stats(postings)
    g = docs.select(
        F.count("*").alias("n"),
        F.sum(F.size(_words(F.col(text_col)))).alias("t"),
        F.max(F.size(_words(F.col(text_col)))).alias("dl_max"),
    ).first()
    n = int(g["n"])
    if n == 0:
        raise ValueError("empty corpus — no documents to index")
    t = int(g["t"])
    micro = bm25_micro_scale(n, t, int(g["dl_max"]))
    if max_df_frac < 1.0:
        # stopword pruning = hot-bucket defense: the df cap removes
        # exactly the posting lists that would dominate the term join
        stats = stats.filter(F.col("df") <= int(max_df_frac * n))
    qt = queries.select(
        "query_id", F.explode(_words(F.col("qtext"))).alias("term")
    ).dropDuplicates(["query_id", "term"])
    # micro-scaled integer idf surrogate: the Robertson ratio
    # (N - df + 0.5)/(df + 0.5) as exact bigint (2(N-df)+1)·micro DIV
    # (2df+1) — monotonic in df, same ranking family, zero float ops
    # (a log idf would hit libm-vs-Java last-ulp flips at DIV floors).
    # SQL DIV is the bigint floor division both engines share.
    nl = f"CAST({n} AS BIGINT)"
    tl = f"CAST({t} AS BIGINT)"
    contrib = F.expr(
        f"((((2 * ({nl} - df) + 1) * CAST({micro} AS BIGINT)) "
        f"DIV (2 * df + 1)) * (44 * {tl} * tf)) "
        f"DIV (20 * {tl} * tf + 6 * {tl} + 18 * CAST(dl AS BIGINT) * {nl})"
    )
    cand = (
        qt.join(stats, "term")
        .join(postings, "term")
        .withColumn("contrib_micro", contrib)
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_micro").alias("score_micro")
    ).filter(F.col("score_micro") >= min_score)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_micro", "rank")
    )
