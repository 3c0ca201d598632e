"""BM25 inverted-index retrieval: integer-exact scoring, stopword
pruning, index shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eodal_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join join"),
            (2, "spark scan"),
            (3, "vector vector vector scan scan"),
        ],
        ["doc_id", "text"],
    )


def _py_bm25(corpus: dict[int, str], qtext: str, k: int = 10):
    """Pure-python twin of the integer formula — the test oracle."""
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    t_total = sum(len(ws) for ws in toks.values())
    df = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    scores = {}
    for term in set(qtext.split()):
        if term not in df:
            continue
        idf = ((2 * (n - df[term]) + 1) * 1_000_000) // (2 * df[term] + 1)
        for d, ws in toks.items():
            tf = ws.count(term)
            if not tf:
                continue
            dl = len(ws)
            num = idf * (44 * t_total * tf)
            den = 20 * t_total * tf + 6 * t_total + 18 * dl * n
            scores[d] = scores.get(d, 0) + num // den
    ranked = sorted(
        ((s, d) for d, s in scores.items() if s >= 1),
        key=lambda x: (-x[0], x[1]),
    )
    return [(d, s, i + 1) for i, (s, d) in enumerate(ranked[:k])]


def test_bm25_matches_hand_formula(spark, tiny):
    corpus = {1: "spark shuffle join join", 2: "spark scan", 3: "vector vector vector scan scan"}
    for q, qtext in [(0, "spark join"), (1, "vector"), (2, "scan scan")]:
        got = [
            (r["doc_id"], r["score_micro"], r["rank"])
            for r in R.bm25_topk(
                tiny,
                spark.createDataFrame([(q, qtext)], ["query_id", "qtext"]),
                max_df_frac=1.0,  # formula test: score every term
            )
            .orderBy("rank")
            .collect()
        ]
        assert got == _py_bm25(corpus, qtext), qtext


def test_bm25_rare_term_outranks_common(spark, tiny):
    """'shuffle' (df=1) must pull doc 1 above the df=2 'scan' docs."""
    q = spark.createDataFrame([(0, "shuffle scan")], ["query_id", "qtext"])
    top = R.bm25_topk(tiny, q, k=1, max_df_frac=1.0).first()
    assert top["doc_id"] == 1


def test_bm25_default_cap_is_on(spark, tiny):
    """The hot-bucket defense defaults ON (max_df_frac=0.5): 'spark'
    and 'scan' (df=2 of 3) are pruned from the index without opting
    in, while df=1 terms still score."""
    q = spark.createDataFrame(
        [(0, "spark"), (1, "shuffle")], ["query_id", "qtext"]
    )
    rows = R.bm25_topk(tiny, q).collect()
    assert {r["query_id"] for r in rows} == {1}  # spark pruned by default


def test_bm25_micro_scale_envelope():
    """Micro scale steps down in powers of ten exactly when the int64
    envelope demands it, and raises when no scale fits."""
    # small corpus: full 1e6 scale
    assert R.bm25_micro_scale(3, 11, 5) == 1_000_000
    # big corpus: (2n+1)*1e6*44*t*dl_max crosses 2^62 → stepped down
    big = R.bm25_micro_scale(10**4, 10**7, 10)
    assert 1 <= big < 1_000_000
    assert (2 * 10**4 + 1) * big * 44 * 10**7 * 10 < 2**62
    assert (2 * 10**4 + 1) * (big * 10) * 44 * 10**7 * 10 >= 2**62
    # beyond rescue: 44*T*tf alone exceeds int64
    import pytest as _pt

    with _pt.raises(ValueError, match="envelope"):
        R.bm25_micro_scale(10**6, 10**18, 10)
    # no idf headroom even at micro=1
    with _pt.raises(ValueError, match="envelope"):
        R.bm25_micro_scale(10**9, 10**13, 10**4)


def test_bm25_no_match_returns_empty(spark, tiny):
    q = spark.createDataFrame([(0, "zzz")], ["query_id", "qtext"])
    assert R.bm25_topk(tiny, q).count() == 0


def test_bm25_stopword_cap_prunes_term(spark, tiny):
    """max_df_frac below 2/3 drops 'spark' and 'scan' (df=2 of 3) from
    the index: a spark-only query then matches nothing — the hot
    posting lists are gone at the data level."""
    q = spark.createDataFrame([(0, "spark")], ["query_id", "qtext"])
    assert R.bm25_topk(tiny, q, max_df_frac=0.5).count() == 0
    assert R.bm25_topk(tiny, q, max_df_frac=1.0).count() == 2


def test_bm25_empty_corpus_raises(spark):
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    q = spark.createDataFrame([(0, "x")], ["query_id", "qtext"])
    with pytest.raises(ValueError, match="empty corpus"):
        R.bm25_topk(empty, q)


def test_postings_shape(spark, tiny):
    p = R.build_postings(tiny).collect()
    assert {(r["term"], r["doc_id"], r["tf"], r["dl"]) for r in p} == {
        ("spark", 1, 1, 4),
        ("shuffle", 1, 1, 4),
        ("join", 1, 2, 4),
        ("spark", 2, 1, 2),
        ("scan", 2, 1, 2),
        ("vector", 3, 3, 5),
        ("scan", 3, 2, 5),
    }


def test_bm25_plan_is_native(spark, tiny):
    """No Python evaluation anywhere — tokenize/score/rank are all
    Catalyst (the no-per-row-Python hard rule)."""
    q = spark.createDataFrame([(0, "spark")], ["query_id", "qtext"])
    plan = R.bm25_topk(tiny, q)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
