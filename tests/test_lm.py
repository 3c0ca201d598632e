"""Bigram LM perplexity scoring (CCNet §4.3 quality tier): model
counts hand-checked on a tiny corpus, perplexity verified against a
pure-Python reference, smoothing/ordering semantics, filter behavior,
and the no-per-row-Python plan rule."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from eodal_spark.operators.lm import (
    doc_bigrams,
    perplexity_filter,
    score_bigram_lm,
    train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_doc_bigrams_tokenization(spark):
    df = _docs(spark, [(1, "  The cat  sat "), (2, "solo"), (3, "")])
    got = sorted(
        (r.doc_id, r.w1, r.w2) for r in doc_bigrams(df).collect()
    )
    # lowercased, whitespace-collapsed; <=1-token docs yield nothing
    assert got == [(1, "cat", "sat"), (1, "the", "cat")]


def test_train_counts_and_vocab(spark):
    # ref_milli=1000 → every doc is in the slice
    df = _docs(spark, [(1, "a b a b c"), (2, "a b")])
    m = train_bigram_lm(df, ref_milli=1000)
    bg = {(r.w1, r.w2): r.c2 for r in m.bigrams.collect()}
    assert bg == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    ctx = {r.w1: r.c1 for r in m.contexts.collect()}
    assert ctx == {"a": 3, "b": 2}
    assert m.vocab == 3  # {a, b, c}


def test_score_integers_and_ppl_vs_python(spark):
    train = _docs(spark, [(1, "a b a b c"), (2, "a b")])
    m = train_bigram_lm(train, ref_milli=1000)
    score_in = _docs(spark, [(10, "a b c"), (11, "z z a")])
    rows = {r.doc_id: r for r in score_bigram_lm(score_in, m).collect()}

    # doc 10: bigrams (a,b) c2=3 c1=3 and (b,c) c2=1 c1=2
    r = rows[10]
    assert (r.n_bigrams, r.n_seen, r.n_ctx, r.sum_c2, r.sum_c1) == (
        2, 2, 2, 4, 5,
    )
    # doc 11: (z,z) unseen+no ctx; (z,a) unseen+no ctx
    r = rows[11]
    assert (r.n_bigrams, r.n_seen, r.n_ctx, r.sum_c2, r.sum_c1) == (
        2, 0, 0, 0, 0,
    )

    # perplexity against a pure-Python reference, same quantization
    def ref_ppl(pairs):
        micro = sum(
            math.floor(1e6 * math.log((c2 + 1) / (c1 + m.vocab)))
            for c2, c1 in pairs
        )
        return math.exp(-(micro / 1e6) / len(pairs)), micro

    want10, micro10 = ref_ppl([(3, 3), (1, 2)])
    want11, micro11 = ref_ppl([(0, 0), (0, 0)])
    # floor-of-log may differ by 1 ulp between JVM and CPython libm
    assert abs(rows[10].lp_micro_sum - micro10) <= 2
    assert abs(rows[11].lp_micro_sum - micro11) <= 2
    assert math.isclose(rows[10].ppl, want10, rel_tol=1e-5)
    assert math.isclose(rows[11].ppl, want11, rel_tol=1e-5)
    # fluent text scores lower perplexity than unseen junk
    assert rows[10].ppl < rows[11].ppl


def test_score_is_partitioning_invariant(spark):
    train = _docs(spark, [(i, f"w{i % 7} w{(i + 1) % 7} w{i % 5}") for i in range(40)])
    m = train_bigram_lm(train, ref_milli=1000)
    one = {
        (r.doc_id, r.n_bigrams, r.n_seen, r.sum_c2, r.sum_c1, r.lp_micro_sum)
        for r in score_bigram_lm(train.coalesce(1), m).collect()
    }
    many = {
        (r.doc_id, r.n_bigrams, r.n_seen, r.sum_c2, r.sum_c1, r.lp_micro_sum)
        for r in score_bigram_lm(train.repartition(13), m).collect()
    }
    assert one == many  # quantize-then-sum: order-independent


def test_perplexity_filter_and_unscorable_drop(spark):
    train = _docs(spark, [(1, "a b a b a b"), (2, "a b a b")])
    m = train_bigram_lm(train, ref_milli=1000)
    docs = _docs(spark, [(10, "a b a b"), (11, "q r s t"), (12, "one")])
    scored = {r.doc_id: r.ppl for r in score_bigram_lm(docs, m).collect()}
    cut = (scored[10] + scored[11]) / 2
    kept = [r.doc_id for r in perplexity_filter(docs, m, cut).collect()]
    assert kept == [10]  # 11 above the cut, 12 unscorable → dropped


def test_plan_native_and_broadcast(spark):
    train = _docs(spark, [(1, "a b c d e"), (2, "b c d")])
    m = train_bigram_lm(train, ref_milli=1000)
    plan = score_bigram_lm(
        train, m, broadcast_model=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
