"""ExactSubstr duplicate-span detection (Lee et al. 2022): window/span
statistics hand-computed on a fixture corpus with cross-doc and
within-doc repeats, scrub surgery, doc dropping, hashed≡unhashed, and
plan shape."""

from __future__ import annotations

from eodal_spark.operators.exact_substr import (
    drop_duplicated_docs,
    duplicate_span_stats,
    scrub_duplicated_spans,
)

N = 3

DOCS = [
    (1, "a b c d e"),                # no duplicated trigram
    (2, "u v p q r s w"),            # shares "p q r s" with doc 3
    (3, "p q r s z1 z2"),
    (4, "m n o m n o m n o"),        # self-repeating
    (5, ""),                         # empty
]


def _stats(spark, **kw):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = duplicate_span_stats(df, n=N, **kw).collect()
    return {r.doc_id: r for r in rows}


def test_span_stats_hand_computed(spark):
    s = _stats(spark)
    assert len(s) == 5
    r = s[1]
    assert (r.n_tokens, r.n_windows, r.n_dup_windows, r.n_dup_spans,
            r.dup_tokens, r.dup_token_milli) == (5, 3, 0, 0, 0, 0)
    r = s[2]  # dup windows at pos 3,4 -> one span covering p q r s
    assert (r.n_tokens, r.n_windows, r.n_dup_windows, r.n_dup_spans,
            r.dup_tokens, r.dup_token_milli) == (7, 5, 2, 1, 4, 571)
    r = s[3]
    assert (r.n_tokens, r.n_windows, r.n_dup_windows, r.n_dup_spans,
            r.dup_tokens, r.dup_token_milli) == (6, 4, 2, 1, 4, 666)
    r = s[4]  # every window duplicated -> one span, full coverage
    assert (r.n_tokens, r.n_windows, r.n_dup_windows, r.n_dup_spans,
            r.dup_tokens, r.dup_token_milli) == (9, 7, 7, 1, 9, 1000)
    r = s[5]
    assert (r.n_tokens, r.n_windows, r.dup_token_milli) == (0, 0, 0)


def test_hashed_equals_unhashed(spark):
    a = _stats(spark, hashed=True)
    b = _stats(spark, hashed=False)
    assert {k: tuple(v) for k, v in a.items()} == {
        k: tuple(v) for k, v in b.items()
    }


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"t{i % 4} t{(i + 1) % 4} t{(i + 2) % 4} t{i % 3} u{i}")
         for i in range(30)],
        ["doc_id", "text"],
    )
    one = {tuple(r) for r in duplicate_span_stats(df.coalesce(1), n=N).collect()}
    many = {tuple(r) for r in duplicate_span_stats(df.repartition(11), n=N).collect()}
    assert one == many


def test_scrub_surgery(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r.text for r in scrub_duplicated_spans(df, n=N).collect()}
    assert got[1] == "a b c d e"      # untouched (already normalized)
    assert got[2] == "u v w"          # p q r s cut
    assert got[3] == "z1 z2"
    assert got[4] == ""               # fully duplicated -> fully cut
    assert got[5] == ""


def test_scrub_preserves_original_case(spark):
    """Lowercasing exists only for window MATCHING; surviving text must
    keep its original bytes (token positions are case-invariant)."""
    df = spark.createDataFrame(
        [(1, "Keep Me p q r s Tail"), (2, "x y p q r s z")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.text for r in scrub_duplicated_spans(df, n=N).collect()}
    assert got[1] == "Keep Me Tail"
    assert got[2] == "x y z"


def test_drop_duplicated_docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    kept = sorted(
        r.doc_id for r in drop_duplicated_docs(df, n=N, max_dup_milli=600).collect()
    )
    assert kept == [1, 2, 5]  # 571 <= 600 < 666, 1000


def test_plan_native_and_broadcast(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = duplicate_span_stats(
        df, n=N, broadcast_hot=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
