"""BPE tokenizer: trained merges and applied pieces verified against a
pure-python reference (greedy fold), overlap semantics of the
replace-chain, early stop, and the zero-shuffle apply plan."""

from __future__ import annotations

from eodal_spark.operators.bpe import END, bpe_pieces, train_bpe

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower widest widest widest"),
    (3, "newest newest newest newest newest newest"),
]


def _ref_train(words: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {tuple(list(w) + [END]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append(pair)
        vocab = {_ref_merge(s, pair): c for s, c in vocab.items()}
    return merges


def _ref_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    for x in syms:
        if out and (out[-1], x) == pair:
            out[-1] = out[-1] + x
        else:
            out.append(x)
    return tuple(out)


def _ref_pieces(text: str, merges) -> list[str]:
    out: list[str] = []
    for w in text.lower().split():
        syms = tuple(list(w) + [END])
        for p in merges:
            syms = _ref_merge(syms, p)
        out.extend(syms)
    return out


def _words_freq():
    freq: dict[str, int] = {}
    for _, t in CORPUS:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    return freq


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = train_bpe(df, n_merges=8, min_pair_count=2)
    want = _ref_train(_words_freq(), 8, 2)
    assert got == want
    assert len(got) == 8  # this corpus supports >= 8 productive merges


def test_pieces_match_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = train_bpe(df, n_merges=6, min_pair_count=2)
    rows = {r.doc_id: r for r in bpe_pieces(df, merges).collect()}
    for doc_id, text in CORPUS:
        want = _ref_pieces(text, merges)
        r = rows[doc_id]
        assert list(r.pieces) == want
        assert r.n_pieces == len(want)
        assert r.n_words == len(text.split())


def test_replace_chain_overlap_semantics(spark):
    # "aaaa" + merge (a,a): greedy left fold -> [aa, aa, </w>];
    # + (aa,aa) -> [aaaa, </w>]  (the replace-resumes-after-match rule)
    df = spark.createDataFrame([(1, "aaaa")], ["doc_id", "text"])
    one = bpe_pieces(df, [("a", "a")]).collect()[0]
    assert list(one.pieces) == ["aa", "aa", END]
    two = bpe_pieces(df, [("a", "a"), ("aa", "aa")]).collect()[0]
    assert list(two.pieces) == ["aaaa", END]
    # "aaa": the dangling a survives, then (aa,a) can pick it up
    df3 = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
    got = bpe_pieces(df3, [("a", "a"), ("aa", "a")]).collect()[0]
    assert list(got.pieces) == ["aaa", END]


def test_train_early_stop(spark):
    # every word unique and 2 chars: all pairs have count 1 < min 2
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    assert train_bpe(df, n_merges=5, min_pair_count=2) == []


def test_apply_plan_is_mapside(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    plan = (
        bpe_pieces(df, [("l", "o"), ("lo", "w")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # zero shuffles: apply is map-side only
