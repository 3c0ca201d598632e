"""Dedup suite: exact, Jaccard, MinHash LSH, SimHash — with planted
near-duplicates as ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eodal_spark.operators import dedup as D


@pytest.fixture(scope="module")
def planted(spark):
    """20 base docs; ids 100+i are exact dups of i; 200+i are near-dups
    (one word changed); 300+i are unrelated."""
    import random

    rng = random.Random(7)
    words = [f"w{j}" for j in range(500)]
    rows = []
    for i in range(20):
        base = " ".join(rng.choice(words) for _ in range(80))
        rows.append((i, base))
        rows.append((100 + i, base))
        toks = base.split()
        toks[40] = "CHANGED"
        rows.append((200 + i, " ".join(toks)))
        rows.append((300 + i, " ".join(rng.choice(words) for _ in range(80))))
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_dedup_keeps_min_id(planted):
    out = D.exact_dedup(planted).cache()
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    for i in range(20):
        assert i in ids and (100 + i) not in ids
        assert (200 + i) in ids and (300 + i) in ids
    # determinism under repartition
    out2 = D.exact_dedup(planted.repartition(17))
    assert out2.select("doc_id").exceptAll(out.select("doc_id")).count() == 0


def test_jaccard_pairs_find_near_dups(planted):
    pairs = D.jaccard_pairs(planted, threshold_milli=700).cache()
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(20):
        assert (i, 100 + i) in got  # exact dup: jaccard 1
        assert (i, 200 + i) in got  # near dup above threshold
    # unrelated docs never pair
    assert not any(a >= 300 or b >= 300 for a, b in got)


def test_minhash_lsh_recalls_near_dups(planted):
    verified = D.minhash_dedup(planted, threshold_milli=700).cache()
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    exact_hits = sum((i, 100 + i) in got for i in range(20))
    near_hits = sum((i, 200 + i) in got for i in range(20))
    assert exact_hits == 20  # identical docs always collide
    assert near_hits >= 17  # high recall on near-dups (probabilistic)
    assert not any(a >= 300 or b >= 300 for a, b in got)  # verified: no FPs


def test_simhash_near_pairs(planted):
    sigs = D.simhash_signatures(planted).cache()
    pairs = D.simhash_near_pairs(sigs, max_hamming=6).cache()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    exact_hits = sum((i, 100 + i) in got for i in range(20))
    assert exact_hits == 20  # identical text → identical simhash
    # reported hamming distances are correct vs the raw signatures
    raw = {r["id"]: r["simhash"] for r in sigs.collect()}
    for (a, b), h in got.items():
        assert bin(raw[a] ^ raw[b]).count("1") == h <= 6
    # identical docs have identical signatures (hamming 0)
    assert all(got[(i, 100 + i)] == 0 for i in range(20))


def test_minhash_signature_determinism(planted):
    s1 = D.minhash_signatures(planted).orderBy("id").collect()
    s2 = D.minhash_signatures(planted.repartition(13)).orderBy("id").collect()
    for a, b in zip(s1, s2):
        assert a["id"] == b["id"] and a["sig"] == b["sig"]


def test_simhash_signature_determinism(planted):
    s1 = D.simhash_signatures(planted).orderBy("id").collect()
    s2 = D.simhash_signatures(planted.repartition(13)).orderBy("id").collect()
    for a, b in zip(s1, s2):
        assert a["id"] == b["id"] and a["simhash"] == b["simhash"]


def test_simhash_banding_guarantees_radius(spark):
    """Pigeonhole guarantee: with max_hamming+1 blocks, EVERY pair
    within the requested radius is recalled — including pairs > 3 bits
    apart, which the old fixed 4x16 banding only found by luck."""
    from pyspark.sql import functions as F

    base = 0x0123456789ABCDEF
    rows = [(0, base)]
    # flip k low bits spread across the word for k = 1..10
    bitpos = [0, 7, 13, 22, 29, 35, 41, 48, 54, 60]
    for k in range(1, 11):
        v = base
        for p in bitpos[:k]:
            v ^= 1 << p
        rows.append((k, v))
    sigs = spark.createDataFrame(rows, "id long, simhash long")
    pairs = D.simhash_near_pairs(sigs, max_hamming=10).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for k in range(1, 11):
        assert got.get((0, k)) == k, f"pair at hamming {k} missed"


def test_connected_components_chain_and_cycle(spark):
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        # chain 1-2-3-4, cycle 10-11-12-10, isolated edge 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        ["id_a", "id_b"],
    )
    comp = {r.id: r.comp for r in D.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_merge_via_high_id_bridge(spark):
    # two low-id stars joined only through a high-id node: the min label
    # must cross the bridge in both directions
    pairs = spark.createDataFrame(
        [(1, 100), (2, 100), (1, 3), (2, 4)], ["id_a", "id_b"]
    )
    comp = {r.id: r.comp for r in D.connected_components(pairs).collect()}
    assert set(comp.values()) == {1}


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, max_iters=2)


def test_dup_groups_labels_singletons(spark):
    from pyspark.sql import functions as F

    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(0, 5), (5, 6)], ["id_a", "id_b"])
    got = {r.doc_id: r.group_id for r in D.dup_groups(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 0, 6: 0, 7: 7}


def test_connected_components_agg_form_no_window(spark):
    """Skew guard: one propagation round must be agg-shaped (map-side
    combinable min), never a Window over the component.  Inspect the
    ROUND pre-checkpoint — the final result's plan is an RDD scan that
    would vacuously pass."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    edges = pairs.selectExpr("id_a AS u", "id_b AS v").union(
        pairs.selectExpr("id_b AS u", "id_a AS v")
    )
    labels = edges.selectExpr("u AS id").distinct().selectExpr(
        "id", "id AS comp"
    )
    out = D._min_label_round(edges, labels)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "Window" not in plan


import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n_nodes=st.integers(min_value=2, max_value=30),
    n_edges=st.integers(min_value=0, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_connected_components_matches_union_find(spark, n_nodes, n_edges, seed):
    """Property: distributed min-label propagation equals a classic
    union-find over the same random graph."""
    rng = np.random.RandomState(seed)
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]
    if not edges:
        return

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    expected = {}
    for node in {v for e in edges for v in e}:
        root = find(node)
        expected[node] = min(
            m for m in {v for e in edges for v in e} if find(m) == root
        )

    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r.id: r.comp
        for r in D.connected_components(pairs, max_iters=n_nodes + 2).collect()
    }
    assert got == expected


def test_star_contraction_path_graph_logarithmic_rounds(spark):
    """A 10⁴-node path has diameter 10⁴: min-label propagation would
    need 10⁴ rounds, the two-phase large-star/small-star contraction
    must finish in O(log n) — max_iters=25 ≫ log₂(10⁴)≈13.3 but ≪ the
    diameter, so success here IS the round bound."""
    from pyspark.sql import functions as F

    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = D.connected_components(pairs, max_iters=25, method="star")
    rows = out.collect()
    assert len(rows) == n
    assert all(r.comp == 0 for r in rows)


@settings(max_examples=15, deadline=None)
@given(
    n_nodes=st.integers(min_value=2, max_value=30),
    n_edges=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_star_contraction_matches_propagation(spark, n_nodes, n_edges, seed):
    """Property: the star-contraction labeling equals min-label
    propagation on the same random graph."""
    rng = np.random.RandomState(seed)
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    prop = {
        r.id: r.comp
        for r in D.connected_components(pairs, max_iters=n_nodes + 2).collect()
    }
    star = {
        r.id: r.comp
        for r in D.connected_components(
            pairs, max_iters=n_nodes + 2, method="star"
        ).collect()
    }
    assert star == prop


def test_star_contraction_keeps_self_pair_nodes(spark):
    """A node appearing only in self-pairs must be labeled with itself
    by BOTH methods (the star path filters u != v edges, so these nodes
    need explicit reinstatement)."""
    pairs = spark.createDataFrame([(5, 5), (1, 2)], ["id_a", "id_b"])
    prop = {
        (r.id, r.comp)
        for r in D.connected_components(pairs, max_iters=5).collect()
    }
    star = {
        (r.id, r.comp)
        for r in D.connected_components(
            pairs, max_iters=5, method="star"
        ).collect()
    }
    assert star == prop == {(5, 5), (1, 1), (2, 1)}


def test_minhash_collapse_matches_uncollapsed(planted):
    """The exact-text pre-collapse must be output-invisible in "all"
    mode: the signature/estimate/verify stack is a pure function of the
    text, so the fanned-out pair set (ids AND inter/uni) is identical
    to the un-collapsed pipeline's."""
    a = D.minhash_dedup(
        planted, threshold_milli=700, collapse_exact=True
    ).collect()
    b = D.minhash_dedup(
        planted, threshold_milli=700, collapse_exact=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_simhash_collapse_matches_uncollapsed(planted):
    sigs = D.simhash_signatures(planted).cache()
    a = D.simhash_near_pairs(
        sigs, max_hamming=6, collapse_identical=True
    ).collect()
    b = D.simhash_near_pairs(
        sigs, max_hamming=6, collapse_identical=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_hot_bucket_exact_collapse_is_linear(spark):
    """10⁵ byte-identical docs: without the pre-collapse the LSH
    self-join would emit ~bands·n²/2 ≈ 8·10¹⁰ candidate pairs (a
    scale-killer); with it the whole LSH stack sees ONE representative
    (zero rep-level candidates) and expand="star" returns exactly the
    n-1 spanning pairs.  Completing at all — in seconds — IS the
    property being tested."""
    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page body over and over " * 4).alias(
            "text"
        ),
    )
    out = D.minhash_dedup(docs, expand="star").cache()
    assert out.count() == n - 1
    row = out.agg(
        F.min("id_a"), F.max("id_a"), F.countDistinct("id_b")
    ).first()
    assert row[0] == 0 and row[1] == 0 and row[2] == n - 1  # star on rep 0
    # the representative level generates ZERO candidate pairs
    one = docs.filter("doc_id = 0").selectExpr("doc_id AS id", "text AS t")
    sigs = D.minhash_signatures(one, "t", "id")
    assert D.minhash_lsh_candidates(sigs).count() == 0
    out.unpersist()


def test_hot_bucket_simhash_collapse_is_linear(spark):
    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical template page " * 8).alias("text"),
    )
    sigs = D.simhash_signatures(docs)
    out = D.simhash_near_pairs(sigs, expand="star")
    assert out.count() == n - 1
    assert out.filter("hamming != 0").count() == 0


def test_star_expansion_same_components_as_all(planted):
    """expand="star" must yield identical dup_groups to expand="all"
    (spanning pairs preserve connectivity)."""
    all_pairs = D.minhash_dedup(planted, threshold_milli=700, expand="all")
    star_pairs = D.minhash_dedup(planted, threshold_milli=700, expand="star")
    g_all = {
        (r.doc_id, r.group_id)
        for r in D.dup_groups(planted, all_pairs).collect()
    }
    g_star = {
        (r.doc_id, r.group_id)
        for r in D.dup_groups(planted, star_pairs).collect()
    }
    assert g_all == g_star


def test_bucket_cap_drops_oversized_buckets(spark):
    """bucket_cap: a 10-member signature group exceeds cap=5 → its
    buckets are dropped; a 2-member group survives."""
    sig_a = [1] * 64
    sig_b = [2] * 64
    rows = [(i, sig_a) for i in range(10)] + [(10, sig_b), (11, sig_b)]
    sigs = spark.createDataFrame(rows, "id long, sig array<long>")
    capped = D.minhash_lsh_candidates(sigs, bucket_cap=5)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(10, 11)}
    uncapped = D.minhash_lsh_candidates(sigs)
    assert uncapped.count() == 45 + 1


def test_bucket_pairs_est_matches_historical_plan(spark):
    """The fused bucket+estimate stage (r7 optimization) must emit
    exactly the pairs of the historical plan: LSH candidate self-join →
    distinct → signature re-join → zip_with agreement filter.  The
    corpus plants a >64-member near-identical template family so the
    dense (factorized outer-product) big-bucket path runs, not just the
    size-class small-bucket path."""
    import random

    rng = random.Random(11)
    words = [f"t{j}" for j in range(60)]
    rows = []
    # 90 variations of one template -> giant LSH buckets (dense path)
    base = " ".join(rng.choice(words) for _ in range(60))
    toks = base.split()
    for i in range(90):
        v = list(toks)
        v[i % 60] = f"X{i}"
        rows.append((i, " ".join(v)))
    # unrelated tail (small buckets / no collisions)
    for i in range(90, 140):
        rows.append((i, " ".join(rng.choice(words) for _ in range(60))))
    docs = spark.createDataFrame(rows, ["id", "t"]).cache()

    num_perm, bands, rpb, tm = 64, 16, 4, 500
    est_min = max(0, tm - 150) * num_perm
    sigs = D.minhash_signatures(docs, "t", "id", num_perm, 5).cache()

    fused = D._bucket_pairs_est(
        D._banded_sigs(sigs, bands, rpb), num_perm, est_min
    )
    cand = D.minhash_lsh_candidates(sigs, bands, rpb)
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("_sb"))
    historical = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "_est",
            F.size(
                F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v)
            ),
        )
        .filter(F.col("_est") * 1000 >= F.lit(est_min))
        .select("id_a", "id_b")
    )
    got = {(r["id_a"], r["id_b"]) for r in fused.collect()}
    want = {(r["id_a"], r["id_b"]) for r in historical.collect()}
    assert got == want and len(want) > 100
