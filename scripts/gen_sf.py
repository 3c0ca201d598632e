"""Generate a local scale-factor dataset matching the /root/testdata
shape (TPC-H-ish star schema + documents/embeddings/events), for
benchmarking at scales the driver-provided dirs don't include.

NOT the driver's generator — distributions are extrapolated from the
sf0.1 tables (same schemas, key ranges scaled linearly, same vocab /
categorical mixes), which is what matters for representative timings.
Never used for correctness (oracles run only on the driver dirs).

Usage: python scripts/gen_sf.py 1.0 /root/testdata_local/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]


def gen(sf: float, out_dir: str, seed: int = 43) -> None:
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)

    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    def w(name: str, df: pd.DataFrame) -> None:
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
        print(name, len(df))

    # region / nation are fixed-size
    w("region", pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int64),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    w("nation", pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": np.arange(25, dtype=np.int64) % 5,
    }))
    w("customer", pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.randint(0, 25, n_cust).astype(np.int64),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"],
            n_cust,
        ),
    }))
    w("supplier", pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.randint(0, 25, n_supp).astype(np.int64),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    sizes = ["large", "hot", "small", "cold", "dim"]
    parts_nouns = ["ring", "bolt", "cap", "plate", "tube"]
    w("part", pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{rng.choice(sizes)} {rng.choice(parts_nouns)}"
            for _ in range(n_part)
        ],
        "p_brand": [f"Brand#{i}" for i in rng.randint(1, 26, n_part)],
        "p_type": rng.choice(
            ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM"], n_part
        ),
        "p_size": rng.randint(1, 51, n_part).astype(np.int64),
        "p_retailprice": np.round(900 + np.arange(n_part) * 0.1, 2),
    }))
    base = np.datetime64("1995-01-01")
    w("orders", pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.randint(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": base + rng.randint(0, 2404, n_ord).astype("timedelta64[D]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord,
        ),
    }))
    w("lineitem", pd.DataFrame({
        "l_orderkey": rng.randint(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.randint(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.randint(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.randint(1, 8, n_li).astype(np.int64),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["N", "R", "A"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": base + rng.randint(1, 2500, n_li).astype("timedelta64[D]"),
    }))
    ev_base = np.datetime64("2024-01-01", "us")
    span_us = 30 * 86400 * 1_000_000
    ts = np.sort(rng.randint(0, span_us, n_ev)).astype("timedelta64[us]")
    w("events", pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ev_base + ts,
        "user_id": rng.randint(0, n_users, n_ev).astype(np.int64),
        "event_type": rng.choice(
            ["signup", "purchase", "view", "click", "error"], n_ev
        ),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)],
    }))
    # documents: word salad over the 30-word vocab, 10..100 words,
    # ~5% carry the rare 'dup' token; a sprinkle of exact duplicates
    n_words = rng.randint(10, 101, n_docs)
    texts = []
    for i in range(n_docs):
        ws = [VOCAB[j] for j in rng.randint(0, len(VOCAB), n_words[i])]
        if rng.rand() < 0.05:
            ws[rng.randint(0, len(ws))] = "dup"
        texts.append(" ".join(ws))
    n_dup = max(1, n_docs // 625)  # 8 families at 5000 docs
    for _ in range(n_dup):
        a, b = rng.randint(0, n_docs, 2)
        texts[b] = texts[a]
    w("documents", pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(
            ["en", "zh", "es", "fr", "de"], n_docs,
            p=[0.412, 0.15, 0.148, 0.148, 0.142],
        ),
        "source": [f"src{i}" for i in rng.randint(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))
    labels = rng.randint(0, 10, n_emb)
    centers = rng.randn(10, 64) * 0.5
    emb = centers[labels] + rng.randn(n_emb, 64) * 1.0
    w("embeddings", pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": [row.astype(np.float64) for row in emb],
        "label": labels.astype(np.int64),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/testdata_local/sf{sf}"
    gen(sf, out)
