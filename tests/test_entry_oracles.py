"""Local twin of the driver's correctness gate: every queries() entry is
run on Spark and its oracle_sql() on DuckDB at sf0.01; row counts,
column names and values must match exactly (order-insensitive)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import SF_CORRECT

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            # decimals → float64; bytes → hex
            sample = pdf[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (bytes, bytearray)):
                pdf[c] = pdf[c].map(lambda b: b.hex() if b is not None else None)
            else:
                try:
                    pdf[c] = pd.to_numeric(pdf[c])
                except (ValueError, TypeError):
                    pass
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _compare(name: str, got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    got, exp = _normalize(got), _normalize(exp)
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    for c in got.columns:
        a, b = got[c], exp[c]
        # The driver's value hash is dtype-sensitive: a DuckDB HUGEINT sum
        # arriving as float64 (1.0) hashes differently from Spark's int64
        # (1) even when every value is equal.  Catch that class locally.
        ka, kb = a.dtype.kind, b.dtype.kind
        assert ka == kb or {ka, kb} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {ka} vs {kb} — driver hash gate would "
            f"fail even if values match (add a CAST in the oracle SQL)"
        )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            an = a.astype(np.float64).to_numpy()
            bn = b.astype(np.float64).to_numpy()
            both_nan = np.isnan(an) & np.isnan(bn)
            ok = both_nan | (an == bn)
            assert ok.all(), (
                f"{name}.{c}: {int((~ok).sum())} mismatches, "
                f"first: {an[~ok][:3]} vs {bn[~ok][:3]}"
            )
        else:
            eq = (a == b) | (a.isna() & b.isna())
            assert eq.all(), (
                f"{name}.{c}: {int((~eq).sum())} mismatches, first: "
                f"{a[~eq].head(3).tolist()} vs {b[~eq].head(3).tolist()}"
            )


ORACLES = E.oracle_sql()
ALL_QUERIES = E.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = ALL_QUERIES[name](spark, SF_CORRECT).toPandas()
    exp = duck.execute(ORACLES[name]).df()
    _compare(name, got, exp)


def test_every_query_is_oracle_gated():
    # Round 3 closed the last rows-only gaps (minhash/simhash/IVF/SRP):
    # every queries() entry must now carry a DuckDB oracle.
    assert set(ALL_QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    out = E.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert {f.name for f in out.schema.fields} >= {"poly_id", "cnt"}
