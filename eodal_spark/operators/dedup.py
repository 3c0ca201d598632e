"""Deduplication suite for web-scale training-data pipelines.

Exact dedup, character-shingle Jaccard, MinHash+LSH, SimHash, and
embedding near-dup — each expressed as DataFrame algebra so the physical
plan is shuffles over compact keys, never pairwise row comparisons over
the full corpus (except the explicitly-bounded exact-Jaccard verifier).

Scale notes (10^12 docs):
* exact: one shuffle on a 256-bit content hash (tiny keys);
* MinHash LSH: shingles → signatures is map-side only; candidate
  generation shuffles (band_hash) pairs within small buckets;
* SimHash: map-side signature, self-join on rotated prefix buckets;
* all tie-breaks are total orders (min doc_id) ⇒ deterministic
  survivors under any parallelism (same guarantee as mosaic_dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per exact text content (sha256 groupBy).
    Returns the surviving rows.

    Aggregation form, NOT a window: ``min_by(struct(row), id)`` combines
    map-side, so 10^8 copies of one boilerplate page reduce to one
    candidate per map partition before the shuffle — a row_number window
    would funnel the whole duplicate group into a single task (window
    partitions cannot be split by AQE)."""
    cols = df.columns
    h = F.sha2(F.col(text_col), 256).alias("_h")
    win = (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_w"))
    )
    return win.select(*[F.col(f"_w.{c}").alias(c) for c in cols])


# ---------------------------------------------------------------------------
# Character-shingle Jaccard (exact near-dup ground truth)
# ---------------------------------------------------------------------------

def shingles(text: Column, w: int = 5) -> Column:
    """Distinct character w-shingles — native sequence/transform."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (w - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(text, i, w)))


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    threshold_milli: int = 800,
) -> DataFrame:
    """All document pairs with shingle-Jaccard >= threshold/1000.

    Inverted-index join: explode shingles, self-join on shingle, count
    intersections, then |A∪B| = |A|+|B|-|A∩B|.  The threshold test is
    integer arithmetic (inter*1000 >= t*union) — oracle-exact.
    Intended for verification corpora / within-bucket refinement, not
    the full 10^12 corpus (that's what MinHash LSH is for)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), w)).alias("s")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    out = (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("uni", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .filter(F.col("inter") * 1000 >= F.lit(threshold_milli) * F.col("uni"))
    )
    return out.select("id_a", "id_b", "inter", "uni")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _spread_for_udf(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition a small-file input up to the session's default
    parallelism before an expensive per-row pandas UDF.

    A compact parquet table (50k docs ≈ 15 MB) scans as 1-2 input
    splits, so a signature UDF downstream of it runs on 1-2 cores no
    matter how many the cluster has — measured 2/32 cores busy on the
    sf1.0 documents table (guide §2: partitioning must come from the
    work, not the file layout).  Hash-repartitioning on the id is
    deterministic (safe under task retry, unlike round-robin) and a
    no-op decision at scale: inputs with >= defaultParallelism
    partitions are returned unchanged, so a 100 TB corpus never pays
    an extra shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key_col))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    w: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — MinHash over character shingles.

    Arrow-batched pandas UDF; per document the shingle hashing is a
    numpy sliding-window polynomial hash (zero per-byte Python) and the
    permutation mins are one (num_perm × shingles) matrix op.
    Map-side only — no shuffle (beyond the small-input spread,
    :func:`_spread_for_udf`)."""
    a, b = _minhash_params(num_perm, seed)
    a_u = a[:, None].astype(np.uint64)
    b_u = b[:, None].astype(np.uint64)
    # polynomial rolling-hash weights (mod 2^64 wraparound)
    base = np.uint64(1099511628211)
    weights = np.empty(w, dtype=np.uint64)
    weights[0] = 1
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash's modulus
        for i in range(1, w):
            weights[i] = weights[i - 1] * base

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            if len(raw) < w:
                raw = raw + b"\x00" * (w - len(raw))
            wins = sliding_window_view(np.frombuffer(raw, dtype=np.uint8), w)
            hv = np.unique(
                (wins.astype(np.uint64) * weights[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
            ) & np.uint64(0x7FFFFFFFFFFFFFFF)
            mins = ((a_u * hv[None, :] + b_u) % np.uint64(_MERSENNE)).min(axis=1)
            out.append(mins.astype(np.int64))
        return pd.Series(out)

    df = _spread_for_udf(df, id_col)
    return df.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("sig"))


# polynomial token-hash parameters: FNV prime as the base (odd → has a
# modular inverse mod 2^64, enabling the vectorized prefix trick below)
_POLY_BASE = np.uint64(1099511628211)
_POLY_INV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _token_hashes(arr: np.ndarray) -> np.ndarray:
    """Polynomial hashes (mod 2^64) of the ASCII-whitespace-separated
    tokens of one UTF-8 byte array — **fully vectorized**, zero
    per-token Python.

    Uses the prefix-product identity: with pw[k] = base^k and
    S[k] = Σ_{j<k} byte_j·base^{-j} (both cumulative numpy ops under
    uint64 wraparound), the hash of bytes [a, b) is
    ``pw[b-1] · (S[b] - S[a]) = Σ byte_j · base^{b-1-j}`` — one gather
    per token instead of a Python loop per token."""
    is_tok = ~((arr == 32) | ((arr >= 9) & (arr <= 13)))
    if not is_tok.any():
        return np.empty(0, dtype=np.uint64)
    # NOTE: raw polynomial hashes of short tokens are tiny (1-byte token
    # → value < 2^8), which would zero the high simhash bit votes; the
    # splitmix64 finalizer below (_mix64) spreads them over all 64 bits.
    d = np.diff(is_tok.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0] + 1
    if is_tok[0]:
        starts = np.concatenate(([0], starts))
    if is_tok[-1]:
        ends = np.concatenate((ends, [len(arr)]))
    n = len(arr)
    with np.errstate(over="ignore"):
        pw = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n - 1, _POLY_BASE, dtype=np.uint64)))
        )
        ivp = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n - 1, _POLY_INV, dtype=np.uint64)))
        )
        s = np.concatenate(
            ([np.uint64(0)], np.cumsum(arr.astype(np.uint64) * ivp))
        )
        return _mix64(pw[ends - 1] * (s[ends] - s[starts]))


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized): bijective 64-bit avalanche so
    every output bit depends on every input bit — without it, short
    tokens leave the high bits all-zero and bias simhash votes."""
    with np.errstate(over="ignore"):
        h = h.astype(np.uint64)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        return h


def _cap_buckets(banded: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Drop LSH buckets holding more than ``cap`` members before the
    candidate self-join: a bucket of n ids emits n(n-1)/2 pairs, so one
    adversarial bucket (template/boilerplate families that survive the
    exact-text pre-collapse) can go quadratic.  Standard LSH practice
    (datasketch / Spark ML both bound bucket fan-out); recall loss is
    confined to pairs whose EVERY shared band is oversized — near-dups
    collide in many independent bands.  One extra shuffle on the same
    bucket key the join was about to shuffle on anyway."""
    counts = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    return banded.join(
        counts.filter(F.col("_n") > cap).select(*keys), keys, "left_anti"
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Banding: hash each band of the signature, self-join on
    (band_idx, band_hash) buckets → candidate pairs (id_a < id_b).
    Shuffle key is the band hash — small and well-distributed.
    ``bucket_cap`` drops oversized buckets (see :func:`_cap_buckets`);
    pair it with the exact-text pre-collapse in :func:`minhash_dedup`,
    which removes the *guaranteed* hot buckets (identical docs collide
    in every band) without any recall loss."""
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "bh"),
    )
    if bucket_cap is not None:
        banded = _cap_buckets(banded, ["band", "bh"], bucket_cap)
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _banded_sigs(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, sig, band, bh) — one row per (document, band) with the
    band's bucket hash; the full signature rides along for the fused
    estimate (see :func:`_bucket_pairs_est`)."""
    return sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(
                    F.slice("sig", i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bh"),
    )


def _bucket_pairs_est(
    banded: DataFrame, num_perm: int, est_min: int, dedup: bool = True
) -> DataFrame:
    """LSH buckets → distinct candidate pairs that ALSO pass the
    signature-agreement estimate, in ONE stage.

    Replaces the candidate self-join + distinct + two signature
    re-joins + zip_with filter chain.  That plan shuffled every raw
    bucket collision three times (measured 47.1M collision pairs on
    the sf1.0 corpus for 7.9M estimate survivors and 2.5k true pairs)
    and its hottest bucket (4.7k members ⇒ 11.2M pairs) was emitted
    and estimated by a single join task — the 199/200-straggler shape
    of guide §2.5, unsplittable because the skew is join-OUTPUT
    explosion, which AQE's skew handling cannot touch.

    Here each bucket is processed as one numpy block: pairwise
    signature match-counts via ``num_perm`` vectorized
    equality-outer-products (uint8 accumulate, row-chunked so memory
    is O(chunk × bucket)), and only pairs with
    ``matches * 1000 >= est_min`` are ever materialized — the 47M
    collision pairs become array scans inside the workers and the
    shuffle carries just the 16-byte survivors (guide §2.3 "shuffle
    keys and metadata, decide before you move").  The estimate is a
    pure function of the two signatures, so filtering before the
    pair-level distinct is output-identical to filtering after.

    The hot bucket's block is ~bucket²·num_perm byte-ops of
    sequential numpy (about 1.4e9 for the sf1.0 hot bucket — well
    under a second) instead of 11M codegen'd zip_with evaluations, so
    the straggler disappears without salting."""
    # matches*1000 >= est_min  ⇔  matches >= ceil(est_min/1000)
    min_matches = -(-est_min // 1000)
    acc_t = np.uint8 if num_perm <= 255 else np.uint16
    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
        ]
    )

    # buckets above this size use the outer-product path; smaller ones
    # are batched per size class so a partition's hundreds of thousands
    # of 2-10-member buckets cost a handful of numpy calls, not 64
    # tiny allocations each
    big_n = 64

    def gen(it):
        frames = list(it)
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        if df.empty:
            return
        # group the partition's rows into buckets: sort by (band, bh)
        key = df["band"].to_numpy(np.int64) * np.int64(1 << 33) + (
            df["bh"].to_numpy(np.int64) + np.int64(1 << 32)
        )
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = df["id"].to_numpy(np.int64)[order]
        sig_mat = np.vstack(df["sig"].to_numpy()[order]).astype(np.int64)
        bounds = np.nonzero(np.diff(key))[0] + 1
        seg_starts = np.concatenate(([0], bounds))
        sizes = np.diff(np.concatenate((seg_starts, [len(key)])))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []

        def emit(ii: np.ndarray, jj: np.ndarray) -> None:
            # pairwise signature agreement for explicit index pairs,
            # chunked so the gathered (pairs × num_perm) temp is bounded
            for cs in range(0, len(ii), 1 << 20):
                ic = ii[cs : cs + (1 << 20)]
                jc = jj[cs : cs + (1 << 20)]
                mc = (sig_mat[ic] == sig_mat[jc]).sum(axis=1)
                keep = mc >= min_matches
                if keep.any():
                    ia = ids[ic[keep]]
                    ib = ids[jc[keep]]
                    out_a.append(np.minimum(ia, ib))
                    out_b.append(np.maximum(ia, ib))

        # small buckets, one vectorized pass per distinct bucket size
        small = (sizes >= 2) & (sizes <= big_n)
        for n in np.unique(sizes[small]):
            starts_n = seg_starts[small & (sizes == n)]
            ti, tj = np.triu_indices(int(n), 1)
            emit(
                (starts_n[:, None] + ti[None, :]).ravel(),
                (starts_n[:, None] + tj[None, :]).ravel(),
            )
        # big buckets: dense outer-product accumulation, row-chunked.
        # Each signature column is first factorized WITHIN the bucket:
        # a column with one distinct value (the band that DEFINES the
        # bucket agrees on every member) contributes +1 to every pair
        # and is folded into the threshold; a column with all-distinct
        # values contributes 0 and is skipped; the rest compare as
        # narrow integer codes instead of int64 — the dense pass is
        # memory-bound, so code width is wall-clock (measured 15.3 s →
        # ~2 s single-core on the sf1.0 hot buckets)
        for s, n in zip(seg_starts[sizes > big_n], sizes[sizes > big_n]):
            n = int(n)
            bsig = sig_mat[s : s + n]
            const_cols = 0
            var_cols: list[np.ndarray] = []
            for p in range(bsig.shape[1]):
                u, inv = np.unique(bsig[:, p], return_inverse=True)
                if len(u) == 1:
                    const_cols += 1
                elif len(u) < n:
                    ct = np.uint8 if len(u) <= 255 else (
                        np.uint16 if len(u) <= 65535 else np.int64
                    )
                    var_cols.append(inv.astype(ct))
            thr = min_matches - const_cols
            for cs in range(0, n, 2048):
                ce = min(cs + 2048, n)
                if thr <= 0:
                    # every collision pair passes the estimate
                    ii, jj = np.nonzero(np.ones((ce - cs, n), dtype=bool))
                else:
                    acc = np.zeros((ce - cs, n), dtype=acc_t)
                    for col in var_cols:
                        acc += col[cs:ce, None] == col[None, :]
                    ii, jj = np.nonzero(acc >= thr)
                keep = jj > (ii + cs)  # strict upper triangle only
                if keep.any():
                    ia = ids[s + ii[keep] + cs]
                    ib = ids[s + jj[keep]]
                    out_a.append(np.minimum(ia, ib))
                    out_b.append(np.maximum(ia, ib))
        if out_a:
            yield pd.DataFrame(
                {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
            )

    out = banded.repartition(F.col("band"), F.col("bh")).mapInPandas(
        gen, schema
    )
    # a pair sharing several bands is emitted once per collision;
    # ``dedup=False`` lets a caller that already dedups downstream
    # (e.g. the verifier's partition-local unique over id_a-partitioned
    # pairs) skip this exchange
    return out.distinct() if dedup else out


def _sigs_banded_bm(
    docs: DataFrame,
    universe: np.ndarray,
    num_perm: int,
    w: int,
    bands: int,
    seed: int = 42,
) -> DataFrame:
    """(id, sig, bm, band, bh) — signatures AND the exact shingle-set
    bitmap over the corpus ``universe``, one Arrow pass per doc, then
    the band explode.  The bitmap (V/8 bytes ≈ 260 B at the measured
    V≈2k universe) rides the bucket shuffle so the bucket workers can
    verify pairs EXACTLY in place — the per-pair text attach and its
    ~600 B × 2 payload per candidate disappear (guide §2.3/§8: move
    per-doc metadata once, never per-pair payloads).

    Raises inside the worker if a text holds a shingle outside
    ``universe`` — impossible when the universe was computed from the
    same deterministic relation (loud failure beats silent wrong
    counts)."""
    a, b = _minhash_params(num_perm, seed)
    a_u = a[:, None].astype(np.uint64)
    b_u = b[:, None].astype(np.uint64)
    base = np.uint64(1099511628211)
    weights = np.empty(w, dtype=np.uint64)
    weights[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, w):
            weights[i] = weights[i - 1] * base
    words = (universe.size + 63) >> 6

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("sig", T.ArrayType(T.LongType())),
                T.StructField("bm", T.BinaryType()),
            ]
        )
    )
    def sig_bm(texts: pd.Series) -> pd.DataFrame:
        from numpy.lib.stride_tricks import sliding_window_view

        sigs_out = []
        bms_out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            if len(raw) < w:
                raw = raw + b"\x00" * (w - len(raw))
            wins = sliding_window_view(np.frombuffer(raw, dtype=np.uint8), w)
            hv = np.unique(
                (wins.astype(np.uint64) * weights[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
            ) & np.uint64(0x7FFFFFFFFFFFFFFF)
            mins = ((a_u * hv[None, :] + b_u) % np.uint64(_MERSENNE)).min(axis=1)
            sigs_out.append(mins.astype(np.int64))
            hs = _cached_hset(t or "", w)
            idx = np.searchsorted(universe, hs)
            idx_c = np.minimum(idx, universe.size - 1)
            if not (universe[idx_c] == hs).all():
                raise RuntimeError(
                    "shingle outside the precomputed universe — the docs "
                    "relation is not the one the universe was built from"
                )
            bm = np.zeros(words, dtype=np.uint64)
            np.bitwise_or.at(
                bm, idx_c >> 6, np.uint64(1) << (idx_c & 63).astype(np.uint64)
            )
            bms_out.append(bm.tobytes())
        return pd.DataFrame({"sig": sigs_out, "bm": bms_out})

    docs = _spread_for_udf(docs, "id")
    sigs = docs.select(
        F.col("id"), sig_bm(F.col("t")).alias("_sb")
    ).select("id", F.col("_sb.sig").alias("sig"), F.col("_sb.bm").alias("bm"))
    rows_per_band = num_perm // bands
    # the bucket hash uses the FULL signature values; the signature that
    # rides the shuffle for the estimate prefilter is truncated to
    # 7-bit codes (array<tinyint>, 64 B vs 512 B at 64 perms — measured
    # 5.7× collision→estimate reduction keeps the prefilter worth
    # shipping, and the estimate gathers two code rows per collision
    # pair, so code width is the stage's memory traffic).  Truncation
    # collisions (~1/128 per position) can only ADD estimate matches,
    # i.e. only let MORE pairs through to the exact popcount verify —
    # the verified output is unchanged.
    return sigs.select(
        "id",
        "sig",
        "bm",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(
                    F.slice("sig", i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bh"),
    ).select(
        "id",
        F.transform(
            "sig", lambda x: x.bitwiseAND(F.lit(127)).cast("tinyint")
        ).alias("sig"),
        "bm",
        "band",
        "bh",
    )


def _bucket_pairs_verified(
    banded_bm: DataFrame, num_perm: int, est_min: int, threshold_milli: int
) -> DataFrame:
    """LSH buckets → EXACT-verified near-dup pairs (id_a, id_b, inter,
    uni), fused into the single bucket stage.

    Extends :func:`_bucket_pairs_est`: the same in-worker bucket
    grouping and signature-estimate prefilter, then — instead of
    shipping ~10⁶-10⁷ estimate survivors to a separate text-attach +
    verify stage — each surviving pair's exact |A∩B| is one
    popcount(AND) over the docs' shingle bitmaps, right where the pair
    is born.  Only TRUE near-dup pairs (×bands duplicates) ever leave
    the worker (measured 8.5M estimate survivors → 80 verified on the
    sf1.0 bench corpus), so the pair repartition, the two text joins
    and the 5 GB/query Arrow text transfer vanish (guide §2.4 "remove
    shuffles outright", §8 "decide with small rows").  Output-identical
    to the est → attach → verify chain: the bitmap encodes exactly the
    hash-set membership the verifier probed."""
    min_matches = -(-est_min // 1000)
    acc_t = np.uint8 if num_perm <= 255 else np.uint16
    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("inter", T.LongType()),
            T.StructField("uni", T.LongType()),
        ]
    )
    big_n = 64
    lut = _POPCOUNT16

    def gen(it):
        frames = list(it)
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        if df.empty:
            return
        key = df["band"].to_numpy(np.int64) * np.int64(1 << 33) + (
            df["bh"].to_numpy(np.int64) + np.int64(1 << 32)
        )
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = df["id"].to_numpy(np.int64)[order]
        sig_mat = np.vstack(df["sig"].to_numpy()[order])  # int8 codes
        bm_mat = np.vstack(
            [
                np.frombuffer(buf, dtype=np.uint64)
                for buf in df["bm"].to_numpy()[order]
            ]
        )
        nsh = lut[bm_mat.view(np.uint16)].sum(axis=1, dtype=np.int64)
        bounds = np.nonzero(np.diff(key))[0] + 1
        seg_starts = np.concatenate(([0], bounds))
        sizes = np.diff(np.concatenate((seg_starts, [len(key)])))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        out_u: list[np.ndarray] = []

        def emit(ii: np.ndarray, jj: np.ndarray) -> None:
            # estimate prefilter, then exact popcount verify, chunked
            for cs in range(0, len(ii), 1 << 20):
                ic = ii[cs : cs + (1 << 20)]
                jc = jj[cs : cs + (1 << 20)]
                mc = (sig_mat[ic] == sig_mat[jc]).sum(axis=1)
                est = mc >= min_matches
                if not est.any():
                    continue
                ie, je = ic[est], jc[est]
                inter = lut[(bm_mat[ie] & bm_mat[je]).view(np.uint16)].sum(
                    axis=1, dtype=np.int64
                )
                uni = nsh[ie] + nsh[je] - inter
                keep = inter * 1000 >= threshold_milli * uni
                if keep.any():
                    ia = ids[ie[keep]]
                    ib = ids[je[keep]]
                    out_a.append(np.minimum(ia, ib))
                    out_b.append(np.maximum(ia, ib))
                    out_i.append(inter[keep])
                    out_u.append(uni[keep])

        small = (sizes >= 2) & (sizes <= big_n)
        for n in np.unique(sizes[small]):
            starts_n = seg_starts[small & (sizes == n)]
            ti, tj = np.triu_indices(int(n), 1)
            emit(
                (starts_n[:, None] + ti[None, :]).ravel(),
                (starts_n[:, None] + tj[None, :]).ravel(),
            )
        # big buckets: estimate via factorized-code accumulation as in
        # _bucket_pairs_est, exact popcount only on the survivors
        for s, n in zip(seg_starts[sizes > big_n], sizes[sizes > big_n]):
            n = int(n)
            bsig = sig_mat[s : s + n]
            const_cols = 0
            var_cols: list[np.ndarray] = []
            for p in range(bsig.shape[1]):
                u, inv = np.unique(bsig[:, p], return_inverse=True)
                if len(u) == 1:
                    const_cols += 1
                elif len(u) < n:
                    ct = np.uint8 if len(u) <= 255 else (
                        np.uint16 if len(u) <= 65535 else np.int64
                    )
                    var_cols.append(inv.astype(ct))
            thr = min_matches - const_cols
            for cs in range(0, n, 2048):
                ce = min(cs + 2048, n)
                if thr <= 0:
                    ii, jj = np.nonzero(np.ones((ce - cs, n), dtype=bool))
                else:
                    acc = np.zeros((ce - cs, n), dtype=acc_t)
                    for col in var_cols:
                        acc += col[cs:ce, None] == col[None, :]
                    ii, jj = np.nonzero(acc >= thr)
                keep = jj > (ii + cs)  # strict upper triangle only
                if not keep.any():
                    continue
                ie = s + ii[keep] + cs
                je = s + jj[keep]
                inter = lut[(bm_mat[ie] & bm_mat[je]).view(np.uint16)].sum(
                    axis=1, dtype=np.int64
                )
                uni = nsh[ie] + nsh[je] - inter
                kx = inter * 1000 >= threshold_milli * uni
                if kx.any():
                    ia = ids[ie[kx]]
                    ib = ids[je[kx]]
                    out_a.append(np.minimum(ia, ib))
                    out_b.append(np.maximum(ia, ib))
                    out_i.append(inter[kx])
                    out_u.append(uni[kx])
        if out_a:
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b),
                    "inter": np.concatenate(out_i),
                    "uni": np.concatenate(out_u),
                }
            )

    out = banded_bm.repartition(F.col("band"), F.col("bh")).mapInPandas(
        gen, schema
    )
    # a pair sharing several bands is verified once per collision with
    # identical (inter, uni) — a plain distinct de-duplicates the tiny
    # survivor stream
    return out.distinct()


def _shingle_hash_set(t: str, w: int) -> np.ndarray:
    """Sorted distinct 64-bit polynomial hashes of the character
    ``w``-shingles of ``t`` (the whole string when shorter than ``w`` —
    same membership rule as the set-based verifier it replaced).

    Characters are the UTF-32 code points, so windows match Python
    string slicing exactly; hashing is the module's rolling polynomial
    (prefix products + inverse-power prefix sums, `_mix64` avalanche) —
    one numpy pass per text, no per-shingle Python."""
    t = t or ""
    cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(cps)
    if n == 0:
        return _mix64(np.zeros(1, dtype=np.uint64))
    if n < w:
        starts = np.array([0], dtype=np.int64)
        ends = np.array([n], dtype=np.int64)
    else:
        starts = np.arange(0, n - w + 1, dtype=np.int64)
        ends = starts + w
    with np.errstate(over="ignore"):
        pw = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n - 1, _POLY_BASE, dtype=np.uint64)))
        )
        ivp = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n - 1, _POLY_INV, dtype=np.uint64)))
        )
        s = np.concatenate(([np.uint64(0)], np.cumsum(cps * ivp)))
        return np.unique(_mix64(pw[ends - 1] * (s[ends] - s[starts])))


# Worker-level shingle-hash-set memo for the pair verifier: the same
# text recurs across MANY candidate pairs and Arrow batches (a doc with
# k candidates appears k times), and re-hashing it per batch dominated
# the verify stage.  Keyed by the text itself (content-addressed, so
# reuse across queries/corpora is always correct); bounded and cleared
# wholesale rather than LRU-tracked — the working set per task is one
# corpus partition's texts, far below the cap (guide §4.5: heavyweight
# init once per worker, amortized across batches via worker reuse).
_HSET_CACHE: dict[tuple[str, int], np.ndarray] = {}
_HSET_CACHE_CAP = 200_000


def _cached_hset(t: str, w: int) -> np.ndarray:
    key = (t, w)
    hs = _HSET_CACHE.get(key)
    if hs is None:
        if len(_HSET_CACHE) >= _HSET_CACHE_CAP:
            _HSET_CACHE.clear()
        hs = _shingle_hash_set(t, w)
        _HSET_CACHE[key] = hs
    return hs


def _pair_jaccard_udf(w: int):
    """Arrow-batched exact shingle-Jaccard for candidate *pairs* — only
    over LSH candidates (a vanishing fraction of all pairs), never the
    full corpus.  Each distinct text is shingle-hashed ONCE per worker
    (`_cached_hset`); pairs are then grouped by their left text and
    verified with ONE ``searchsorted`` + ``add.reduceat`` per group
    (probe all the group's right-hand sets into the shared left set in
    a single vectorized call) — no per-pair numpy calls, no per-pair
    Python set arithmetic."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("inter", T.LongType()),
                T.StructField("uni", T.LongType()),
            ]
        )
    )
    def jac(ta: pd.Series, tb: pd.Series) -> pd.DataFrame:
        texts = pd.concat([ta, tb], ignore_index=True).fillna("")
        codes, uniq = pd.factorize(texts)
        hsets = [_cached_hset(t, w) for t in uniq]
        sizes = np.fromiter((h.size for h in hsets), np.int64, len(hsets))
        m = len(ta)
        ia, ib = codes[:m], codes[m:]
        inters = np.empty(m, dtype=np.int64)
        order = np.argsort(ia, kind="stable")
        oa, ob = ia[order], ib[order]
        pos = 0
        while pos < m:
            end = pos
            a = oa[pos]
            while end < m and oa[end] == a:
                end += 1
            ha = hsets[a]
            grp = ob[pos:end]
            seg = [hsets[c] for c in grp]
            lens = np.fromiter((s.size for s in seg), np.int64, len(seg))
            probe = np.concatenate(seg) if len(seg) > 1 else seg[0]
            idx = np.searchsorted(ha, probe)
            idx[idx == ha.size] = 0  # any in-range slot; equality decides
            eq = (ha[idx] == probe).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            inters[order[pos:end]] = np.add.reduceat(eq, starts)
            pos = end
        unis = sizes[ia] + sizes[ib] - inters
        return pd.DataFrame({"inter": inters, "uni": unis})

    return jac


# Shared-universe bitmap verify (see _verify_pairs_stage): boilerplate
# corpora draw their shingles from a tiny shared universe (measured
# ~2,000 distinct shingle hashes across 50k bench docs), so each doc
# compresses to V/64 uint64 words and a pair's exact intersection is
# popcount(A & B) — ~30 word-ops instead of gathering + binary-searching
# ~325 hash probes per pair.  The universe is discovered ONCE per query
# by a bounded aggregate (below); per-text bitmaps are then pure
# functions of (text, universe) and live in the worker's
# content-addressed cache, so a text is encoded once per worker, not
# once per partition × repetition (guide §4.5).
_BITMAP_UNIVERSE_CAP = 8192
_POPCOUNT16 = np.unpackbits(
    np.arange(1 << 16, dtype=np.uint16).view(np.uint8)[:, None], axis=1
).sum(axis=1, dtype=np.uint8).reshape(-1, 2).sum(axis=1, dtype=np.uint8)

_BITMAP_CACHE: dict[tuple, np.ndarray] = {}
_BITMAP_CACHE_CAP = 200_000


def _shingle_universe(docs: DataFrame, w: int) -> np.ndarray | None:
    """The corpus's distinct shingle-hash universe, or None when it is
    wider than `_BITMAP_UNIVERSE_CAP` (the driver action is bounded by
    the cap — a diverse 10^12-doc corpus short-circuits to None after
    cap+1 rows, it never materializes its shingle space)."""
    schema = T.StructType([T.StructField("h", T.LongType())])

    def local_unique(it):
        # int64 bit-view: LongType-safe transport of the uint64 hash
        # domain (values above 2^63 ride as negatives).  One np.unique
        # per partition — no per-element python; a partition whose own
        # distinct count exceeds the cap truncates to cap+1 rows, which
        # still drives the global count over the cap → None.
        chunks: list[np.ndarray] = []
        for df in it:
            chunks.extend(
                _cached_hset(t or "", w).view(np.int64) for t in df["t"]
            )
        if chunks:
            u = np.unique(np.concatenate(chunks))
            yield pd.DataFrame({"h": u[: _BITMAP_UNIVERSE_CAP + 1]})

    rows = (
        _spread_for_udf(docs.select("id", "t"), "id")
        .select("t")
        .mapInPandas(local_unique, schema)
        .distinct()
        .limit(_BITMAP_UNIVERSE_CAP + 1)
        .collect()
    )
    if len(rows) > _BITMAP_UNIVERSE_CAP:
        return None
    signed = np.array([r["h"] for r in rows], dtype=np.int64)
    return np.sort(signed.view(np.uint64))


def _cached_bitmap(
    t: str, w: int, universe: np.ndarray, utoken: int
) -> np.ndarray | None:
    """(text → universe bitmap), worker-memoized; None if the text has
    a shingle outside the universe (caller falls back to hash sets)."""
    key = (t, w, utoken)
    bm = _BITMAP_CACHE.get(key)
    if bm is None:
        hs = _cached_hset(t, w)
        idx = np.searchsorted(universe, hs)
        idx_c = np.minimum(idx, universe.size - 1)
        if not (universe[idx_c] == hs).all():
            return None
        words = (universe.size + 63) >> 6
        bm = np.zeros(words, dtype=np.uint64)
        np.bitwise_or.at(bm, idx_c >> 6, np.uint64(1) << (idx_c & 63).astype(np.uint64))
        if len(_BITMAP_CACHE) >= _BITMAP_CACHE_CAP:
            _BITMAP_CACHE.clear()
        _BITMAP_CACHE[key] = bm
    return bm


def _verify_pairs_stage(
    paired: DataFrame,
    w: int,
    threshold_milli: int,
    universe: np.ndarray | None = None,
) -> DataFrame:
    """Candidate (id_a, id_b, ta, tb) rows → verified near-dup pairs
    (id_a, id_b, inter, uni) with exact shingle-Jaccard ≥ threshold —
    duplicate candidates (one per shared band) removed, verified, and
    filtered in ONE partition-level pass.

    The input must be partitioned so both copies of a pair co-locate
    (any partitioning on id_a does: duplicates agree on both ids).
    Per partition: unique (id_a, id_b) rows; distinct texts hashed once
    (worker-memoized, `_cached_hset`); the per-pair probes are gathered
    from one flat concatenation with a vectorized repeat/cumsum index —
    no per-pair numpy calls — and each id_a run costs a single
    ``searchsorted`` + ``add.reduceat``.  Only passing pairs are ever
    yielded, so the downstream plan sees the ~0.03% survivors, not the
    candidate stream."""
    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("inter", T.LongType()),
            T.StructField("uni", T.LongType()),
        ]
    )

    def gen(it):
        frames = list(it)
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        if df.empty:
            return
        ia_raw = df["id_a"].to_numpy(np.int64)
        ib_raw = df["id_b"].to_numpy(np.int64)
        # partition-local distinct on the pair key (order-insensitive:
        # lexsort + adjacent-difference, no reliance on input order)
        perm = np.lexsort((ib_raw, ia_raw))
        ia_s, ib_s = ia_raw[perm], ib_raw[perm]
        first = np.ones(len(ia_s), dtype=bool)
        first[1:] = (np.diff(ia_s) != 0) | (np.diff(ib_s) != 0)
        sel = perm[first]
        sel.sort()  # keep text/pair rows aligned with the original frame
        ia, ib = ia_raw[sel], ib_raw[sel]
        texts = pd.concat(
            [df["ta"].iloc[sel], df["tb"].iloc[sel]], ignore_index=True
        ).fillna("")
        codes, uniq = pd.factorize(texts)
        m = len(ia)
        ca, cb = codes[:m], codes[m:]
        if universe is not None:
            utoken = int(universe[0] ^ universe[-1] ^ np.uint64(universe.size))
            bitmaps = [_cached_bitmap(t, w, universe, utoken) for t in uniq]
            if all(b is not None for b in bitmaps):
                mat = np.vstack(bitmaps)
                lut = _POPCOUNT16
                sizes = lut[mat.view(np.uint16)].sum(axis=1, dtype=np.int64)
                inters = np.empty(m, dtype=np.int64)
                chunk = max(1, (1 << 22) // max(mat.shape[1], 1))
                for cs in range(0, m, chunk):
                    ce = min(cs + chunk, m)
                    andw = mat[ca[cs:ce]] & mat[cb[cs:ce]]
                    inters[cs:ce] = lut[andw.view(np.uint16)].sum(
                        axis=1, dtype=np.int64
                    )
                unis = sizes[ca] + sizes[cb] - inters
                keep = inters * 1000 >= threshold_milli * unis
                if keep.any():
                    yield pd.DataFrame(
                        {
                            "id_a": ia[keep],
                            "id_b": ib[keep],
                            "inter": inters[keep],
                            "uni": unis[keep],
                        }
                    )
                return
        hsets = [_cached_hset(t, w) for t in uniq]
        sizes = np.fromiter((h.size for h in hsets), np.int64, len(hsets))
        # sort pairs by left code so each id_a group is a contiguous
        # run, then gather every pair's right-hand set from ONE flat
        # concatenation of the distinct hsets with a single vectorized
        # repeat+arange index — no per-pair numpy calls anywhere
        run = np.argsort(ca, kind="stable")
        ca_s, cb_s = ca[run], cb[run]
        flat = np.concatenate(hsets) if len(hsets) > 1 else hsets[0]
        offs = np.concatenate(([0], np.cumsum(sizes[:-1])))
        lens_b = sizes[cb_s]
        starts_b = offs[cb_s]
        total = int(lens_b.sum())
        bound = np.concatenate(([0], np.cumsum(lens_b)))
        gather = np.repeat(starts_b - bound[:-1], lens_b) + np.arange(total)
        probe = flat[gather]
        run_bounds = np.nonzero(np.diff(ca_s))[0] + 1
        grp_starts = np.concatenate(([0], run_bounds))
        grp_ends = np.concatenate((run_bounds, [m]))
        inters_s = np.empty(m, dtype=np.int64)
        for gs, ge in zip(grp_starts, grp_ends):
            ha = hsets[ca_s[gs]]
            seg = probe[bound[gs] : bound[ge]]
            loc = np.searchsorted(ha, seg)
            loc[loc == ha.size] = 0  # any in-range slot; equality decides
            eq = (ha[loc] == seg).astype(np.int64)
            inters_s[gs:ge] = np.add.reduceat(eq, bound[gs:ge] - bound[gs])
        inters = np.empty(m, dtype=np.int64)
        inters[run] = inters_s
        unis = sizes[ca] + sizes[cb] - inters
        keep = inters * 1000 >= threshold_milli * unis
        if keep.any():
            yield pd.DataFrame(
                {
                    "id_a": ia[keep],
                    "id_b": ib[keep],
                    "inter": inters[keep],
                    "uni": unis[keep],
                }
            )

    return paired.mapInPandas(gen, schema)


def _shingle_size_udf(w: int):
    """|distinct w-shingle set| per text — the (inter, uni) both equal
    this for an exact-duplicate pair, letting the expansion step emit
    within-group pairs without running the pair verifier on them."""

    @F.pandas_udf(T.LongType())
    def ssize(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [int(_shingle_hash_set(t, w).size) for t in texts.fillna("")]
        )

    return ssize


def _minhash_pairs_core(
    docs: DataFrame,
    num_perm: int,
    bands: int,
    threshold_milli: int,
    w: int,
    bucket_cap: int | None,
    universe: np.ndarray | None = None,
    universe_known: bool = False,
) -> DataFrame:
    """signatures → fused LSH-bucket + estimate pair generation → exact
    per-pair Jaccard verify, over ``docs(id, t)``.  Candidates only —
    never the all-pairs inverted index.

    The signature-level Jaccard estimate (count of agreeing signature
    positions, threshold ``threshold_milli - 150``: the margin keeps
    the estimate's false-negative probability < 1% at 64 perms) is
    applied INSIDE the bucket stage (:func:`_bucket_pairs_est`), so raw
    bucket collisions are never shuffled, deduplicated, or re-joined
    against the signature table — only estimate survivors reach the
    pair-level distinct and the exact verifier.  The estimate is a pure
    pair function, so the output is identical to the historical
    candidates → distinct → estimate-join plan (and still gated by the
    all-pairs oracle)."""
    est_min = max(0, threshold_milli - 150) * num_perm
    # boilerplate-corpus fast path: when the corpus's distinct shingle
    # universe is small (bounded discovery job — None above the cap),
    # each doc's exact shingle set compresses to a V-bit bitmap that
    # rides the bucket shuffle, and pairs are estimate-filtered AND
    # exact-verified inside the bucket workers — only true near-dup
    # pairs ever leave the stage (guide §2.4/§8).  Wide-universe
    # corpora keep the est → text-attach → verify chain.
    if not universe_known:
        universe = _shingle_universe(docs, w)
    if universe is not None and bucket_cap is None:
        banded_bm = _sigs_banded_bm(docs, universe, num_perm, w, bands)
        return _bucket_pairs_verified(
            banded_bm, num_perm, est_min, threshold_milli
        )
    sigs = minhash_signatures(docs, "t", "id", num_perm, w)
    banded = _banded_sigs(sigs, bands, num_perm // bands)
    if bucket_cap is not None:
        banded = _cap_buckets(banded, ["band", "bh"], bucket_cap)
    # one exchange between candidates and output: pairs co-partition on
    # id_a (both copies of a band-duplicated pair agree on both ids, so
    # any id_a partitioning co-locates them), texts attach by broadcast
    # join, and the verify stage dedups + verifies + filters in a
    # single partition-level pass — the pair-level distinct exchange
    # and the post-UDF filter both collapse into it (guide §2.4)
    cand = _bucket_pairs_est(banded, num_perm, est_min, dedup=False)
    cand = cand.repartition(F.col("id_a"))
    # (A broadcast-{id: text} variant that streamed only 16-byte id
    # pairs was measured SLOWER here: each task re-unpickles the
    # broadcast dict and every partition re-derives ~all right-hand
    # hash sets, costing more than the per-pair text transfer saves.
    # The broadcast joins below attach texts without moving the
    # candidate stream.)
    paired = (
        cand.join(docs.select(F.col("id").alias("id_a"), F.col("t").alias("ta")), "id_a")
        .join(docs.select(F.col("id").alias("id_b"), F.col("t").alias("tb")), "id_b")
    )
    return _verify_pairs_stage(paired, w, threshold_milli, universe)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold_milli: int = 800,
    w: int = 5,
    collapse_exact: bool = True,
    expand: str = "all",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Full pipeline: **exact-text pre-collapse** → signatures → LSH
    candidates → exact-Jaccard verify within candidates → fan results
    back out through the exact-duplicate groups.  Returns
    (id_a, id_b, inter, uni) verified near-dup pairs; survivors follow
    the min-id rule downstream.

    The pre-collapse (``collapse_exact``, on by default) is the
    hot-bucket defense the 10^12-doc case REQUIRES: n byte-identical
    boilerplate docs have identical signatures, so they land in the
    same (band, hash) bucket in *every* band and the candidate
    self-join emits ~bands·n²/2 pairs.  Grouping by exact content hash
    first (sha2-256, the same key as :func:`exact_dedup`) runs the
    whole LSH machinery on one representative per distinct text —
    identical docs can never inflate a bucket, signatures are computed
    once per distinct text, and the result is provably identical: the
    signature/estimate/verify stack is a pure function of the text, so
    a member pair passes iff its representative pair passes.

    ``expand`` controls the fan-out:
      * ``"all"`` — every implied member pair, with (inter, uni) taken
        from the representative pair (within-group pairs get
        inter = uni = |shingle set|).  Output-faithful to the
        un-collapsed pipeline; note the OUTPUT itself is inherently
        quadratic in exact-group size.
      * ``"star"`` — within each exact group emit only (rep, member)
        spanning pairs, and cross-group pairs only between
        representatives: O(n) output with identical connected
        components / dup_groups downstream — the form to use at scale.

    ``bucket_cap`` additionally drops residual oversized LSH buckets
    (near-identical template *families*); see :func:`_cap_buckets`.
    """
    if expand not in ("all", "star"):
        raise ValueError(f"unknown expand mode {expand!r}")
    if not collapse_exact:
        docs = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        return _minhash_pairs_core(
            docs, num_perm, bands, threshold_milli, w, bucket_cap
        )
    docs = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    # the shingle universe of the RAW corpus equals the universe of its
    # distinct-text representatives (duplicate texts add no shingles) —
    # discover it BEFORE the collapse machinery so the bounded discovery
    # job scans the plain corpus instead of materializing the
    # sha2/groupBy/semi-join chain a first time
    universe = _shingle_universe(docs, w) if bucket_cap is None else None
    # hash the corpus ONCE: keyed is the tiny (id, 32-byte digest)
    # projection, persisted so reps and mapping both read it instead of
    # re-running sha2 over the full text column
    keyed = docs.select(
        "id", F.sha2(F.coalesce(F.col("t"), F.lit("")), 256).alias("_h")
    ).persist()
    # map-side combinable min per content hash; the mapping join fans a
    # hot content hash 1×n, never n×n
    reps = keyed.groupBy("_h").agg(F.min("id").alias("rep_id"))
    mapping = keyed.join(reps, "_h").select("id", "rep_id").persist()
    rep_docs = docs.join(
        reps.select(F.col("rep_id").alias("id")), "id", "semi"
    )
    rep_pairs = _minhash_pairs_core(
        rep_docs, num_perm, bands, threshold_milli, w, bucket_cap,
        universe=universe, universe_known=bucket_cap is None,
    )
    # exact groups with >1 member need |shingle set| for their
    # within-group pairs — computed once per such representative
    multi = mapping.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("_gn")
    ).filter(F.col("_gn") > 1)
    ssize = _shingle_size_udf(w)
    sizes = (
        rep_docs.join(
            multi.select(F.col("rep_id").alias("id")), "id", "semi"
        )
        .select(F.col("id").alias("rep_id"), ssize(F.col("t")).alias("_ss"))
    )
    if expand == "star":
        within = (
            mapping.filter(F.col("id") != F.col("rep_id"))
            .join(sizes, "rep_id")
            .select(
                F.col("rep_id").alias("id_a"),
                F.col("id").alias("id_b"),
                F.col("_ss").alias("inter"),
                F.col("_ss").alias("uni"),
            )
        )
        return rep_pairs.unionByName(within)
    ma = mapping.select(F.col("id").alias("_xa"), F.col("rep_id").alias("id_a"))
    mb = mapping.select(F.col("id").alias("_xb"), F.col("rep_id").alias("id_b"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("_xa", "_xb").alias("id_a"),
            F.greatest("_xa", "_xb").alias("id_b"),
            "inter",
            "uni",
        )
    )
    # restrict the mapping to multi-member groups FIRST (the sizes
    # dimension is exactly those groups): the within self-join then
    # pairs only duplicate families instead of self-pairing every
    # singleton of the corpus and filtering afterwards
    m_multi = mapping.join(sizes, "rep_id")
    w1 = m_multi.select("rep_id", "_ss", F.col("id").alias("_xa"))
    w2 = m_multi.select("rep_id", F.col("id").alias("_xb"))
    within = (
        w1.join(w2, "rep_id")
        .filter(F.col("_xa") < F.col("_xb"))
        .select(
            F.col("_xa").alias("id_a"),
            F.col("_xb").alias("id_b"),
            F.col("_ss").alias("inter"),
            F.col("_ss").alias("uni"),
        )
    )
    return cross.unionByName(within)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over ASCII-whitespace tokens (Arrow-batched).

    Per document the token hashing is the vectorized prefix-product
    polynomial hash (`_token_hashes`) and the bit votes are one
    (tokens × bits) matrix op — the same zero-per-token-Python shape as
    `minhash_signatures`."""

    @F.pandas_udf(T.LongType())
    def sig(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        shifts = np.arange(bits, dtype=np.uint64)
        for i, t in enumerate(texts):
            arr = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            hv = _token_hashes(arr)
            if not len(hv):
                continue
            bitcols = ((hv[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            votes = (2 * bitcols - 1).sum(axis=0)
            word = np.bitwise_or.reduce(
                np.uint64(1) << shifts[votes > 0], initial=np.uint64(0)
            )
            out[i] = np.int64(word & np.uint64(0x7FFFFFFFFFFFFFFF))
        return pd.Series(out)

    df = _spread_for_udf(df, id_col)
    return df.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    collapse_identical: bool = True,
    expand: str = "all",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Candidate pairs within Hamming distance via block banding,
    verified with native bit_count (Spark 3.5+).

    The signature is split into ``max_hamming + 1`` near-equal bit
    blocks — by pigeonhole, any pair ≤ max_hamming bits apart shares at
    least one full block, so recall is GUARANTEED at the requested
    radius (a fixed 4-block split only guarantees hamming ≤ 3).

    ``collapse_identical`` (default on) is the hot-bucket defense:
    identical texts hash to identical signatures, which collide in
    EVERY block — n boilerplate copies would put n ids in the same
    bucket per block and the self-join would emit ~blocks·n²/2 pairs.
    Collapsing to one representative per distinct signature first
    (min id — stricter than, and subsuming, exact-text identity) runs
    the banding join over distinct signatures only, then fans results
    back out: ``expand="all"`` reproduces every implied member pair
    (hamming 0 within a signature group — output-faithful to the
    un-collapsed join, though the output itself is quadratic in group
    size); ``expand="star"`` emits (rep, member) spanning pairs within
    groups and rep-level pairs across — O(n) output with identical
    connected components downstream.  ``bucket_cap`` drops residual
    oversized buckets (distinct-but-near-identical template families);
    see :func:`_cap_buckets`."""
    if expand not in ("all", "star"):
        raise ValueError(f"unknown expand mode {expand!r}")
    if collapse_identical:
        reps = sigs.groupBy("simhash").agg(F.min("id").alias("id"))
        mapping = sigs.join(
            reps.select("simhash", F.col("id").alias("rep_id")), "simhash"
        ).select("id", "rep_id").persist()
        rep_pairs = simhash_near_pairs(
            reps.select("id", "simhash"),
            max_hamming,
            collapse_identical=False,
            bucket_cap=bucket_cap,
        )
        if expand == "star":
            within = mapping.filter(F.col("id") != F.col("rep_id")).select(
                F.col("rep_id").alias("id_a"),
                F.col("id").alias("id_b"),
                F.lit(0).cast("int").alias("hamming"),
            )
            return rep_pairs.unionByName(within)
        ma = mapping.select(F.col("id").alias("_xa"), F.col("rep_id").alias("id_a"))
        mb = mapping.select(F.col("id").alias("_xb"), F.col("rep_id").alias("id_b"))
        cross = (
            rep_pairs.join(ma, "id_a")
            .join(mb, "id_b")
            .select(
                F.least("_xa", "_xb").alias("id_a"),
                F.greatest("_xa", "_xb").alias("id_b"),
                "hamming",
            )
        )
        w1 = mapping.select("rep_id", F.col("id").alias("_xa"))
        w2 = mapping.select("rep_id", F.col("id").alias("_xb"))
        within = (
            w1.join(w2, "rep_id")
            .filter(F.col("_xa") < F.col("_xb"))
            .select(
                F.col("_xa").alias("id_a"),
                F.col("_xb").alias("id_b"),
                F.lit(0).cast("int").alias("hamming"),
            )
        )
        return cross.unionByName(within)
    n_blocks = min(max_hamming + 1, 64)
    widths = [64 // n_blocks + (1 if i < 64 % n_blocks else 0) for i in range(n_blocks)]
    offsets = np.concatenate(([0], np.cumsum(widths[:-1]))).tolist()
    blocks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", int(off)).bitwiseAND(
                        # width 64 (max_hamming=0): (1<<64)-1 overflows
                        # LongType — -1 is the all-ones long
                        F.lit((1 << wid) - 1 if wid < 64 else -1)
                    )
                    for off, wid in zip(offsets, widths)
                ]
            )
        ).alias("blk", "bval"),
    )
    if bucket_cap is not None:
        blocks = _cap_buckets(blocks, ["blk", "bval"], bucket_cap)
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["blk", "bval"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.filter(ham <= max_hamming).select(
        "id_a", "id_b", ham.alias("hamming")
    )


# ---------------------------------------------------------------------------
# Connected components (pairs → canonical duplicate groups)
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    max_iters: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
    method: str = "propagation",
) -> DataFrame:
    """Label every node of the near-dup pair graph with the MINIMUM id
    reachable from it — the canonical duplicate-group id.  Returns
    (id, comp); survivors downstream are the rows with ``id == comp``.

    The last step of a web-scale dedup pipeline: LSH/verify emits
    PAIRS, but retention decisions need GROUPS (a doc duplicated 3 ways
    must keep exactly one copy, not one per pair).  The reference has
    no graph step (its duplicate handling is per-scene first-wins,
    `eodal/mapper/mapper.py:565-667`); this generalizes it to
    transitive duplicate chains.

    Algorithm: minimum-label propagation over the undirected edge set —
    each round joins current labels across edges and takes the
    neighborhood minimum (agg form → map-side combine; the shuffle key
    is the node id, so a 10^9-member boilerplate component costs
    rounds × |edges of the component| with NO single-task hotspot).
    Rounds needed = graph diameter (near-dup components are shallow —
    duplicate clusters, not social graphs); each round is checked via
    one count of changed labels and the loop stops early on
    convergence.  Raises after ``max_iters`` rather than returning a
    silently-partial labeling.  ≡ the label-propagation formulation of
    Kiveris et al.'s "Connected Components in MapReduce" (two-phase
    star contractions are the O(log n)-round upgrade; the propagation
    form is exact and simpler, and shallow graphs never see the
    difference).

    ``method="star"`` switches to the two-phase large-star/small-star
    contraction (`_connected_components_star`) — O(log n) rounds on
    high-diameter graphs where propagation needs O(diameter).
    """
    if method == "star":
        return _connected_components_star(pairs, max_iters, id_a, id_b)
    if method != "propagation":
        raise ValueError(f"unknown method {method!r}")
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        # truncate the PAIR-PRODUCING lineage once: every round joins
        # against `edges` and runs one convergence count, so without
        # this the upstream pair pipeline (LSH + verify for minhash
        # input) re-executes 2× PER ROUND — measured 50 s → 12 s for
        # dup_groups over 50k bench docs (guide §5 localCheckpoint)
        .localCheckpoint(eager=False)
    )
    # every endpoint starts labeled with itself
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        # truncate lineage each round — an iterative plan otherwise
        # doubles in depth per iteration and analysis cost explodes
        new_labels = _min_label_round(edges, labels).localCheckpoint(
            eager=True
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "the pair graph has a longer chain than expected; raise max_iters"
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star operation (Kiveris et al., "Connected Components
    in MapReduce and Beyond", alg. 1): every node u links each STRICTLY
    LARGER neighbor to the minimum of its closed neighborhood.  Input/
    output edges are canonically oriented (u > v); agg-shaped (groupBy
    min + equi-join), no windows, no driver state."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star operation: orient edges larger→smaller; every
    node links its smaller neighbors (and itself) to their minimum."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    joined = directed.join(mins, "u")
    return (
        joined.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .distinct()
    )


def _connected_components_star(
    pairs: DataFrame, max_iters: int, id_a: str, id_b: str
) -> DataFrame:
    """Two-phase star contraction: alternate large-star / small-star
    until the edge set is a fixed point — at which point the edges ARE
    disjoint stars centered on each component's minimum id.  Converges
    in O(log n) alternations on ANY graph (vs O(diameter) for label
    propagation), so a 10⁴-node path needs ~log rounds, not 10⁴.
    Same output contract as `connected_components`: (id, comp)."""
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        ss = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        converged = (
            ss.count() == edges.count() and ss.exceptAll(edges).isEmpty()
        )
        edges = ss
        if converged:
            leaves = edges.select(
                F.col("u").alias("id"), F.col("v").alias("comp")
            )
            roots = (
                edges.select(F.col("v").alias("id"))
                .distinct()
                .withColumn("comp", F.col("id"))
            )
            # nodes appearing ONLY in self-pairs were dropped by the
            # u != v filter; propagation labels them with themselves —
            # keep the two methods' (id, comp) contracts identical
            self_only = (
                pairs.filter(F.col(id_a) == F.col(id_b))
                .select(F.col(id_a).alias("id"))
                .withColumn("comp", F.col("id"))
            )
            # a star fixed point has one root per leaf; the min-agg is a
            # cheap invariant guard, not a correctness crutch
            return leaves.union(roots).union(self_only).groupBy("id").agg(
                F.min("comp").alias("comp")
            )
    raise RuntimeError(
        f"star contraction did not converge in {max_iters} rounds — "
        "raise max_iters"
    )


def _min_label_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE min-label propagation round, un-checkpointed — separate so
    tests can assert it is agg-shaped (no Window) on the real plan;
    neighbor labels: for node u, the labels of all v adjacent to u."""
    nbr = edges.join(labels.withColumnRenamed("id", "v"), "v").select(
        F.col("u").alias("id"), "comp"
    )
    return labels.union(nbr).groupBy("id").agg(F.min("comp").alias("comp"))


def dup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, group_id) for EVERY document: members of a near-dup
    component share its minimum doc id; singletons are their own group.
    ``df.filter(doc_id == group_id)`` is then the retention set."""
    comp = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("group_id"),
        )
    )
