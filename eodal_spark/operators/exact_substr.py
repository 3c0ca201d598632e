"""Exact duplicate-substring detection — the ExactSubstr tier of
training-data dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better"; public method: find substrings long
enough that repetition cannot be coincidence — 50 BPE tokens there,
word ``n``-grams here — that occur more than once in the CORPUS, and
flag/scrub the spans).  Doc-level exact/MinHash/SimHash dedup
(``operators/dedup.py``) misses these: boilerplate paragraphs, license
blocks and quoted passages repeat inside otherwise-unique documents.

Spark shape — the suffix array becomes two aggregations:

* every doc explodes to its word-``n``-gram windows with positions
  (the same native split→sequence→slice→array_join chain as
  ``text.decontaminate`` — no UDF);
* window multiplicity is ONE groupBy over the exploded corpus.  This
  shuffle is ~tokens×8 bytes when ``hashed=True`` (xxhash64 keys) —
  the honest price of corpus-GLOBAL substring dedup, the same order
  as the distributed suffix array Lee et al. build; there is no
  cheaper exact formulation because every token participates;
* the duplicated-window set (normally a tiny sliver) joins back
  broadcast when Catalyst's size estimate allows, shuffle otherwise —
  the same stats gate as ``spatial_join``/``lm``;
* per-doc span statistics are a lag window over each doc's duplicated
  positions only (gaps-and-islands: windows at distance ≤ n merge),
  so the window shuffle carries the sliver, not the corpus.

``hashed=True`` (default) groups on 64-bit xxhash64 of the window —
at 10^12 windows the collision expectation is ~10^-7 per pair class,
the same trade ``dedup.minhash_lsh_candidates`` documents.  The
driver gate runs ``hashed=False`` (exact string keys) so the hash is
collision-free by construction; hashed≡unhashed is test-asserted on
the fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eodal_spark.operators.lm import _maybe_broadcast
from eodal_spark.operators.text import _idiv, ngram_array


def window_positions(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """(id, pos, ng) — every word-``n``-gram window with its 1-based
    token position.  A flatMap (posexplode), no shuffle."""
    out = docs.select(
        F.col(id_col),
        F.posexplode(ngram_array(F.col(text_col), n)).alias("_p", "ng"),
    ).select(id_col, (F.col("_p") + 1).alias("pos"), "ng")
    if hashed:
        out = out.select(id_col, "pos", F.xxhash64("ng").alias("ng"))
    return out


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hashed: bool = True,
    broadcast_hot: bool | None = None,
) -> DataFrame:
    """Per-doc duplicated-substring statistics, one row per doc:

    * ``n_tokens``, ``n_windows`` — doc size in tokens / windows;
    * ``n_dup_windows`` — windows whose text occurs ≥ ``min_count``
      times corpus-wide (including all copies);
    * ``n_dup_spans`` — maximal merged runs of duplicated windows
      (windows at start-distance ≤ n merge — overlapping or adjacent
      coverage is one span);
    * ``dup_tokens`` — tokens covered by those spans
      (first window n, each follower min(Δpos, n));
    * ``dup_token_milli`` — per-mille of the doc's tokens covered.

    All integer — the driver gate hashes them bit-for-bit against a
    DuckDB twin.  Docs with no duplicated windows report zeros."""
    wins = window_positions(docs, n, id_col, text_col, hashed)
    hot = (
        wins.groupBy("ng")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("ng")
    )
    dup = wins.join(_maybe_broadcast(hot, broadcast_hot), "ng", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    delta = F.col("pos") - F.lag("pos").over(w)
    spans = (
        dup.select(id_col, "pos")
        .withColumn("_delta", delta)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_dup_windows"),
            F.sum(
                F.when(F.col("_delta").isNull() | (F.col("_delta") > n), 1)
                .otherwise(0)
            ).alias("n_dup_spans"),
            F.sum(
                F.when(
                    F.col("_delta").isNull() | (F.col("_delta") > n), F.lit(n)
                ).otherwise(F.least(F.col("_delta"), F.lit(n)))
            ).alias("dup_tokens"),
        )
    )
    sizes = docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                        lambda t: t != F.lit(""))).alias("n_tokens"),
    ).withColumn(
        "n_windows", F.greatest(F.col("n_tokens") - n + 1, F.lit(0))
    )
    out = sizes.join(spans, id_col, "left")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return out.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_windows").cast("long").alias("n_windows"),
        z("n_dup_windows").alias("n_dup_windows"),
        z("n_dup_spans").alias("n_dup_spans"),
        z("dup_tokens").alias("dup_tokens"),
        F.when(F.col("n_tokens") <= 0, F.lit(0).cast("long"))
        .otherwise(_idiv(z("dup_tokens") * 1000, F.col("n_tokens")))
        .alias("dup_token_milli"),
    )


def drop_duplicated_docs(
    docs: DataFrame,
    n: int = 20,
    max_dup_milli: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Drop docs whose duplicated-substring coverage exceeds
    ``max_dup_milli`` per-mille of their tokens — the doc-granular
    application of ExactSubstr (Lee et al. §4.1 discuss dropping vs
    cutting; dropping preserves document coherence)."""
    stats = duplicate_span_stats(
        docs, n, id_col, text_col, min_count
    ).filter(F.col("dup_token_milli") <= max_dup_milli).select(id_col)
    return docs.join(stats, id_col, "semi")


def scrub_duplicated_spans(
    docs: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hashed: bool = True,
) -> DataFrame:
    """Remove the duplicated spans in place (Lee et al.'s cut
    behavior): tokens covered by any duplicated window are dropped and
    the survivors rejoin with single spaces.  Whitespace is therefore
    normalized in scrubbed docs — span surgery at token granularity
    cannot preserve the original inter-token bytes (documented, same
    stance as ``text.scrub_boilerplate_lines``).

    Native end-to-end: the per-doc span list rides back as an array
    column; each token's membership test is an ``exists`` over that
    (small) array inside ``filter`` — no UDF, no second text scan."""
    wins = window_positions(docs, n, id_col, text_col, hashed)
    hot = (
        wins.groupBy("ng")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("ng")
    )
    dup = wins.join(hot, "ng", "left_semi")
    covered = dup.groupBy(id_col).agg(
        F.collect_set("pos").alias("_starts")
    )
    # reconstruction keeps the ORIGINAL case: lowercasing exists only
    # inside window_positions for matching, and token positions are
    # identical either way (case does not move whitespace) — lowering
    # here would silently rewrite all surviving text
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: t != F.lit(""))
    out = docs.join(covered, id_col, "left")
    keep = F.filter(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda s: ~F.exists(
            F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
            lambda p: (s["i"] >= p) & (s["i"] < p + n),
        ),
    )
    return out.withColumn(
        text_col,
        F.array_join(F.transform(keep, lambda s: s["t"]), " "),
    ).drop("_starts")
