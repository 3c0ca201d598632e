"""Deterministic synthetic Common-Crawl-style pages table.

The engine's base relation (BASELINE.json ``input_hint``)::

    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Pages are *geocoded*: the lat/lon (centi-degree integers) are embedded in
the page body, so geography is a pure function of ``html`` bytes — the
engine re-derives it via `extract_text` + `parse_geo` (≡ the reference
reading pixel coordinates out of the raster itself).

Every column is **pure integer/string arithmetic over a row id** — the
generator is ``spark.range(n)`` plus Column expressions, so it
materializes nothing, scales to any n (the 10M-row bench input costs no
I/O), and the *identical* table is reproducible in DuckDB via
`sql_pages_subquery` for the row-for-row oracle gate.

Spatial distribution mirrors FIXTURES.md §1: 60% uniform background +
40% split across three city hotspots (skew driver for salting/AQE
tests).  ~Duplicate (cell, time-bucket) collisions arise naturally and
exercise the mosaic first-wins dedup (`eodal/mapper/mapper.py:565-667`).

Column derivation (i = row id, all bigint, both dialects):

    h          = (i * 2654435761) % 2147483648          # Knuth hash
    hotspot?   = h % 10 >= 6                            # 40% in cities
    city       = (h / 10) % 3                           # which hotspot
    lon_centi  = uniform: (i*9973  + 17) % 36000
                 city:    city_lon + (h/30)   % 200 - 100
    lat_centi  = uniform: 3000 + (i*7919 + 23) % 12000  # avoid poles
                 city:    city_lat + (h/6000) % 200 - 100
    ts_off     = (i*104729 + h % 97) % 7948800          # 92-day window
    lang       = ['en','de','fr','it'][h % 4]
    payload    = md5(cast(i as string))
    text       = 'page {i} geo {lat_centi} {lon_centi} lang {lang} payload {md5}'
    html       = '<html><head><title>p{i}</title></head><body><p>{text}</p></body></html>'
    url        = 'https://site{h%1000}.example/p/{i}'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from eodal_spark import grid

EPOCH_BASE = 1556668800  # 2019-05-01T00:00:00Z
WINDOW_SECONDS = 7948800  # 92 days
CITIES = [(18854, 13737), (10600, 13070), (31970, 12570)]  # Zürich, NYC, Tokyo


def _exprs(dialect: str, i: str) -> dict[str, str]:
    """The shared column derivations as dialect SQL strings."""
    if dialect == "spark":
        s = lambda e: f"CAST({e} AS STRING)"  # noqa: E731
        idiv = "div"
    elif dialect == "duckdb":
        s = lambda e: f"CAST({e} AS VARCHAR)"  # noqa: E731
        idiv = "//"
    else:
        raise ValueError(dialect)

    h = f"(({i}) * 2654435761 % 2147483648)"
    city = f"(({h} {idiv} 10) % 3)"
    city_lon = (
        f"(CASE {city} WHEN 0 THEN {CITIES[0][0]} WHEN 1 THEN {CITIES[1][0]} "
        f"ELSE {CITIES[2][0]} END + ({h} {idiv} 30) % 200 - 100)"
    )
    city_lat = (
        f"(CASE {city} WHEN 0 THEN {CITIES[0][1]} WHEN 1 THEN {CITIES[1][1]} "
        f"ELSE {CITIES[2][1]} END + ({h} {idiv} 6000) % 200 - 100)"
    )
    lon_centi = (
        f"(CASE WHEN {h} % 10 < 6 THEN (({i}) * 9973 + 17) % 36000 "
        f"ELSE {city_lon} END)"
    )
    lat_centi = (
        f"(CASE WHEN {h} % 10 < 6 THEN 3000 + (({i}) * 7919 + 23) % 12000 "
        f"ELSE {city_lat} END)"
    )
    ts_sec = f"({EPOCH_BASE} + (({i}) * 104729 + {h} % 97) % {WINDOW_SECONDS})"
    lang = (
        f"(CASE {h} % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de' "
        f"WHEN 2 THEN 'fr' ELSE 'it' END)"
    )
    text = (
        f"('page ' || {s(i)} || ' geo ' || {s(lat_centi)} || ' ' || "
        f"{s(lon_centi)} || ' lang ' || {lang} || ' payload ' || md5({s(i)}))"
    )
    html = (
        f"('<html><head><title>p' || {s(i)} || '</title></head><body><p>' || "
        f"{text} || '</p></body></html>')"
    )
    url = f"('https://site' || {s(f'{h} % 1000')} || '.example/p/' || {s(i)})"
    return {
        "h": h,
        "lon_centi": lon_centi,
        "lat_centi": lat_centi,
        "ts_sec": ts_sec,
        "lang": lang,
        "text": text,
        "html": html,
        "url": url,
    }


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """The pages table as a lazy DataFrame — exactly the input_hint schema."""
    e = _exprs("spark", "id")
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    return df.select(
        F.expr(e["url"]).alias("url"),
        F.timestamp_seconds(F.expr(e["ts_sec"])).alias("warc_ts"),
        F.expr(e["html"]).cast("binary").alias("html"),
        F.expr(e["text"]).alias("text"),
        F.expr(e["lang"]).alias("lang"),
    )


def sql_pages_subquery(n: int, dialect: str) -> str:
    """The identical table as a SQL subquery (DuckDB oracle / Spark SQL).

    Timestamps are exposed as bigint epoch seconds (``ts_sec``) to keep
    the cross-engine comparison timezone-free; geo centi-degrees are
    exposed directly (in the engine they are re-parsed from html).
    """
    i = "id" if dialect == "spark" else "range"
    src = f"range({n})"
    e = _exprs(dialect, i)
    return (
        f"(SELECT {e['url']} AS url, {e['ts_sec']} AS ts_sec, "
        f"{e['text']} AS text, {e['lang']} AS lang, "
        f"{e['lat_centi']} AS lat_centi, {e['lon_centi']} AS lon_centi "
        f"FROM {src})"
    )


# ---------------------------------------------------------------------------
# html → text extraction and geocoding (the engine-side derivations)
# ---------------------------------------------------------------------------

def extract_text(html: Column) -> Column:
    """Byte-identical text extraction — a pure function of ``html`` bytes.

    Native `regexp_extract` (JVM, codegen); the invariant gate
    (BASELINE.json input_hint) checks ``extract_text(html) == text``
    byte-for-byte per url.  ≡ the reference's raster→value read path
    being a pure function of file bytes.
    """
    return F.regexp_extract(html.cast("string"), r"<p>(.*)</p>", 1)


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL — the dedup key a crawl pipeline groups
    by before any content hashing (two crawls of ``HTTP://Site.EX:80/a?b=1&a=2``
    and ``http://site.ex/a?a=2&b=1`` are the same page):

    * scheme and host lowercased; userinfo (``user:pass@``) dropped —
      credentials are not part of the resource's identity;
    * default ports stripped (``:80`` for http, ``:443`` for https);
    * query parameters sorted bytewise; empty query dropped (a ``?``
      appearing only inside the fragment is NOT a query);
    * fragment dropped (never sent to the server).

    Entirely native Column ops (regexp + array_sort + concat) —
    whole-stage codegen, no Python — and implemented twice (here and as
    DuckDB SQL in the ``url_canonical`` oracle) so the gate checks the
    SPEC, not one implementation against itself.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # first '?' BEFORE any '#': a '?' inside the fragment is not a query
    query = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)
        ),
    )


def parse_geo(text: Column) -> tuple[Column, Column, Column, Column]:
    """text → (lat_centi, lon_centi, lat, lon). Native regexp + arithmetic.

    Outputs are **non-nullable** (unparseable pages get sentinel -1,
    whose cell id is negative and therefore joins nothing).  This is a
    plan-shape decision, not just robustness: a nullable join key makes
    Catalyst infer an ``isnotnull(key)`` filter and push it below the
    projection, inlining the whole regexp chain into the filter — the
    expression then evaluates 4× per row.  Non-nullable keys keep one
    regexp evaluation per row (measured 3× faster end-to-end)."""
    # ONE regex pass for both numbers: extracting group 1 and group 2
    # as separate regexp_extract calls makes codegen run the match
    # twice per row (they are distinct expressions, so subexpression
    # elimination cannot merge them) — capture the "lat lon" span once
    # and split it instead (measured ~8% on the 40M-row extraction).
    # try_element_at: ANSI-safe on unparseable pages (split("") has one
    # element, index 2 must yield NULL, not an error).
    pair = F.split(F.regexp_extract(text, r" geo (\d+ \d+) ", 1), " ")
    lat_centi = F.coalesce(
        F.try_element_at(pair, F.lit(1)).try_cast("long"), F.lit(-1)
    )
    lon_centi = F.coalesce(
        F.try_element_at(pair, F.lit(2)).try_cast("long"), F.lit(-1)
    )
    lat = lat_centi.cast("double") / 100.0 - 90.0
    lon = lon_centi.cast("double") / 100.0 - 180.0
    return lat_centi, lon_centi, lat, lon


def geocode(df: DataFrame, res: int, html_col: str = "html") -> DataFrame:
    """Full geocoding stage: html → text → lat/lon → cell_id.

    The cell id is computed with **exact integer arithmetic** on the
    centi-degree values (`grid.sql_cell_encode_centi`) so the assignment
    is bit-identical to the DuckDB oracle — no float rounding at cell
    boundaries.  Entirely native Catalyst; an Arrow pandas-UDF variant
    exists in `grid.cell_encode_arrow` for float inputs.
    """
    extracted = extract_text(F.col(html_col)).alias("text_extracted")
    out = df.withColumn("text_extracted", extracted)
    # geo parse reads the RAW html bytes, not text_extracted: nesting
    # the two regexes (geo pattern over the extract pattern's result)
    # evaluates BOTH per row even when text_extracted itself is pruned
    # away — the geo regex's argument inlines the extract regex.  The
    # ' geo (\d+ \d+) ' span lives inside the page paragraph, so the
    # first match over html equals the first match over the extracted
    # text for any page whose pre-paragraph bytes contain no geo span
    # (true by construction of the pages fixture; gated row-for-row by
    # every spatial oracle).  Measured ~2 s / 40M rows off the headline.
    lat_centi, lon_centi, lat, lon = parse_geo(F.col(html_col).cast("string"))
    out = (
        out.withColumn("lat_centi", lat_centi)
        .withColumn("lon_centi", lon_centi)
        .withColumn("lat", lat)
        .withColumn("lon", lon)
        .withColumn(
            "cell_id",
            # gate the encode on the parse sentinel: Spark's `div`
            # TRUNCATES (-1 div 36000 = 0), so an ungated encode would
            # map garbage pages to the valid corner cell at -180/-90
            # (and DuckDB's flooring `//` would disagree).  when/
            # otherwise over non-nullable branches stays non-nullable —
            # see parse_geo on why nullability costs 2-4×
            F.when(
                (F.col("lat_centi") >= 0) & (F.col("lon_centi") >= 0),
                F.coalesce(
                    F.expr(
                        grid.sql_cell_encode_centi(
                            "lon_centi", "lat_centi", res, "spark"
                        )
                    ),
                    F.lit(-1),
                ),
            ).otherwise(F.lit(-1)),
        )
    )
    return out
