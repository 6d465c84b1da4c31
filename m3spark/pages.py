"""Deterministic synthetic Common-Crawl-style pages + HTML→text extraction.

Table shape is exactly the north-star ``input_hint``:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Generation is **pure JVM-side column expressions over** ``spark.range`` —
no Python in the loop, no driver-side data — so the same generator scales
from 1k rows (smoke) to bench scale without changing shape.  Everything
derives from the row id via xxhash64, so the table is deterministic and
independent of partitioning (seed folded into the hash inputs).

Planted anomalies (FIXTURES.md §1):
- ~1% malformed urls (embedded space)          → trips ``format: uri``
- ~0.5% exact duplicate urls (copy neighbor)   → trips uniqueness-on-url
- ~1% empty text                               → trips ``minLength: 1``
- ~0.2% emoji suffix                           → exercises codepoint length
- hot-domain Zipf skew on ~30% of rows         → exercises salting/AQE
- ~0.5% ``lang`` outside the enum              → trips ``enum``

The HTML wraps ``text`` verbatim in a fixed template, so the extractor
must reproduce ``text`` **byte-identically** (north-star invariant; the
decode-then-validate analog of m3's content keywords — SURVEY.md §2.9).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

SEED = 42

_WORDS = (
    "data page web crawl index token table query spark schema value check "
    "valid error drift stat count hash join scan batch text lang html url "
    "node edge graph list tree byte word line time date rank site host path "
    "form link card feed item view post news shop game code file test suite"
).split()

_LANGS = ["en", "de", "fr", "es", "zh", "ja", "pt", "ru"]
# cumulative per-mille thresholds for the baseline lang mix
_LANG_CUM = [480, 630, 750, 850, 930, 960, 985, 1000]
# drifted mix: en shrinks, zh/ru grow (for PSI/KS drift tests)
_LANG_CUM_DRIFTED = [300, 450, 570, 670, 850, 880, 905, 1000]

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

_HTML_PREFIX = "<html><head><title>"
_HTML_MID = "</title></head><body>"
_HTML_SUFFIX = "</body></html>"


def _h(*cols) -> F.Column:
    """Seeded 64-bit hash of the given columns, non-negative."""
    return F.abs(F.xxhash64(F.lit(SEED), *cols))


def _h_portable(*cols) -> F.Column:
    """Portable twin of :func:`_h` (md5-60bit, ops.phash): DuckDB can
    reproduce it, so the driver's oracle gate can re-derive the table's
    structural fields (crawl day, lang band, domain) and independently
    recompute the per-partition verdicts the flagship pipeline emits."""
    from m3spark.ops.phash import portable_hash60
    return portable_hash60(*cols, salt=str(SEED))


def generate_pages(spark: SparkSession, n_rows: int, drifted: bool = False,
                   n_partitions: int | None = None,
                   hash_fn: str = "xxhash64") -> DataFrame:
    """Deterministic pages table of ``n_rows`` rows, built entirely from
    JVM expressions over ``spark.range`` (scales linearly, no shuffle).

    ``hash_fn='portable'`` derives the structural fields (url domain,
    crawl timestamp, lang band) from the md5-60bit portable hash instead
    of xxhash64 — same shape and anomaly rates, but reproducible in
    DuckDB SQL for oracle cross-checks.  The word sequence of ``text``
    stays on xxhash64 either way (content doesn't affect validity, only
    the planted emptiness does)."""
    h = _h_portable if hash_fn == "portable" else _h
    if n_partitions is None:
        n_partitions = max(8, spark.sparkContext.defaultParallelism)
    df = spark.range(0, n_rows, 1, n_partitions)
    sid = F.col("id")

    # ~0.5% duplicate urls: these rows clone their neighbor's url
    uid = F.when(sid % 200 == 9, sid - 1).otherwise(sid)

    # Zipf-ish domains: 30% of rows on 3 hot domains, long tail of 10k
    dh = h(uid, F.lit("domain")) % 1000
    domain = (F.when(dh < 150, "hot-zero.example.com")
               .when(dh < 250, "hot-one.example.com")
               .when(dh < 300, "hot-two.example.com")
               .otherwise(F.concat(F.lit("site-"),
                                   (h(uid, F.lit("tail")) % 10000)
                                   .cast("string"),
                                   F.lit(".example.org"))))
    # ~1% malformed urls (space in path → fails format: uri)
    path = F.when(uid % 100 == 7,
                  F.concat(F.lit("bad path/"), uid.cast("string")))\
            .otherwise(F.concat(F.lit("p/"), uid.cast("string")))
    url = F.concat(F.lit("https://"), domain, F.lit("/"), path)

    # 30-day crawl window from a fixed epoch
    secs = (h(sid, F.lit("ts")) % (30 * 86400)).cast("long")
    warc_ts = F.timestamp_seconds(F.lit(1717200000) + secs)  # 2024-06-01 UTC

    # text: word sequence; length log-ish via pow(2, 3..10)
    u = (_h(sid, F.lit("len")) % 1000) / 1000.0
    n_words = F.floor(F.pow(F.lit(2.0), 3.0 + 7.0 * u)).cast("int")
    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    body = F.array_join(
        F.transform(F.sequence(F.lit(1), n_words),
                    lambda i: F.element_at(
                        words_arr,
                        (F.pmod(F.xxhash64(F.lit(SEED), F.col("id"), i),
                                F.lit(len(_WORDS))) + 1).cast("int"))),
        " ")
    text = (F.when(sid % 100 == 3, F.lit(""))                 # ~1% empty
             .when(sid % 500 == 4, F.concat(body, F.lit(" \U0001F600")))
             .otherwise(body))

    # lang mix (baseline vs drifted), ~0.5% outside the enum
    cum = _LANG_CUM_DRIFTED if drifted else _LANG_CUM
    lh = h(sid, F.lit("lang")) % 1000
    lang = F.lit(_LANGS[-1])
    for name, hi in reversed(list(zip(_LANGS, cum))):
        lang = F.when(lh < hi, name).otherwise(lang)
    lang = F.when(sid % 200 == 11, F.lit("xx")).otherwise(lang)

    title = F.concat(F.lit("Page "), sid.cast("string"))
    html = F.encode(
        F.concat(F.lit(_HTML_PREFIX), title, F.lit(_HTML_MID),
                 text, F.lit(_HTML_SUFFIX)),
        "UTF-8")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


# -- extraction (content-decode analog: m3 property.cljc:743-810) -----------


def _extract_one(raw: bytes | None) -> str | None:
    if raw is None:
        return None
    s = bytes(raw).decode("utf-8", errors="replace")
    start = s.find("<body>")
    if start < 0:
        return None
    end = s.rfind("</body>")
    if end < 0 or end < start:
        return None
    return s[start + len("<body>"):end]


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Deterministic HTML→text extraction, Arrow-batched (never per-row
    py4j).  Must be byte-identical to the source ``text`` column for
    generator-produced pages (north-star per-row invariant)."""
    return html.map(_extract_one)


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "extracted_text") -> DataFrame:
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))


# The north-star page constraint schema: compiled by BOTH engines
# (columnar for the table, interpreter for parity testing).
PAGES_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["url", "warc_ts", "html", "text", "lang"],
    "properties": {
        "url": {"type": "string", "format": "uri",
                "pattern": "^https?://", "maxLength": 2048},
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": _LANGS},
    },
}
