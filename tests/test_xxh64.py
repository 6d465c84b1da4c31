"""Bit-exact parity of the pure-Python XXH64 oracle mirror
(m3spark/ops/xxh64.py) against Spark's JVM xxhash64 expression — the
evidence that lets tools/check_oracles.py value-check the production
xxhash64 MinHash path (minhash_pairs_fast) via a DuckDB UDF."""

from __future__ import annotations

from pyspark.sql import functions as F

from m3spark.ops.xxh64 import Long, spark_xxhash64

STRINGS = [
    "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
    "abcdefghi", "abcdefghijkl", "0123456789abcdef",          # 16
    "0123456789abcdefghijklmnopqrstu",                        # 31
    "0123456789abcdefghijklmnopqrstuv",                       # 32
    "0123456789abcdefghijklmnopqrstuvw",                      # 33
    "x" * 63, "x" * 64, "x" * 65, "x" * 1000,
    "héllo wörld", "ناقوس", "日本語テキスト", "emoji 🙂🚀", "mix🙂x",
    "[1, 2, 3]", "[-9223372036854775808, 42]",
]


def test_xxh64_string_parity(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    want = [spark_xxhash64(s) for s in STRINGS]
    assert got == want


def test_xxh64_seed_chain_parity(spark):
    """xxhash64(string, int) — the exact shape minhash_signatures uses
    (shingle, salt): the first argument's hash seeds the second."""
    rows = [(s, i) for i, s in enumerate(STRINGS)]
    df = spark.createDataFrame(rows, "s string, i int")
    got = [r[0] for r in df.select(F.xxhash64("s", "i")).collect()]
    want = [spark_xxhash64(s, i) for s, i in rows]
    assert got == want


def test_xxh64_long_parity(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    want = [spark_xxhash64(Long(v)) for v in vals]
    assert got == want


def test_minhash_fast_duckdb_mirror(spark):
    """End-to-end: minhash_pairs(hash_fn='xxhash64') reproduced in
    DuckDB with the Python mirror registered as a scalar UDF — the same
    full-pipeline value check the portable twin gets in SQL."""
    import duckdb

    from m3spark.ops import minhash_pairs

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and agaiN"),
        (3, "completely different text with no overlap whatsoever here!"),
        (4, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in minhash_pairs(df, "doc_id", "text", num_hashes=32,
                                  bands=8, hash_fn="xxhash64").collect()}

    con = duckdb.connect()
    con.create_function(
        "xxh64_str_int",
        lambda s, i: spark_xxhash64(s, i),
        ["VARCHAR", "INTEGER"], "BIGINT")
    con.create_function(
        "xxh64_str",
        lambda s: spark_xxhash64(s),
        ["VARCHAR"], "BIGINT")
    con.sql("CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in texts)
            + ") AS t(doc_id, text)")
    want = {(r[0], r[1]): r[2] for r in con.sql("""
        WITH sh AS (
          SELECT DISTINCT doc_id, substr(text, i, 8) AS shingle
          FROM documents,
               UNNEST(range(1, GREATEST(length(text) - 7, 1) + 1, 4))
                 AS t(i)),
        hs AS (
          SELECT doc_id, j, MIN(xxh64_str_int(shingle, CAST(j AS INT)))
                 AS hv
          FROM sh, UNNEST(range(0, 32)) AS u(j)
          GROUP BY doc_id, j),
        bandkey AS (
          SELECT doc_id, (j // 4) AS band,
                 xxh64_str('[' || string_agg(hv::VARCHAR, ', '
                                             ORDER BY j) || ']')
                 AS bucket
          FROM hs GROUP BY doc_id, band),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bandkey a JOIN bandkey b
            ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id),
        agree AS (
          SELECT c.id_a, c.id_b,
                 SUM(CASE WHEN ha.hv = hb.hv THEN 1 ELSE 0 END) AS n_eq
          FROM cand c
          JOIN hs ha ON ha.doc_id = c.id_a
          JOIN hs hb ON hb.doc_id = c.id_b AND hb.j = ha.j
          GROUP BY c.id_a, c.id_b)
        SELECT id_a, id_b, ROUND(n_eq / 32.0, 6) AS est_jaccard
        FROM agree""").fetchall()}
    assert got == want
    assert (1, 4) in got and got[(1, 4)] == 1.0
