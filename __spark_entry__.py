"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship columnar validation over sf0.001 documents.
``queries()`` — one entry per implemented operator family (SURVEY.md §2
plus the training-data ops); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible scale ops, which get rows-only checks).

Column names are aliased identically on both sides; float outputs are
rounded (or computed in exact decimal) so value hashes agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# schemas used by the validation queries

DOCUMENTS_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["doc_id", "text", "lang", "source", "n_chars"],
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "lang": {"enum": ["en", "de", "fr", "es"]},
        "source": {"pattern": "^src[0-9]$"},
        "n_chars": {"minimum": 50, "maximum": 500},
        "text": {"minLength": 1},
    },
}

LINEITEM_SCHEMA = {
    "type": "object",
    "properties": {
        "l_quantity": {"exclusiveMaximum": 50},
        "l_discount": {"multipleOf": 0.02},
        "l_tax": {"maximum": 0.05},
    },
}

EVENT_PROPS_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0,
                         "exclusiveMaximum": 50}},
}


# $defs-reusing schema (SURVEY §2.8): every $ref here is acyclic and
# local, so inline_local_refs expands it on the driver and the whole
# plan stays pure-JVM columnar — including the chained ref
# (priorityCode -> code) and the 2020-12 sibling meld on o_totalprice
REF_DEFS_ORDERS_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$defs": {
        "posNumber": {"type": "number", "minimum": 0},
        "code": {"type": "string", "minLength": 1, "maxLength": 16},
        "priorityCode": {"$ref": "#/$defs/code",
                         "pattern": "^[1-5]-[A-Z]+$"},
    },
    "required": ["o_orderkey", "o_orderstatus"],
    "properties": {
        "o_orderkey": {"$ref": "#/$defs/posNumber"},
        "o_custkey": {"$ref": "#/$defs/posNumber"},
        "o_totalprice": {"$ref": "#/$defs/posNumber", "maximum": 400000},
        "o_orderstatus": {"$ref": "#/$defs/code",
                          "enum": ["O", "F", "P"]},
        "o_orderpriority": {"$ref": "#/$defs/priorityCode"},
    },
}


CONTENT_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2019-09/schema",
    "properties": {
        "payload": {
            "type": "string",
            "contentEncoding": "base64",
            "contentMediaType": "application/json",
            "contentSchema": {
                "type": "object",
                "required": ["name", "port"],
                "properties": {
                    "name": {"type": "string", "minLength": 2},
                    "port": {"type": "integer", "minimum": 1,
                             "maximum": 65535},
                    # one level DEEPER (r4): nested object via variant
                    # paths + array elements via array<variant> forall
                    "cfg": {"type": "object",
                            "properties": {"retries": {"type": "integer",
                                                       "minimum": 0}}},
                    "tags": {"items": {"type": "string",
                                       "minLength": 2}},
                },
                # r6: applicators compose freely inside contentSchema
                # (reference property.cljc:788-810) and lower to the
                # same 0-Python variant predicates
                "allOf": [{"properties": {"name":
                                          {"pattern": "^[a-z]+$"}}}],
                "anyOf": [{"required": ["port"]},
                          {"required": ["sock"]}],
                "oneOf": [{"required": ["mode"]},
                          {"properties": {"mode": {"const": "both"}}}],
                "not": {"properties": {"name": {"const": "forbidden"}},
                        "required": ["name"]},
                "if": {"properties": {"proto": {"const": "udp"}},
                       "required": ["proto"]},
                "then": {"properties": {"port": {"minimum": 1024}}},
            },
        },
    },
}

# deterministic base64-JSON payload battery keyed on doc_id % 16:
# 0/7 valid, 1 minLength, 2 minimum, 3 maximum, 4 required (+anyOf),
# 5 invalid JSON, 6 invalid base64, 8 deep-valid, 9 nested minimum,
# 10 array-element minLength, 11 nested type, 12 oneOf (both match),
# 13 not, 14 if/then, 15 allOf pattern
CONTENT_PAYLOAD_SQL = """
CASE CAST(doc_id % 16 AS INT)
WHEN 0 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 80)), 'UTF-8'))
WHEN 1 THEN base64(encode(to_json(named_struct(
            'name', 'x', 'port', 80)), 'UTF-8'))
WHEN 2 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 0)), 'UTF-8'))
WHEN 3 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 99999)), 'UTF-8'))
WHEN 4 THEN base64(encode(to_json(named_struct('name', 'web')), 'UTF-8'))
WHEN 5 THEN base64(encode('not json {', 'UTF-8'))
WHEN 6 THEN '!!!not base64!!!'
WHEN 8 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 80,
            'cfg', named_struct('retries', 3))), 'UTF-8'))
WHEN 9 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 80,
            'cfg', named_struct('retries', -1))), 'UTF-8'))
WHEN 10 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 80,
            'tags', array('ok', 'x'))), 'UTF-8'))
WHEN 11 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 80, 'cfg', 5)), 'UTF-8'))
WHEN 12 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 80, 'mode', 'both')), 'UTF-8'))
WHEN 13 THEN base64(encode(to_json(named_struct(
            'name', 'forbidden', 'port', 80)), 'UTF-8'))
WHEN 14 THEN base64(encode(to_json(named_struct(
            'name', 'web', 'port', 53, 'proto', 'udp')), 'UTF-8'))
WHEN 15 THEN base64(encode(to_json(named_struct(
            'name', 'Web', 'port', 80)), 'UTF-8'))
ELSE base64(encode(to_json(named_struct(
            'name', 'db', 'port', 5432,
            'tags', array('aa', 'bb'))), 'UTF-8'))
END"""


# --------------------------------------------------------------------------
# queries


def q_val_documents(spark, sf_dir):
    """Columnar keyword validation (enum/pattern/bounds/minLength/required)
    over the documents table — SURVEY.md §2.1-2.3.  Violation rows carry
    the offending instance value (m3 errors include :document —
    util.cljc:106-115)."""
    from m3spark.columnar import ColumnarValidator

    docs = _t(spark, sf_dir, "documents")
    cv = ColumnarValidator(DOCUMENTS_SCHEMA, format_assertion=True)
    return (cv.violation_rows(docs, "doc_id")
              .select("doc_id", "keyword", "schema_path", "value"))


def q_val_lineitem(spark, sf_dir):
    """Numeric keyword checks incl. exact decimal multipleOf — §2.1."""
    from m3spark.columnar import ColumnarValidator

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "line_id",
        F.concat(F.col("l_orderkey").cast("string"), F.lit("-"),
                 F.col("l_linenumber").cast("string")))
    cv = ColumnarValidator(LINEITEM_SCHEMA, format_assertion=True)
    return cv.violation_rows(li, "line_id").select("line_id", "keyword")


def q_val_events_props(spark, sf_dir):
    """Nested-JSON validation (type/required/bounds on the parsed
    props payload) PLUS an adversarial format:date field — 0-shuffle
    0-Python since r7: `date` now compiles to the closed-form JVM
    calendar predicate (compiler._date_pred: anchored shape +
    days-in-month/leap bound), so this query exercises real calendar
    rejection (month 0/13, day 0/32+, Feb-29 across leap and
    non-leap-century years) entirely inside whole-stage codegen.  The
    date candidate is built deterministically from event columns
    (year 1900+event_id%200 covers 1900/2000 century rules; month
    user_id%14 covers 0 and 13; day k covers 0 and >31); the oracle
    checks it with DuckDB's own TRY_CAST(.. AS DATE) — an independent
    date implementation, not a mirror of ours.  (The Arrow
    interpreter this query demonstrated through r6 stays pinned by
    the 11k-assertion corpus + engine-parity suites.)"""
    from m3spark.columnar import ColumnarValidator

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
        F.format_string(
            "%04d-%02d-%02d",
            (F.lit(1900) + F.col("event_id") % 200).cast("int"),
            (F.col("user_id") % 14).cast("int"),
            F.from_json("props", "k INT").getField("k").cast("int"),
        ).alias("d"))
    cv = ColumnarValidator(
        {"type": "object", "required": ["k", "d"],
         "properties": {"k": {"type": "integer", "minimum": 0,
                              "exclusiveMaximum": 50},
                        "d": {"type": "string", "format": "date"}}},
        format_assertion=True)
    return cv.apply(ev).select("event_id", "valid")


def q_val_events_props_struct(spark, sf_dir):
    """Nested validation on the COLUMNAR path: parse the JSON payload to
    a typed struct with from_json, then lower the nested keywords to
    getField predicates (SURVEY §7 step 5 — static-schema struct path;
    contrast with q_val_events_props, which uses the Arrow interpreter)."""
    from m3spark.columnar import ColumnarValidator

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.from_json("props", "k INT").alias("props_struct"))
    cv = ColumnarValidator({
        "required": ["props_struct"],
        "properties": {"props_struct": {
            "required": ["k"],
            "properties": {"k": {"type": "integer", "minimum": 0,
                                 "exclusiveMaximum": 50}}}}},
        format_assertion=True)
    return cv.apply(ev).select("event_id", "valid")


def q_val_orders_conditional(spark, sf_dir):
    """Cross-column conditional validation in the columnar engine
    (root-level if/then/else + dependentRequired — SURVEY §2.7 lowered to
    when() expressions): finished orders must be large-ish and
    high-priority orders need a customer key."""
    from m3spark.columnar import ColumnarValidator

    orders = _t(spark, sf_dir, "orders")
    cv = ColumnarValidator({
        "if": {"properties": {"o_orderstatus": {"const": "F"}},
               "required": ["o_orderstatus"]},
        "then": {"properties": {"o_totalprice": {"minimum": 5000}}},
        "else": {"properties": {"o_totalprice": {"minimum": 2000}}},
        "dependentRequired": {"o_orderpriority": ["o_custkey"]},
    }, format_assertion=True)
    return cv.apply(orders).select("o_orderkey", "valid")


def q_val_ref_defs_orders(spark, sf_dir):
    """$defs-reusing schema over the flat orders table, compiled to
    pure-JVM columnar via eager driver-side $ref inlining
    (m3spark/columnar/inline.py; reference semantics ref.cljc:133-151,
    property.cljc:227-295 — 2020-12 melds ref with siblings, chained
    refs expand transitively)."""
    from m3spark.columnar import ColumnarValidator

    orders = _t(spark, sf_dir, "orders")
    cv = ColumnarValidator(REF_DEFS_ORDERS_SCHEMA, format_assertion=True)
    return cv.apply(orders).select("o_orderkey", "valid")


def q_val_unevaluated_events(spark, sf_dir):
    """unevaluatedProperties lowered to pure-JVM columnar (SURVEY §7
    hard-part 1: static key-set algebra, branch claims gated on branch
    success — compiler.py _object_claims / _claimed_field; reference
    semantics property.cljc:268-293, 1083-1095).  A struct assembled
    from the event row: `k` is claimed by adjacent properties, `tag`
    only when the anyOf tag-branch succeeds, `extra` never — so rows
    with a non-matching tag or a non-null extra fail uP: false."""
    from m3spark.columnar import ColumnarValidator

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.struct(
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.col("event_type").alias("tag"),
            F.when(F.col("event_id") % 7 == 0, F.lit("x"))
             .otherwise(F.lit(None).cast("string")).alias("extra"),
        ).alias("obj"))
    cv = ColumnarValidator({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "properties": {"obj": {
            "anyOf": [
                {"properties": {"k": {"maximum": 49}}, "required": ["k"]},
                {"properties": {"tag": {"pattern": "^(click|view)$"}},
                 "required": ["tag"]},
            ],
            "properties": {"k": {"type": "integer"}},
            "unevaluatedProperties": False,
        }}}, format_assertion=True)
    return cv.apply(ev).select("event_id", "valid")


def q_uniqueness_documents(spark, sf_dir):
    """Cross-row uniqueness (distributed uniqueItems) on a composite key
    — §2.5/§2.10."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("lang", "source")
                .agg(F.count(F.lit(1)).alias("dup_count"))
                .filter(F.col("dup_count") > 1))


def q_ref_orders_without_lineitems(spark, sf_dir):
    """Referential check as anti-join (orders with no lineitems) — §2.10."""
    from m3spark.checks import referential_violations

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"))
    return (referential_violations(orders, li, "o_orderkey",
                                   broadcast_dim=False)
            .select("o_orderkey"))


def q_ref_lineitem_orphans(spark, sf_dir):
    """Anti-join the other way (lineitems with no part): negative control
    — must be empty when referential integrity holds."""
    from m3spark.checks import referential_violations

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (referential_violations(li, part, "l_partkey", "p_partkey")
            .select("l_partkey", "l_orderkey"))


def q_stats_documents(spark, sf_dir):
    """Per-group column stats (count/min/max/avg/distinct) — §2.10."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.min("n_chars").alias("min_chars"),
                     F.max("n_chars").alias("max_chars"),
                     F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                     F.count_distinct("source").alias("n_sources")))


def q_stats_events_daily(spark, sf_dir):
    """Per-day stats with exact decimal sums (deterministic across
    partitionings) — §2.10."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.to_date("ts").alias("day"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.min("value").alias("min_value"),
                   F.max("value").alias("max_value"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                    .cast("double").alias("sum_value"),
                   F.count_distinct("user_id").alias("n_users")))


def q_drift_events_psi(spark, sf_dir):
    """PSI of event_type mix between the two halves of the time range
    — §2.10 drift detection, fully in DataFrame ops via the library
    scale path (checks.drift.psi_split: one groupBy + broadcast
    totals, no driver-side histogram)."""
    from m3spark.checks.drift import psi_split

    ev = _t(spark, sf_dir, "events")
    half = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    return psi_split(ev, "event_type", half).select(
        F.round("psi", 6).alias("psi"))


def q_drift_events_ks(spark, sf_dir):
    """Binned two-sample KS statistic on `value` between time halves
    — §2.10 via checks.drift.ks_split: histogram in Spark, ECDF via
    window over the tiny bucket table, max |diff|."""
    from m3spark.checks.drift import ks_split

    ev = _t(spark, sf_dir, "events")
    half = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    return ks_split(ev, F.floor(F.col("value") / 25), half).select(
        F.round("ks", 6).alias("ks"))


def q_dedup_exact_documents(spark, sf_dir):
    """Exact content dedup via md5 hash-groupBy (negative control on this
    corpus: no identical texts)."""
    from m3spark.ops import exact_duplicates

    docs = _t(spark, sf_dir, "documents")
    return exact_duplicates(docs, ["text"])


def q_dedup_jaccard_documents(spark, sf_dir):
    """N-gram (char-8-shingle) Jaccard near-dup pairs, integer-ratio
    threshold >= 3/25 — dedup family.  max_shingle_freq caps the join
    fan-out of stop-shingles (a shingle shared by k docs otherwise costs
    O(k^2) join rows — the 100-TB guard), mirrored in the oracle SQL."""
    from m3spark.ops import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return (jaccard_pairs(docs, "doc_id", "text", k=8, stride=4,
                          threshold_num=3, threshold_den=25,
                          max_shingle_freq=50)
            .select("id_a", "id_b", "inter_count", "jaccard"))


def q_sim_topk_embeddings(spark, sf_dir):
    """Brute-force cosine top-10 to the vec_id=0 embedding — similarity
    search baseline (double-precision, sequential dot product)."""
    from m3spark.ops import cosine_topk

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb, "embedding", [float(x) for x in qvec], 10)


def q_text_tokens_documents(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex) + length stats —
    text-analysis family."""
    from m3spark.ops import token_stats

    docs = _t(spark, sf_dir, "documents")
    return token_stats(docs, "doc_id", "text")


def q_dedup_embedding_pairs_baseline(spark, sf_dir):
    """BRUTE-FORCE BASELINE ONLY — O(n²) self-join, id-capped; exists as
    the exact recall denominator for the LSH scale paths
    (q_dedup_embedding_lsh / q_lsh_ann_embeddings).  Never run this
    shape at scale: the headline embedding-dedup operator is
    q_dedup_embedding_lsh (bucketed candidate join, linear in rows)."""
    from m3spark.ops.similarity import _dot, _norm

    emb = (_t(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") < 200)
           .select("vec_id",
                   F.transform("embedding",
                               lambda x: x.cast("double")).alias("v")))
    a, b = emb.alias("a"), emb.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        _norm(F.col("a.v")) * _norm(F.col("b.v")))
    return (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("id_a"),
                     F.col("b.vec_id").alias("id_b"),
                     cos.alias("_c"))
             .where(F.col("_c") >= 0.3)
             .select("id_a", "id_b", F.round("_c", 6).alias("cosine")))


def q_text_quality_documents(spark, sf_dir):
    """Quality scoring (length/diversity/stopword heuristics)."""
    from m3spark.ops import quality

    docs = _t(spark, sf_dir, "documents")
    return quality(docs, "doc_id", "text")


def q_text_langid_documents(spark, sf_dir):
    """Language-ID heuristic (charclass + marker words)."""
    from m3spark.ops import lang_id

    docs = _t(spark, sf_dir, "documents")
    return lang_id(docs, "doc_id", "text")


def q_fingerprint_documents(spark, sf_dir):
    """Document fingerprinting (normalized-content digest)."""
    from m3spark.ops import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return fingerprint(docs, "doc_id", "text")


# ---- scale ops, verified against DuckDB via the portable md5-60bit
# hash (ops.phash) or planted ground truth ----


def q_minhash_pairs_documents(spark, sf_dir):
    """MinHash+LSH candidate pairs (banded signatures) — the dedup scale
    path.  hash_fn='portable' makes every signature value and band
    bucket reproducible in DuckDB, so the oracle mirrors the ENTIRE
    pipeline (shingle → 32 minhashes → 8 band buckets → bucket join →
    signature-agreement score) value-by-value.  The md5 at its core is
    the price of oracle exactness: the production variant is
    q_minhash_pairs_fast (xxhash64, same plan shape, ~2x cheaper map
    stage — the round-2 'minhash regression' was exactly this switch,
    BENCH.md A/B)."""
    from m3spark.ops import minhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_pairs(docs, "doc_id", "text", num_hashes=32, bands=8,
                         hash_fn="portable")


def q_minhash_pairs_fast(spark, sf_dir):
    """Production MinHash+LSH: xxhash64 signatures (single JVM codegen
    op per shingle-hash, no md5) — identical plan shape to the portable
    twin.  FULLY oracle-checked at the driver gate since r7: the
    plain-SQL oracle joins a precomputed signature fixture
    (fixtures/minhash_sigs_sf0.01.parquet, regenerated by
    tools/gen_minhash_fixture.py from the parquet text in pure Python
    via the JVM-parity-pinned XXH64 mirror, tests/test_xxh64.py) and
    replays banding -> candidate join -> agreement in SQL.
    tools/check_oracles.py additionally keeps the fixture-free DuckDB
    scalar-UDF replay of the whole pipeline as a second local check."""
    from m3spark.ops import minhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_pairs(docs, "doc_id", "text", num_hashes=32, bands=8,
                         hash_fn="xxhash64")


def q_simhash_documents(spark, sf_dir):
    """SimHash fingerprints (token-hash bit vote, zero shuffle) with the
    portable hash — DuckDB recomputes every 32-bit fingerprint."""
    from m3spark.ops import simhash

    docs = _t(spark, sf_dir, "documents")
    return (simhash(docs, "doc_id", "text", bits=32, hash_fn="portable")
            .select(F.col("_id").alias("doc_id"), "simhash"))


def q_ann_ivf_embeddings(spark, sf_dir):
    """IVF approximate top-k (KMeans coarse quantizer, probe-3) — the
    partition-pruning ANN scale path, now FULLY oracle-checked via
    planted-recall (r6; the pattern lsh_ann_embeddings established):
    40 perturbed near-duplicates (v -> v + 0.01*v^2, cosine ~0.9999)
    are planted into the index, every original is a query of the BATCH
    IVF (one shared quantizer, broadcast probe sets, per-query windowed
    top-10), and the query reports whether each planted twin was
    recovered plus its exact cosine.  The oracle recomputes the planted
    pairs and cosines in closed form and asserts found_by_ivf for all
    40: a broken quantizer, probe pruning that drops the twin's
    cluster, or a wrong top-k window turns the driver gate red.
    (KMeans itself has no DuckDB analog; the recall bound is the
    oracle-checkable contract — q_ann_ivf_fixed_embeddings remains the
    hash-exact twin of the full pruned top-k.)"""
    from m3spark.ops.similarity import _dot, _norm, ivf_topk_queries

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    planted = emb.where(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.01) * x * x).alias("v"))
    union = emb.unionByName(planted)
    queries = emb.where(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    topk = ivf_topk_queries(union, queries, 10, vec_col="v",
                            n_clusters=8, n_probe=3)
    truth = (emb.where(F.col("vec_id") < 40).alias("o")
             .join(planted.alias("p"),
                   F.col("p.vec_id") == F.col("o.vec_id") + 1000000))
    cos = _dot(F.col("o.v"), F.col("p.v")) / (
        _norm(F.col("o.v")) * _norm(F.col("p.v")))
    pairs = truth.select(F.col("o.vec_id").alias("id_a"),
                         F.col("p.vec_id").alias("id_b"),
                         F.round(cos, 6).alias("cosine"))
    hits = topk.where(F.col("vec_id") >= 1000000).select(
        F.col("q_id").alias("id_a"),
        F.col("vec_id").alias("id_b"),
        F.lit(True).alias("found_by_ivf"))
    return (pairs.join(hits, ["id_a", "id_b"], "left")
                 .select("id_a", "id_b", "cosine",
                         F.coalesce("found_by_ivf", F.lit(False))
                          .alias("found_by_ivf")))


def q_ann_ivf_fixed_embeddings(spark, sf_dir):
    """IVF top-k with a deterministic coarse quantizer (fixed-subsample
    centroids, broadcast map-side assignment, probe-3): same plan shape
    as q_ann_ivf_embeddings but fully reproducible in SQL — the oracle
    recomputes assignment, probing, and the pruned top-k."""
    from m3spark.ops import ivf_topk_fixed

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return ivf_topk_fixed(emb, "embedding", [float(x) for x in qvec], 10,
                          centroid_mod=50, centroid_rem=3, n_probe=3)


def q_ann_ivf_fixed_persisted(spark, sf_dir):
    """Persisted inverted-file variant (r7): the assigned vectors are
    WRITTEN partitioned by cluster (ops/similarity.py
    ivf_persist_fixed — one directory per inverted list), then the
    probe-time read carries `_cluster IN (probe)` into the parquet
    scan's PartitionFilters, so only 3 of 11 inverted-list directories
    are touched (pruning proof: tests/test_ops.py
    test_ivf_persisted_partition_pruning).  Same results as
    ann_ivf_fixed_embeddings — the oracle recomputes assignment,
    probing, and the pruned top-k in SQL."""
    import os
    import tempfile

    from m3spark.ops import ivf_persist_fixed, ivf_topk_fixed_persisted

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    # per-run unique dir (r7 ADVICE): a fixed name under the shared
    # system tmp is a cross-user collision/symlink hazard and two
    # concurrent runs on the same sf_dir would clobber each other
    path = os.path.join(
        tempfile.mkdtemp(prefix="m3spark_ivf_index_"),
        os.path.basename(os.path.normpath(sf_dir)))
    cents = ivf_persist_fixed(emb, path, vec_col="embedding",
                              centroid_mod=50, centroid_rem=3)
    return ivf_topk_fixed_persisted(spark, path, cents, qvec, 10,
                                    vec_col="embedding", n_probe=3)


def q_lsh_ann_embeddings(spark, sf_dir):
    """Random-hyperplane LSH recall on planted near-duplicates — the
    similarity scale path with a hard check: 40 perturbed copies
    (v -> v + 0.01*v^2, cosine ~0.9999) are planted; the query reports
    each planted pair's exact cosine plus whether the 8-table LSH
    bucket join recovered it.  The oracle recomputes the planted pairs
    and cosines in DuckDB and asserts found_by_lsh for all of them —
    a 0-row or low-recall LSH turns the driver gate red."""
    from m3spark.ops.similarity import _dot, _norm, lsh_candidates

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    planted = emb.where(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.01) * x * x).alias("v"))
    union = emb.unionByName(planted)
    cand = lsh_candidates(union, "v", 64, id_col="vec_id",
                          n_planes=12, n_tables=8)
    truth = (emb.where(F.col("vec_id") < 40).alias("o")
             .join(planted.alias("p"),
                   F.col("p.vec_id") == F.col("o.vec_id") + 1000000))
    cos = _dot(F.col("o.v"), F.col("p.v")) / (
        _norm(F.col("o.v")) * _norm(F.col("p.v")))
    pairs = truth.select(F.col("o.vec_id").alias("id_a"),
                         F.col("p.vec_id").alias("id_b"),
                         F.round(cos, 6).alias("cosine"))
    return (pairs.join(cand.select("id_a", "id_b",
                                   F.lit(True).alias("found_by_lsh")),
                       ["id_a", "id_b"], "left")
                 .select("id_a", "id_b", "cosine",
                         F.coalesce("found_by_lsh", F.lit(False))
                          .alias("found_by_lsh")))


def q_dedup_embedding_lsh(spark, sf_dir):
    """HEADLINE embedding-dedup operator: random-hyperplane LSH over the
    FULL table (no id caps anywhere) — candidate pairs come from an
    equi-join on (table, bucket), linear in rows, so the same plan holds
    at 100 TB.  Near-duplicates are planted deterministically (every
    vec_id % 10 == 7 gets a perturbed copy at id+1000000, cosine
    ~0.9999 — a 10% dup rate, the realistic dedup scenario) so ground
    truth is known in closed form.  Output: one row per ground-truth OR
    LSH-found pair with a recall column — the oracle emits exactly the
    planted pairs with found_by_lsh=TRUE, so a missed pair (recall < 1)
    or a false positive (extra row) turns the driver gate red in both
    directions.  Brute force (q_dedup_embedding_pairs_baseline) is kept
    only as the O(n²) recall denominator."""
    from m3spark.ops.similarity import _dot, _norm, lsh_ann_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    planted = emb.where(F.col("vec_id") % 10 == 7).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.01) * x * x).alias("v"))
    union = emb.unionByName(planted)
    lsh = lsh_ann_pairs(union, "v", 64, id_col="vec_id", n_planes=12,
                        min_cosine=0.99, n_tables=8)
    truth_cos = _dot(F.col("o.v"), F.col("p.v")) / (
        _norm(F.col("o.v")) * _norm(F.col("p.v")))
    truth = (emb.alias("o")
             .join(planted.alias("p"),
                   F.col("p.vec_id") == F.col("o.vec_id") + 1000000)
             .select(F.col("o.vec_id").alias("id_a"),
                     F.col("p.vec_id").alias("id_b"),
                     F.round(truth_cos, 6).alias("t_cos")))
    return (truth.join(lsh.withColumnRenamed("cosine", "l_cos"),
                       ["id_a", "id_b"], "full_outer")
                 .select("id_a", "id_b",
                         F.coalesce("t_cos", "l_cos").alias("cosine"),
                         F.col("t_cos").isNotNull().alias("in_truth"),
                         F.col("l_cos").isNotNull().alias("found_by_lsh")))


def q_val_content_documents(spark, sf_dir):
    """Columnar content keywords (§2.9): base64-JSON payloads built from
    a closed form on doc_id, validated entirely JVM-side (rlike +
    is_valid_utf8(unbase64) + try_parse_json + variant predicates for
    the contentSchema — 0 Python stages, see PLANS.md).  The oracle
    predicts each violation (keyword, schema path, level) from the same
    modular arithmetic, so a wrong decode branch, gate, or path slips
    the hash."""
    from m3spark.columnar import ColumnarValidator

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(CONTENT_PAYLOAD_SQL).alias("payload"))
    cv = ColumnarValidator(CONTENT_SCHEMA)
    return (cv.violation_rows(docs, "doc_id")
              .select("doc_id", "keyword", "schema_path", "level"))


RECURSIVE_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$ref": "#/$defs/node",
    "$defs": {"node": {
        "type": "object",
        "required": ["v"],
        "properties": {
            "v": {"type": "integer", "minimum": 0, "maximum": 100},
            "child": {"$ref": "#/$defs/node"},
        },
    }},
}


def q_val_recursive_ref(spark, sf_dir):
    """Recursive $ref compiled COLUMNAR via bounded unroll (§2.8;
    reference lazy resolution property.cljc:204-295): each doc_id
    becomes a linked-list JSON document of depth (doc_id %% 4) + 1 with
    node values (doc_id*7 + depth) %% 120, parsed to a typed struct
    (from_json, pure JVM) and validated against a self-referential
    #/$defs/node schema — inline.py unrolls the productive cycle 8
    levels, the column type nests 4, so the whole plan is 0-Python JVM
    codegen; a table typed deeper than the unroll raises
    UnsupportedKeyword at apply and routes to the Arrow interp instead.
    The oracle re-derives every expected `maximum` violation — doc_id,
    the /child/child/.../v JSON-pointer doc path, and the offending
    value — from the same closed form, so a broken $ref resolution, a
    lost recursion level, a wrong pointer path, or a wrong leaf value
    all hash-mismatch."""
    from m3spark.columnar import ColumnarValidator

    parts_by_depth = []
    for d in range(1, 5):
        parts = []
        for k in range(d):
            parts.append(F.lit('{"v": ' if k == 0
                               else ', "child": {"v": '))
            parts.append(((F.col("doc_id") * 7 + k) % 120).cast("string"))
        parts.append(F.lit("}" * d))
        parts_by_depth.append(F.concat(*parts))
    dep = (F.col("doc_id") % 4 + 1).cast("int")
    doc = parts_by_depth[0]
    for d in range(2, 5):
        doc = F.when(dep == d, parts_by_depth[d - 1]).otherwise(doc)
    ddl = "struct<v:int>"
    for _ in range(3):
        ddl = f"struct<v:int,child:{ddl}>"
    typed = (_t(spark, sf_dir, "documents")
             .select("doc_id", F.from_json(doc, ddl).alias("s"))
             .select("doc_id", F.col("s.v").alias("v"),
                     F.col("s.child").alias("child")))
    cv = ColumnarValidator(RECURSIVE_SCHEMA)
    return (cv.violation_rows(typed, key_col="doc_id")
            .select("doc_id", "keyword", "doc_path", "value"))


DYNAMIC_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$dynamicRef": "#node",
    "$defs": {"node": {
        "$dynamicAnchor": "node",
        "type": "object",
        "required": ["v"],
        "properties": {
            "v": {"type": "integer", "minimum": 0, "maximum": 100},
            "child": {"$dynamicRef": "#node"},
        },
    }},
}


def q_val_dynamic_ref(spark, sf_dir):
    """2020-12 bookended $dynamicRef compiled COLUMNAR via static
    scope-chain simulation (§2.8; reference property.cljc:170-197): in
    the single-resource world the inliner enforces, the dynamic scope
    can only ever hold the root resource, so `$dynamicRef: "#node"`
    resolves statically to the root's $dynamicAnchor and the recursion
    unrolls exactly like plain recursive $ref — the whole plan is
    0-Python JVM codegen.  Same linked-list document construction as
    val_recursive_ref but with distinct constants (values
    (doc_id*11 + depth) %% 130), so the two queries cannot mask each
    other; the oracle re-derives every expected `maximum` violation
    (doc_id, /child/.../v pointer, offending value) in closed form."""
    from m3spark.columnar import ColumnarValidator

    parts_by_depth = []
    for d in range(1, 5):
        parts = []
        for k in range(d):
            parts.append(F.lit('{"v": ' if k == 0
                               else ', "child": {"v": '))
            parts.append(((F.col("doc_id") * 11 + k) % 130).cast("string"))
        parts.append(F.lit("}" * d))
        parts_by_depth.append(F.concat(*parts))
    dep = (F.col("doc_id") % 4 + 1).cast("int")
    doc = parts_by_depth[0]
    for d in range(2, 5):
        doc = F.when(dep == d, parts_by_depth[d - 1]).otherwise(doc)
    ddl = "struct<v:int>"
    for _ in range(3):
        ddl = f"struct<v:int,child:{ddl}>"
    typed = (_t(spark, sf_dir, "documents")
             .select("doc_id", F.from_json(doc, ddl).alias("s"))
             .select("doc_id", F.col("s.v").alias("v"),
                     F.col("s.child").alias("child")))
    cv = ColumnarValidator(DYNAMIC_SCHEMA)
    return (cv.violation_rows(typed, key_col="doc_id")
            .select("doc_id", "keyword", "doc_path", "value"))


def q_dedup_substring(spark, sf_dir):
    """Exact substring (passage) dedup over `documents` (§2.10b
    training-data ops): word 8-grams appearing in >= 2 docs, pure-JVM
    sequence/transform/slice windowing, per-doc array_distinct, then
    ONE aggregate keyed on the 8-byte gram HASH (r7 — the shuffle no
    longer carries full gram strings; a min-gram exemplar travels once
    per map-partition group).  hash_fn='portable' (md5-60bit) so the
    oracle recomputes every key, exemplar, and count with DuckDB list
    slicing — full value-hash check over (gram_hash, gram, n_docs)."""
    from m3spark.ops.dedup import substring_dup_passages

    return substring_dup_passages(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        hash_fn="portable"
    ).select("gram_hash", "gram", "n_docs")


def q_dedup_passage_fraction(spark, sf_dir):
    """Per-document duplicate-passage fraction (r7) — the filter
    signal exact-substring dedup exists to produce: share of each
    doc's 8-gram positions whose gram occurs in >= 2 docs.  Dup-gram
    set and position stream both travel as 8-byte hashes; AQE picks
    the join strategy.  Portable hash => DuckDB recomputes every
    fraction exactly; only docs with at least one duplicated passage
    are emitted (the drop/keep candidates)."""
    from m3spark.ops.dedup import substring_dup_fraction

    return (substring_dup_fraction(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        hash_fn="portable")
        .where(F.col("n_dup_grams") > 0)
        .select("doc_id", "n_grams", "n_dup_grams", "dup_fraction"))


def q_dedup_clusters(spark, sf_dir):
    """Duplicate-CLUSTER resolution (r7): the terminal dedup step.
    Chains the fully-oracle-checked portable MinHash+LSH candidate
    pairs (est_jaccard >= 0.5) into ops/dedup.py dedup_clusters —
    alternating large-star/small-star connected components, all keyed
    DataFrame shuffles, no driver-side union-find — and emits
    (doc_id, cluster_id, is_canonical): cluster_id is the component's
    smallest doc_id, is_canonical marks the one doc per near-dup
    cluster a training-data pipeline would KEEP.  The oracle replays
    the identical pair pipeline in DuckDB and resolves components with
    a recursive-CTE min-label fixpoint — the whole chain
    (shingle → minhash → bands → pairs → clusters) is value-exact."""
    from m3spark.ops import dedup_clusters, minhash_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_pairs(docs, "doc_id", "text", num_hashes=32,
                          bands=8, hash_fn="portable")
    return dedup_clusters(pairs.where(F.col("est_jaccard") >= 0.5))


def q_multimodal_features(spark, sf_dir):
    """Binary-column decode plumbing (Arrow-batched mapInPandas; stub
    decoder with deterministic byte-stat features).  The oracle
    recomputes n_bytes/checksum/feature_mean from the same payload
    bytes in DuckDB, so the whole Arrow round-trip is value-checked."""
    from m3spark.ops import decode_binary_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    return (decode_binary_features(docs, "payload", "doc_id")
            .select("doc_id", "media_type", "n_bytes", "checksum",
                    F.round("feature_mean", 6).alias("feature_mean")))


# deterministic container payloads for the header-parser battery: one
# hex-string closed form shared verbatim by Spark SQL and DuckDB (both
# have hex/lpad/concat/if with identical semantics for these inputs), so
# the oracle builds byte-identical payloads and predicts the parsed
# dimensions in closed form.  Per doc_id d: d%3 picks PNG/JPEG/WAV;
# w=(d%200)+1, h=(d%120)+1; PNG color type 02(rgb,3ch)/06(rgba,4ch);
# JPEG 3 or 1 components; WAV (d%2)+1 channels at 8-24 kHz.
_WAV_RATE = "(8000 + (doc_id % 5) * 4000)"
_WAV_CH = "((doc_id % 2) + 1)"
_WAV_BR = f"({_WAV_RATE} * {_WAV_CH} * 2)"
PAYLOAD_HEX_SQL = f"""
CASE CAST(doc_id % 3 AS INT)
WHEN 0 THEN concat('89504E470D0A1A0A0000000D49484452',
                   lpad(hex((doc_id % 200) + 1), 8, '0'),
                   lpad(hex((doc_id % 120) + 1), 8, '0'),
                   '08', if(doc_id % 2 = 0, '02', '06'), '000000')
WHEN 1 THEN if(doc_id % 2 = 0,
    concat('FFD8FFC0001108', lpad(hex((doc_id % 120) + 1), 4, '0'),
           lpad(hex((doc_id % 200) + 1), 4, '0'),
           '03011100021101031101FFD9'),
    concat('FFD8FFC0000B08', lpad(hex((doc_id % 120) + 1), 4, '0'),
           lpad(hex((doc_id % 200) + 1), 4, '0'), '01011100FFD9'))
ELSE concat('5249464624000000', '57415645', '666D7420', '10000000',
            '0100', lpad(hex({_WAV_CH}), 2, '0'), '00',
            lpad(hex({_WAV_RATE} % 256), 2, '0'),
            lpad(hex(CAST(FLOOR({_WAV_RATE} / 256) AS INT) % 256), 2, '0'),
            '0000',
            lpad(hex({_WAV_BR} % 256), 2, '0'),
            lpad(hex(CAST(FLOOR({_WAV_BR} / 256) AS INT) % 256), 2, '0'),
            lpad(hex(CAST(FLOOR({_WAV_BR} / 65536) AS INT) % 256), 2, '0'),
            '00', lpad(hex({_WAV_CH} * 2), 2, '0'), '00',
            '1000', '6461746100000000')
END"""


# full-pixel PNG battery: complete PNG files in closed form — the IDAT
# carries a STORED (uncompressed) deflate block, so DuckDB can assemble
# the identical bytes AND predict the decoded pixel statistics.  Per
# doc_id d: w=(d%4)+1, h=(d%3)+1, gray (1ch, value v=d%256) when d even
# else rgb (v, v+40, v+80 mod 256); every 13th file is truncated ->
# all-NULL stats (failure path).  Chunk CRCs/adler are dummies — the
# decoder's tolerant mode skips them (ops/multimodal.py module note).
_PXW = "CAST((doc_id % 4) + 1 AS INT)"
_PXH = "CAST((doc_id % 3) + 1 AS INT)"
_PXV = "CAST(doc_id % 256 AS INT)"
_PX_GRAY = f"(doc_id % 2 = 0)"
_PX_CH = f"if({_PX_GRAY}, 1, 3)"
_PX_L = f"({_PXH} * (1 + {_PXW} * {_PX_CH}))"  # raw scanline bytes
_PX_HEX = (
    f"if({_PX_GRAY}, lpad(hex({_PXV}), 2, '0'),"
    f" concat(lpad(hex({_PXV}), 2, '0'),"
    f" lpad(hex(CAST((doc_id + 40) % 256 AS INT)), 2, '0'),"
    f" lpad(hex(CAST((doc_id + 80) % 256 AS INT)), 2, '0')))")
# r6 additions: doc_id%11==3 -> 16-bit grayscale (two-byte samples,
# value (doc_id*97)%65536); doc_id%11==5 -> Adam7-interlaced 8-bit
# grayscale (per-pass scanline counts in closed form for w<=4, h<=3:
# only passes 1/4/5/6/7 can be non-empty).  Both still stored-deflate.
_PX16V = "CAST((doc_id * 97) % 65536 AS INT)"
_PX16HEX = f"lpad(hex({_PX16V}), 4, '0')"
_PX16L = f"({_PXH} * (1 + {_PXW} * 2))"
_PXG = f"lpad(hex({_PXV}), 2, '0')"
_FW2 = f"CAST(FLOOR({_PXW} / 2) AS INT)"
_CW2 = f"CAST(FLOOR(({_PXW} + 1) / 2) AS INT)"
_FH2 = f"CAST(FLOOR({_PXH} / 2) AS INT)"
_CH2H = f"CAST(FLOOR(({_PXH} + 1) / 2) AS INT)"
_ADAM_RAW = (
    f"concat(concat('00', {_PXG}),"                             # pass 1
    f" if({_PXW} > 2, concat('00', {_PXG}), ''),"               # pass 4
    f" if({_PXH} > 2, concat('00', repeat({_PXG}, {_CW2})), ''),"  # p5
    f" if({_FW2} > 0, repeat(concat('00', repeat({_PXG}, {_FW2})),"
    f" {_CH2H}), ''),"                                          # pass 6
    f" repeat(concat('00', repeat({_PXG}, {_PXW})), {_FH2}))")  # pass 7
_ADAM_L = (
    f"(2 + if({_PXW} > 2, 2, 0) + if({_PXH} > 2, 1 + {_CW2}, 0)"
    f" + if({_FW2} > 0, {_CH2H} * (1 + {_FW2}), 0)"
    f" + {_FH2} * (1 + {_PXW}))")
# r7 additions: doc_id%11==7 -> 4-bit grayscale (MSB-first packed
# nibbles, value doc_id%16 everywhere: full bytes are v*17, an odd
# trailing nibble is v*16 with zero padding bits); doc_id%11==2 ->
# 2-bit palette (PLTE entries (50j+5, 50j+25, 50j+45), constant index
# doc_id%4: the packed row byte is idx*85 masked to the top 2w bits).
# Both still stored-deflate with dummy adler/CRCs.
_PX4V = "CAST(doc_id % 16 AS INT)"
_PX4_PAIR = f"lpad(hex({_PX4V} * 17), 2, '0')"
_PX4_TAIL = f"lpad(hex({_PX4V} * 16), 2, '0')"
_PX4_ROW = (f"concat('00', repeat({_PX4_PAIR}, {_FW2}),"
            f" if({_PXW} % 2 = 1, {_PX4_TAIL}, ''))")
_PX4L = f"({_PXH} * (1 + {_CW2}))"
_P2IDX = "CAST(doc_id % 4 AS INT)"
_P2BYTE = (f"lpad(hex(CAST({_P2IDX} * 85 AS INT) & "
           f"(CASE {_PXW} WHEN 1 THEN 192 WHEN 2 THEN 240"
           f" WHEN 3 THEN 252 ELSE 255 END)), 2, '0')")
_P2L = f"({_PXH} * 2)"
_P2_PLTE = "'0000000C504C544505192D374B5F697D919BAFC300000000'"
PIXEL_PNG_HEX_SQL = f"""
if(doc_id % 13 = 0, '89504E470D0A1A0A0000',
if(doc_id % 11 = 7,
concat('89504E470D0A1A0A', '0000000D49484452',
       lpad(hex({_PXW}), 8, '0'), lpad(hex({_PXH}), 8, '0'),
       '04', '00', '000000', '00000000',
       '000000', lpad(hex({_PX4L} + 11), 2, '0'), '49444154',
       '7801', '01', lpad(hex({_PX4L}), 2, '0'), '00',
       lpad(hex(255 - {_PX4L}), 2, '0'), 'FF',
       repeat({_PX4_ROW}, {_PXH}),
       '00000000', '00000000',
       '0000000049454E44AE426082'),
if(doc_id % 11 = 2,
concat('89504E470D0A1A0A', '0000000D49484452',
       lpad(hex({_PXW}), 8, '0'), lpad(hex({_PXH}), 8, '0'),
       '02', '03', '000000', '00000000',
       {_P2_PLTE},
       '000000', lpad(hex({_P2L} + 11), 2, '0'), '49444154',
       '7801', '01', lpad(hex({_P2L}), 2, '0'), '00',
       lpad(hex(255 - {_P2L}), 2, '0'), 'FF',
       repeat(concat('00', {_P2BYTE}), {_PXH}),
       '00000000', '00000000',
       '0000000049454E44AE426082'),
if(doc_id % 11 = 3,
concat('89504E470D0A1A0A', '0000000D49484452',
       lpad(hex({_PXW}), 8, '0'), lpad(hex({_PXH}), 8, '0'),
       '10', '00', '000000', '00000000',
       '000000', lpad(hex({_PX16L} + 11), 2, '0'), '49444154',
       '7801', '01', lpad(hex({_PX16L}), 2, '0'), '00',
       lpad(hex(255 - {_PX16L}), 2, '0'), 'FF',
       repeat(concat('00', repeat({_PX16HEX}, {_PXW})), {_PXH}),
       '00000000', '00000000',
       '0000000049454E44AE426082'),
if(doc_id % 11 = 5,
concat('89504E470D0A1A0A', '0000000D49484452',
       lpad(hex({_PXW}), 8, '0'), lpad(hex({_PXH}), 8, '0'),
       '08', '00', '000001', '00000000',
       '000000', lpad(hex({_ADAM_L} + 11), 2, '0'), '49444154',
       '7801', '01', lpad(hex({_ADAM_L}), 2, '0'), '00',
       lpad(hex(255 - {_ADAM_L}), 2, '0'), 'FF',
       {_ADAM_RAW},
       '00000000', '00000000',
       '0000000049454E44AE426082'),
concat('89504E470D0A1A0A', '0000000D49484452',
       lpad(hex({_PXW}), 8, '0'), lpad(hex({_PXH}), 8, '0'),
       '08', if({_PX_GRAY}, '00', '02'), '000000', '00000000',
       '000000', lpad(hex({_PX_L} + 11), 2, '0'), '49444154',
       '7801', '01', lpad(hex({_PX_L}), 2, '0'), '00',
       lpad(hex(255 - {_PX_L}), 2, '0'), 'FF',
       repeat(concat('00', repeat({_PX_HEX}, {_PXW})), {_PXH}),
       '00000000', '00000000',
       '0000000049454E44AE426082'))))))"""


# full-pixel JPEG battery (r6): complete BASELINE JPEG files in closed
# form — DC-only blocks with a flat q=8 quant table and 1-bit Huffman
# codes make the entropy segment a single byte per block (2*v), and the
# T.81 IDCT of a DC-only block is the constant v*q/8 = v, so every
# pixel is exactly 128+v (gray) or the JFIF YCbCr->RGB transform of
# three such constants (color, exercising round+clamp).  Per doc_id d:
# d even -> grayscale, odd -> 3-component 4:4:4; w=(d%8)+1, h=(d%6)+1
# (single MCU, decoder crops); vy=32+(d%32), vcb=32+(7d%32),
# vcr=32+(11d%32) keep DC category fixed at 6.  Every 13th file is a
# truncated header -> all-NULL stats.
_JPG_W = "CAST((doc_id % 8) + 1 AS INT)"
_JPG_H = "CAST((doc_id % 6) + 1 AS INT)"
_JPG_VY = "(32 + (doc_id % 32))"
_JPG_VCB = "(32 + ((doc_id * 7) % 32))"
_JPG_VCR = "(32 + ((doc_id * 11) % 32))"
_JPG_TABLES = ("'FFDB004300', repeat('08', 64),"
               " 'FFC4001400', '01', repeat('00', 15), '06',"
               " 'FFC4001410', '01', repeat('00', 15), '00'")
JPEG_PIXEL_HEX_SQL = f"""
if(doc_id % 13 = 0, 'FFD8FF',
if(doc_id % 2 = 0,
  concat('FFD8', {_JPG_TABLES},
    'FFC0000B08', lpad(hex({_JPG_H}), 4, '0'),
    lpad(hex({_JPG_W}), 4, '0'), '01011100',
    'FFDA0008010100003F00',
    lpad(hex(2 * {_JPG_VY}), 2, '0'), 'FFD9'),
  concat('FFD8', {_JPG_TABLES},
    'FFC0001108', lpad(hex({_JPG_H}), 4, '0'),
    lpad(hex({_JPG_W}), 4, '0'), '03011100021100031100',
    'FFDA000C03010002000300003F00',
    lpad(hex(2 * {_JPG_VY}), 2, '0'),
    lpad(hex(2 * {_JPG_VCB}), 2, '0'),
    lpad(hex(2 * {_JPG_VCR}), 2, '0'), 'FFD9')))"""


def q_multimodal_jpeg_stats(spark, sf_dir):
    """Dependency-free BASELINE JPEG full-pixel decode (marker walk,
    canonical Huffman entropy decode, dequant + basis-matrix IDCT,
    JFIF color transform — ops/jpeg.py) through the same Arrow
    mapInPandas dispatch as the PNG path.  The oracle rebuilds every
    statistic from the DC-only closed form (constant v*q/8 blocks;
    round-then-clamp YCbCr->RGB for color), so a Huffman mis-decode,
    IDCT normalization slip, or color-matrix bug hash-mismatches."""
    from m3spark.ops.multimodal import decode_image_pixels

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.expr(JPEG_PIXEL_HEX_SQL)).alias("payload"))
    return (decode_image_pixels(docs, "payload", "doc_id")
            .select("doc_id", "width", "height", "channels", "px_min",
                    "px_max", F.round("px_mean", 6).alias("px_mean"),
                    F.round("ch0_mean", 6).alias("ch0_mean"),
                    F.round("ch1_mean", 6).alias("ch1_mean"),
                    F.round("ch2_mean", 6).alias("ch2_mean")))


# full-sample WAV battery (r6): complete PCM files in closed form.
# Per doc_id d: d%3 picks 8-bit mono / 16-bit stereo / 24-bit mono;
# n=(d%5)+1 frames at rate 8000+(d%4)*4000; sample values follow the
# arithmetic progression a + i*b (+ c*k on ch1, scaled x1000-50000 for
# 24-bit so negatives and >16-bit magnitudes are exercised), with
# a=d%97, b=d%7, k=d%11 — every statistic is then a closed-form
# arithmetic-series sum the oracle recomputes.  Every 13th file is a
# truncated header -> all-NULL stats; every 7th-mod-3 file carries an
# ODD-length LIST chunk before data (word-alignment walk).  The RIFF
# size field is a dummy (decoder ignores it, ops/multimodal.py note).
_AU_N = "CAST((doc_id % 5) + 1 AS INT)"
_AU_RATE = "(8000 + (doc_id % 4) * 4000)"
_AU_A = "(doc_id % 97)"
_AU_B = "(doc_id % 7)"
_AU_K = "(doc_id % 11)"


def _le16(u: str) -> str:
    return (f"concat(lpad(hex(({u}) % 256), 2, '0'),"
            f" lpad(hex(CAST(FLOOR(({u}) / 256) AS INT) % 256), 2, '0'))")


def _le24(u: str) -> str:
    return (f"concat({_le16(u)},"
            f" lpad(hex(CAST(FLOOR(({u}) / 65536) AS INT) % 256),"
            f" 2, '0'))")


def _wav_hex(ch: int, bits: int, frame_hex: str, data_len: str) -> str:
    br = f"({_AU_RATE} * {ch} * {bits // 8})"
    return f"""concat('52494646', '24000000', '57415645',
        if(doc_id % 7 = 3, '4C4953540300000041424300', ''),
        '666D7420', '10000000', '0100', '0{ch}00',
        {_le16(_AU_RATE)}, '0000', {_le24(br)}, '00',
        '0{ch * bits // 8}00', lpad(hex({bits}), 2, '0'), '00',
        '64617461', lpad(hex({data_len}), 2, '0'), '000000',
        array_join(transform(sequence(0, {_AU_N} - 1),
                             i -> {frame_hex}), ''))"""


_AU16_U0 = f"({_AU_A} + i * {_AU_B} - 64 + 65536) % 65536"
_AU16_U1 = f"({_AU_A} + i * {_AU_B} + {_AU_K} - 64 + 65536) % 65536"
_AU24_U = (f"(({_AU_A} + i * {_AU_B}) * 1000 - 50000 + 16777216)"
           " % 16777216")
AUDIO_WAV_HEX_SQL = f"""
if(doc_id % 13 = 0, '524946460800000057415645',
CASE CAST(doc_id % 3 AS INT)
WHEN 0 THEN {_wav_hex(1, 8,
    f"lpad(hex({_AU_A} + i * {_AU_B}), 2, '0')", _AU_N)}
WHEN 1 THEN {_wav_hex(2, 16,
    f"concat({_le16(_AU16_U0)}, {_le16(_AU16_U1)})", f"4 * {_AU_N}")}
ELSE {_wav_hex(1, 24, _le24(_AU24_U), f"3 * {_AU_N}")}
END)"""


def q_multimodal_audio_stats(spark, sf_dir):
    """Dependency-free FULL WAV PCM sample decode (RIFF chunk walk +
    8/16/24-bit sample widening, ops/multimodal.py _wav_samples) through
    the Arrow mapInPandas stage: per-file min/max/mean, per-channel
    means, duration.  The oracle rebuilds every statistic from the
    arithmetic-progression closed form as the same exact integer-sum /
    integer-count division, so an endianness slip, sign-extension bug,
    chunk-padding miss, or frame-interleave bug hash-mismatches."""
    from m3spark.ops.multimodal import decode_audio_samples

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.expr(AUDIO_WAV_HEX_SQL)).alias("payload"))
    return (decode_audio_samples(docs, "payload", "doc_id")
            .select("doc_id", "n_frames", "channels", "sample_rate",
                    "bits", "smp_min", "smp_max",
                    F.round("smp_mean", 6).alias("smp_mean"),
                    F.round("ch0_mean", 6).alias("ch0_mean"),
                    F.round("ch1_mean", 6).alias("ch1_mean"),
                    F.round("duration_sec", 9).alias("duration_sec")))


def q_multimodal_pixel_stats(spark, sf_dir):
    """Dependency-free FULL PNG pixel decode (stdlib zlib inflate +
    scanline unfiltering, ops/multimodal.py _png_pixels) through the
    Arrow mapInPandas stage: per-image min/max/mean and per-channel
    means.  The oracle rebuilds the byte-identical files (stored-deflate
    closed form) and predicts every statistic as the same exact
    integer-sum / integer-count division, so a filter-reconstruction,
    inflate-framing, or channel-interleave bug hash-mismatches."""
    from m3spark.ops.multimodal import decode_image_pixels

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.expr(PIXEL_PNG_HEX_SQL)).alias("payload"))
    return (decode_image_pixels(docs, "payload", "doc_id")
            .select("doc_id", "width", "height", "channels", "px_min",
                    "px_max", F.round("px_mean", 6).alias("px_mean"),
                    F.round("ch0_mean", 6).alias("ch0_mean"),
                    F.round("ch1_mean", 6).alias("ch1_mean"),
                    F.round("ch2_mean", 6).alias("ch2_mean")))


def q_multimodal_image_headers(spark, sf_dir):
    """REAL container-header decode battery: deterministic PNG / JPEG /
    WAV payloads are assembled byte-for-byte from doc_id (shared hex
    closed form, PAYLOAD_HEX_SQL), parsed by the dependency-free header
    parsers in ops.multimodal (PNG IHDR, JPEG SOFn marker walk, RIFF fmt
    chunk) inside the Arrow mapInPandas stage, and the oracle predicts
    width/height/channels/n_bytes/feature_mean in closed form from the
    same payloads — a wrong magic branch, endianness slip, or offset bug
    hash-mismatches."""
    from m3spark.ops import decode_binary_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.expr(PAYLOAD_HEX_SQL)).alias("payload"))
    return (decode_binary_features(docs, "payload", "doc_id")
            .select("doc_id", "media_type", "n_bytes", "width", "height",
                    "channels",
                    F.round("feature_mean", 6).alias("feature_mean")))


def q_pages_validate(spark, sf_dir):
    """Flagship north-star pipeline on the synthetic pages table:
    generate → columnar validate → per-partition pass/fail verdicts.
    Uses the portable-hash generator so DuckDB can independently
    re-derive every row's crawl day / url / lang and recompute the
    verdict aggregate the pipeline must produce."""
    from m3spark.pages import generate_pages
    from m3spark.pipeline import validate_pages

    pages = generate_pages(spark, 20_000, hash_fn="portable")
    res = validate_pages(pages)
    return res["partition_verdicts"].orderBy("partition_key")


def q_hll_stats_events(spark, sf_dir):
    """Per-group distinct-count stats on the HLL scale path, checked
    against exact: the query emits the exact distinct count AND a
    boolean asserting the HLL++ estimate landed within its advertised
    5% rsd — the oracle recomputes the exact counts and asserts the
    bound held, so a broken sketch turns the gate red."""
    ev = _t(spark, sf_dir, "events")
    exact = F.count_distinct("user_id")
    est = F.approx_count_distinct("user_id", 0.05)
    return (ev.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   exact.alias("exact_users"),
                   (F.abs(est - exact) <= 0.05 * exact)
                   .alias("hll_within_5pct")))


# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: columnar keyword validation over sf0.001 documents."""
    return q_val_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "val_documents": q_val_documents,
        "val_lineitem": q_val_lineitem,
        "val_events_props": q_val_events_props,
        "val_events_props_struct": q_val_events_props_struct,
        "val_orders_conditional": q_val_orders_conditional,
        "val_ref_defs_orders": q_val_ref_defs_orders,
        "val_unevaluated_events": q_val_unevaluated_events,
        "val_content_documents": q_val_content_documents,
        "val_recursive_ref": q_val_recursive_ref,
        "val_dynamic_ref": q_val_dynamic_ref,
        "dedup_substring_documents": q_dedup_substring,
        "dedup_clusters_documents": q_dedup_clusters,
        "dedup_passage_fraction_documents": q_dedup_passage_fraction,
        "uniqueness_documents": q_uniqueness_documents,
        "ref_orders_without_lineitems": q_ref_orders_without_lineitems,
        "ref_lineitem_orphans": q_ref_lineitem_orphans,
        "stats_documents": q_stats_documents,
        "stats_events_daily": q_stats_events_daily,
        "drift_events_psi": q_drift_events_psi,
        "drift_events_ks": q_drift_events_ks,
        "dedup_exact_documents": q_dedup_exact_documents,
        "dedup_jaccard_documents": q_dedup_jaccard_documents,
        "dedup_embedding_pairs_baseline": q_dedup_embedding_pairs_baseline,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "sim_topk_embeddings": q_sim_topk_embeddings,
        "text_tokens_documents": q_text_tokens_documents,
        "text_quality_documents": q_text_quality_documents,
        "text_langid_documents": q_text_langid_documents,
        "fingerprint_documents": q_fingerprint_documents,
        # scale ops — oracle-checked via portable hash / planted truth
        "minhash_pairs_documents": q_minhash_pairs_documents,
        "minhash_pairs_fast": q_minhash_pairs_fast,
        "simhash_documents": q_simhash_documents,
        "lsh_ann_embeddings": q_lsh_ann_embeddings,
        "ann_ivf_fixed_embeddings": q_ann_ivf_fixed_embeddings,
        "ann_ivf_fixed_persisted": q_ann_ivf_fixed_persisted,
        "multimodal_features": q_multimodal_features,
        "multimodal_image_headers": q_multimodal_image_headers,
        "multimodal_pixel_stats": q_multimodal_pixel_stats,
        "multimodal_audio_stats": q_multimodal_audio_stats,
        "multimodal_jpeg_stats": q_multimodal_jpeg_stats,
        "pages_validate": q_pages_validate,
        "hll_stats_events": q_hll_stats_events,
        # oracle-checked since r6 via the planted-recall bound (the
        # KMeans quantizer has no SQL analog, but the recall contract
        # is closed-form; the fixed-quantizer twin above stays the
        # hash-exact mirror of the full pruned top-k)
        "ann_ivf_embeddings": q_ann_ivf_embeddings,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "val_documents": """
            WITH d AS (SELECT * FROM documents)
            SELECT doc_id, keyword, schema_path, value FROM (
              SELECT doc_id, 'required' AS keyword,
                     '/required' AS schema_path, NULL AS value
                FROM d WHERE doc_id IS NULL OR text IS NULL OR lang IS NULL
                          OR source IS NULL OR n_chars IS NULL
              UNION ALL
              SELECT doc_id, 'minimum', '/properties/doc_id/minimum',
                     doc_id::VARCHAR
                FROM d WHERE doc_id < 0
              UNION ALL
              SELECT doc_id, 'enum', '/properties/lang/enum', lang
                FROM d WHERE lang IS NOT NULL
                         AND lang NOT IN ('en','de','fr','es')
              UNION ALL
              SELECT doc_id, 'pattern', '/properties/source/pattern', source
                FROM d WHERE source IS NOT NULL
                         AND NOT regexp_matches(source, '^src[0-9]$')
              UNION ALL
              SELECT doc_id, 'minimum', '/properties/n_chars/minimum',
                     n_chars::VARCHAR
                FROM d WHERE n_chars < 50
              UNION ALL
              SELECT doc_id, 'maximum', '/properties/n_chars/maximum',
                     n_chars::VARCHAR
                FROM d WHERE n_chars > 500
              UNION ALL
              SELECT doc_id, 'minLength', '/properties/text/minLength',
                     substr(text, 1, 128)
                FROM d WHERE text IS NOT NULL AND length(text) < 1
            ) ORDER BY doc_id, keyword
        """,
        "val_lineitem": """
            WITH li AS (SELECT l_orderkey::varchar || '-' ||
                               l_linenumber::varchar AS line_id, *
                        FROM lineitem)
            SELECT line_id, keyword FROM (
              SELECT line_id, 'exclusiveMaximum' AS keyword
                FROM li WHERE l_quantity IS NOT NULL
                          AND NOT (l_quantity < 50)
              UNION ALL
              SELECT line_id, 'multipleOf'
                FROM li WHERE l_discount IS NOT NULL
                  AND NOT ((l_discount::DECIMAL(38,12) % 0.02::DECIMAL(38,12))
                           = 0)
              UNION ALL
              SELECT line_id, 'maximum'
                FROM li WHERE l_tax IS NOT NULL AND NOT (l_tax <= 0.05)
            ) ORDER BY line_id, keyword
        """,
        # the date leg uses DuckDB's own TRY_CAST(.. AS DATE): an
        # independent calendar implementation checking the JVM
        # closed-form days-in-month/leap predicate
        "val_events_props": """
            SELECT event_id,
                   COALESCE(
                     k IS NOT NULL AND k >= 0 AND k < 50
                     AND TRY_CAST(printf('%04d-%02d-%02d', y, m, k)
                                  AS DATE) IS NOT NULL, FALSE) AS valid
            FROM (SELECT event_id,
                         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                           AS k,
                         1900 + event_id % 200 AS y,
                         user_id % 14 AS m
                  FROM events)
        """,
        "val_events_props_struct": """
            SELECT event_id,
                   COALESCE(
                     k IS NOT NULL AND k >= 0 AND k < 50, FALSE) AS valid
            FROM (SELECT event_id,
                         TRY_CAST(json_extract_string(props, '$.k') AS INT)
                           AS k
                  FROM events)
        """,
        "val_unevaluated_events": """
            SELECT event_id,
                   (b1 OR b2)                 -- anyOf
                   AND (tag IS NULL OR b2)    -- tag claimed only by b2
                   AND extra IS NULL          -- extra never claimed
                     AS valid
            FROM (SELECT event_id,
                         TRY_CAST(json_extract_string(props, '$.k')
                                  AS INT) AS k,
                         event_type AS tag,
                         CASE WHEN event_id % 7 = 0 THEN 'x' END AS extra,
                         COALESCE(TRY_CAST(json_extract_string(props,
                                  '$.k') AS INT) <= 49, FALSE) AS b1,
                         COALESCE(regexp_matches(event_type,
                                  '^(click|view)$'), FALSE) AS b2
                  FROM events)
        """,
        "val_orders_conditional": """
            SELECT o_orderkey,
                   (CASE WHEN o_orderstatus = 'F'
                         THEN COALESCE(o_totalprice >= 5000, TRUE)
                         ELSE COALESCE(o_totalprice >= 2000, TRUE) END
                    AND (o_orderpriority IS NULL
                         OR o_custkey IS NOT NULL)) AS valid
            FROM orders
        """,
        # $defs inlining: each ref'd fragment re-expressed inline;
        # NULL column = missing property (passes all but required)
        "val_ref_defs_orders": """
            SELECT o_orderkey,
                   (o_orderkey IS NOT NULL
                    AND o_orderstatus IS NOT NULL
                    AND COALESCE(o_orderkey >= 0, TRUE)
                    AND COALESCE(o_custkey >= 0, TRUE)
                    AND COALESCE(o_totalprice >= 0
                                 AND o_totalprice <= 400000, TRUE)
                    AND COALESCE(length(o_orderstatus) BETWEEN 1 AND 16
                                 AND o_orderstatus IN ('O', 'F', 'P'),
                                 TRUE)
                    AND COALESCE(length(o_orderpriority)
                                   BETWEEN 1 AND 16
                                 AND regexp_matches(o_orderpriority,
                                     '^[1-5]-[A-Z]+$'), TRUE)) AS valid
            FROM orders
        """,
        # content-keyword battery: the oracle predicts each violation
        # from the doc_id closed form behind CONTENT_PAYLOAD_SQL
        # (2019-09 -> every content violation is a warning; encoding
        # failure suppresses downstream checks; checker registered under
        # contentEncoding so every schema path hangs off it)
        "val_content_documents": """
            WITH b AS (SELECT doc_id, CAST(doc_id % 16 AS INT) AS m
                       FROM documents)
            SELECT doc_id,
                   CASE m WHEN 1 THEN 'minLength' WHEN 2 THEN 'minimum'
                          WHEN 3 THEN 'maximum' WHEN 4 THEN 'required'
                          WHEN 5 THEN 'contentMediaType'
                          WHEN 6 THEN 'contentEncoding'
                          WHEN 9 THEN 'minimum'
                          WHEN 10 THEN 'minLength'
                          WHEN 12 THEN 'oneOf' WHEN 13 THEN 'not'
                          WHEN 14 THEN 'minimum' WHEN 15 THEN 'pattern'
                          ELSE 'type' END AS keyword,
                   '/properties/payload/contentEncoding' ||
                   CASE m
                     WHEN 1 THEN
                       '/contentSchema/properties/name/minLength'
                     WHEN 2 THEN
                       '/contentSchema/properties/port/minimum'
                     WHEN 3 THEN
                       '/contentSchema/properties/port/maximum'
                     WHEN 4 THEN '/contentSchema/required'
                     WHEN 9 THEN '/contentSchema/properties/cfg' ||
                       '/properties/retries/minimum'
                     WHEN 10 THEN
                       '/contentSchema/properties/tags/items/minLength'
                     WHEN 11 THEN '/contentSchema/properties/cfg/type'
                     WHEN 12 THEN '/contentSchema/oneOf'
                     WHEN 13 THEN '/contentSchema/not'
                     WHEN 14 THEN '/contentSchema/if/../then' ||
                       '/properties/port/minimum'
                     WHEN 15 THEN '/contentSchema/allOf/0' ||
                       '/properties/name/pattern'
                     ELSE '' END AS schema_path,
                   'warning' AS level
            FROM b WHERE m IN (1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 13,
                               14, 15)
            UNION ALL
            -- the required-miss doc (m=4) also fails anyOf: neither
            -- port nor sock is present
            SELECT doc_id, 'anyOf' AS keyword,
                   '/properties/payload/contentEncoding' ||
                   '/contentSchema/anyOf' AS schema_path,
                   'warning' AS level
            FROM b WHERE m = 4
        """,
        # recursive-$ref battery: every expected violation re-derived
        # from the closed form (depth = doc_id%4+1, node k value =
        # (doc_id*7+k)%120, maximum 100)
        "val_recursive_ref": """
            WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS INT) + 1 AS dep
                       FROM documents),
            n AS (SELECT doc_id, UNNEST(range(0, dep)) AS k FROM d)
            SELECT doc_id, 'maximum' AS keyword,
                   repeat('/child', CAST(k AS INT)) || '/v' AS doc_path,
                   CAST((doc_id * 7 + k) % 120 AS VARCHAR) AS value
            FROM n WHERE (doc_id * 7 + k) % 120 > 100
        """,
        # same closed form for the $dynamicRef twin, constants 11/130
        "val_dynamic_ref": """
            WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS INT) + 1 AS dep
                       FROM documents),
            n AS (SELECT doc_id, UNNEST(range(0, dep)) AS k FROM d)
            SELECT doc_id, 'maximum' AS keyword,
                   repeat('/child', CAST(k AS INT)) || '/v' AS doc_path,
                   CAST((doc_id * 11 + k) % 130 AS VARCHAR) AS value
            FROM n WHERE (doc_id * 11 + k) % 130 > 100
        """,
        "dedup_substring_documents": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents
                       WHERE len(string_split(text, ' ')) >= 8),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(ws[i:i+7], ' ') AS gram
                  FROM w, UNNEST(generate_series(1, len(ws) - 7)) AS t(i))
            SELECT CAST(('0x' || substr(md5('|' || gram), 1, 15))
                        AS BIGINT) AS gram_hash,
                   MIN(gram) AS gram, COUNT(*)::BIGINT AS n_docs
            FROM g GROUP BY gram_hash HAVING COUNT(*) >= 2
        """,
        "dedup_passage_fraction_documents": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents
                       WHERE len(string_split(text, ' ')) >= 8),
            pos AS (SELECT doc_id,
                           array_to_string(ws[i:i+7], ' ') AS gram
                    FROM w,
                         UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
            gd AS (SELECT DISTINCT doc_id, gram FROM pos),
            dup AS (SELECT CAST(('0x' || substr(md5('|' || gram), 1, 15))
                                AS BIGINT) AS gh
                    FROM gd GROUP BY gh HAVING COUNT(*) >= 2),
            mark AS (SELECT p.doc_id,
                            CASE WHEN d.gh IS NOT NULL THEN 1 END AS m
                     FROM (SELECT doc_id,
                                  CAST(('0x' || substr(md5('|' || gram),
                                                       1, 15))
                                       AS BIGINT) AS gh
                           FROM pos) p
                     LEFT JOIN dup d ON p.gh = d.gh)
            SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
                   COUNT(m)::BIGINT AS n_dup_grams,
                   ROUND(COUNT(m) / COUNT(*), 6) AS dup_fraction
            FROM mark GROUP BY doc_id HAVING COUNT(m) > 0
        """,
        "uniqueness_documents": """
            SELECT lang, source, COUNT(*)::BIGINT AS dup_count
            FROM documents GROUP BY lang, source HAVING COUNT(*) > 1
        """,
        "ref_orders_without_lineitems": """
            SELECT o_orderkey FROM orders o
            WHERE o_orderkey IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        """,
        "ref_lineitem_orphans": """
            SELECT l_partkey, l_orderkey FROM lineitem l
            WHERE l_partkey IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        """,
        "stats_documents": """
            SELECT lang, COUNT(*)::BIGINT AS n_docs,
                   MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
                   ROUND(AVG(n_chars), 4) AS avg_chars,
                   COUNT(DISTINCT source)::BIGINT AS n_sources
            FROM documents GROUP BY lang
        """,
        "stats_events_daily": """
            SELECT CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n_events,
                   MIN(value) AS min_value, MAX(value) AS max_value,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_value,
                   COUNT(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY CAST(ts AS DATE)
        """,
        "drift_events_psi": """
            WITH counts AS (
              SELECT event_type,
                     SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1
                              ELSE 0 END) AS c_a,
                     SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0
                              ELSE 1 END) AS c_b
              FROM events GROUP BY event_type),
            tot AS (SELECT SUM(c_a) AS t_a, SUM(c_b) AS t_b FROM counts)
            SELECT ROUND(SUM((c_a/t_a - c_b/t_b) * LN((c_a/t_a)/(c_b/t_b))),
                         6) AS psi
            FROM counts, tot
        """,
        "drift_events_ks": """
            WITH h AS (
              SELECT FLOOR(value / 25)::BIGINT AS bucket,
                     SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1
                              ELSE 0 END) AS c_a,
                     SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0
                              ELSE 1 END) AS c_b
              FROM events GROUP BY 1),
            tot AS (SELECT SUM(c_a) AS t_a, SUM(c_b) AS t_b FROM h),
            ecdf AS (
              SELECT SUM(c_a) OVER (ORDER BY bucket) / t_a AS cum_a,
                     SUM(c_b) OVER (ORDER BY bucket) / t_b AS cum_b
              FROM h, tot)
            SELECT ROUND(MAX(ABS(cum_a - cum_b)), 6) AS ks FROM ecdf
        """,
        "dedup_exact_documents": """
            SELECT md5(COALESCE(text, CHR(0))) AS content_hash,
                   COUNT(*)::BIGINT AS dup_count
            FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "dedup_jaccard_documents": """
            WITH sh0 AS (
              SELECT DISTINCT doc_id,
                     substr(text, i, 8) AS shingle
              FROM documents,
                   UNNEST(range(1, GREATEST(length(text) - 7, 1) + 1, 4))
                     AS t(i)),
            -- hot-shingle cap (max_shingle_freq=50), mirrored from the
            -- Spark query: shingles shared by >50 docs are dropped
            -- BEFORE sizes and the pair join
            sh AS (
              SELECT * FROM sh0 WHERE shingle IN
                (SELECT shingle FROM sh0
                 GROUP BY shingle HAVING COUNT(*) <= 50)),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     COUNT(*)::BIGINT AS inter_count
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, inter_count,
                   ROUND(inter_count /
                         (sa.sz + sb.sz - inter_count), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE inter_count * 25 >= (sa.sz + sb.sz - inter_count) * 3
        """,
        "sim_topk_embeddings": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0),
            scored AS (
              SELECT vec_id,
                     list_dot_product(embedding::DOUBLE[], qv) /
                     (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) *
                      sqrt(list_dot_product(qv, qv))) AS sim
              FROM embeddings, q)
            SELECT vec_id, ROUND(sim, 6) AS cosine
            FROM scored ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "text_tokens_documents": """
            SELECT doc_id,
                   len(string_split(text, ' '))::INT AS n_tokens,
                   length(text)::INT AS n_chars,
                   len(list_distinct(string_split(text, ' ')))::INT
                     AS distinct_tokens,
                   ROUND(length(replace(text, ' ', '')) /
                         len(string_split(text, ' ')), 6) AS avg_token_len,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+' ||
                       '| ?[^\\s\\p{L}\\p{N}]+|\\s+'))::INT AS n_tokens_bpe
            FROM documents
        """,
        "dedup_embedding_pairs_baseline": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id < 200)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_dot_product(a.v, b.v) /
                         (sqrt(list_dot_product(a.v, a.v)) *
                          sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) /
                  (sqrt(list_dot_product(a.v, a.v)) *
                   sqrt(list_dot_product(b.v, b.v))) >= 0.3
        """,
        # ground truth for the headline LSH dedup: exactly the planted
        # near-dup pairs, found_by_lsh asserted TRUE and in_truth TRUE —
        # a missed pair (recall < 1) or an LSH false positive (extra
        # output row) hash-mismatches in either direction
        "dedup_embedding_lsh": """
            WITH o AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id % 10 = 7),
            p AS (SELECT vec_id, v,
                         list_transform(v, x -> x + 0.01 * x * x) AS vp
                  FROM o)
            SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
                   ROUND(list_dot_product(v, vp) /
                         (sqrt(list_dot_product(v, v)) *
                          sqrt(list_dot_product(vp, vp))), 6) AS cosine,
                   TRUE AS in_truth, TRUE AS found_by_lsh
            FROM p
        """,
        "text_quality_documents": """
            WITH t AS (
              SELECT doc_id,
                     LEAST(length(text) / 500.0, 1.0) AS length_score,
                     len(list_distinct(string_split(text, ' '))) /
                       len(string_split(text, ' '))::DOUBLE AS diversity,
                     len(list_filter(string_split(text, ' '),
                         x -> x IN ('the','a','of','and','to','in','is',
                                    'it','that','was'))) /
                       len(string_split(text, ' '))::DOUBLE AS stop_ratio
              FROM documents)
            SELECT doc_id, ROUND(length_score, 6) AS length_score,
                   ROUND(diversity, 6) AS diversity,
                   ROUND(stop_ratio, 6) AS stopword_ratio,
                   ROUND(0.5 * length_score + 0.4 * diversity +
                         0.1 * stop_ratio, 6) AS quality_score
            FROM t
        """,
        "text_langid_documents": """
            WITH m AS (
              SELECT doc_id, text,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> x IN ('der','die','und','nicht','das')))
                       AS de_hits,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> x IN ('le','la','les','est','une'))) AS fr_hits,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> x IN ('el','los','las','una','que'))) AS es_hits
              FROM documents)
            SELECT doc_id,
                   CASE
                     WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')
                       THEN 'zh'
                     WHEN regexp_matches(text, '[\\x{3040}-\\x{30ff}]')
                       THEN 'ja'
                     WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]')
                       THEN 'ru'
                     WHEN es_hits > de_hits AND es_hits > fr_hits
                          AND es_hits > 0 THEN 'es'
                     WHEN fr_hits > de_hits AND fr_hits > 0 THEN 'fr'
                     WHEN de_hits > 0 THEN 'de'
                     ELSE 'en'
                   END AS predicted_lang
            FROM m
        """,
        "fingerprint_documents": """
            SELECT doc_id,
                   substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                             'g')), 1, 16) AS fingerprint
            FROM documents
        """,
        # full MinHash+LSH mirror via the portable md5-60bit hash
        # (ops/phash.py): shingles -> 32 minhashes -> 8 band buckets ->
        # bucket join -> signature agreement, identical in both engines
        "minhash_pairs_documents": """
            WITH sh AS (
              SELECT DISTINCT doc_id, substr(text, i, 8) AS shingle
              FROM documents,
                   UNNEST(range(1, GREATEST(length(text) - 7, 1) + 1, 4))
                     AS t(i)),
            h30 AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('|' || shingle), 1, 15))
                          AS BIGINT) % 1073741824 AS h30
              FROM sh),
            hs AS (
              SELECT doc_id, j,
                     MIN((h30 * (2 * j + 1)
                          + (j * 2654435761) % 2147483647)
                         % 2147483647) AS hv
              FROM h30, UNNEST(range(0, 32)) AS u(j)
              GROUP BY doc_id, j),
            bandkey AS (
              SELECT doc_id, (j // 4) AS band,
                     CAST(('0x' || substr(md5(string_agg(hv::VARCHAR, ','
                                                         ORDER BY j)),
                                          1, 15)) AS BIGINT) AS bucket
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
            FROM agree
        """,
        # r7: closes the last no_oracle row.  Plain SQL over a
        # PRECOMPUTED SIGNATURE FIXTURE: tools/gen_minhash_fixture.py
        # recomputes every per-(doc, salt) min-hash from the sf0.01
        # text in pure Python (independent shingling + the
        # JVM-parity-pinned XXH64 mirror, tests/test_xxh64.py) — no
        # Spark involved — and the banding -> candidate-join ->
        # agreement pipeline runs here in SQL.  The band key is the
        # comma-joined signature slice, equality-equivalent to Spark's
        # xxhash64 bucket.  Regenerate the fixture after any testdata
        # refresh (command in the script docstring).
        "minhash_pairs_fast": """
            WITH hs AS (
              SELECT doc_id, j, hv
              FROM read_parquet(
                '/root/repo/fixtures/minhash_sigs_sf0.01.parquet')),
            bandkey AS (
              SELECT doc_id, (j // 4) AS band,
                     string_agg(hv::VARCHAR, ',' ORDER BY j) AS bucket
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
            FROM agree
        """,
        # same pair pipeline as minhash_pairs_documents (threshold
        # n_eq >= 16 == est_jaccard >= 0.5), then connected components
        # as a recursive-CTE min-label fixpoint: a label L reaches every
        # node of its component along edges (pruned to L < node, which
        # the component minimum always satisfies), so MIN(lbl) per node
        # IS the component minimum — value-exact vs large-star/small-star
        "dedup_clusters_documents": """
            WITH RECURSIVE sh AS (
              SELECT DISTINCT doc_id, substr(text, i, 8) AS shingle
              FROM documents,
                   UNNEST(range(1, GREATEST(length(text) - 7, 1) + 1, 4))
                     AS t(i)),
            h30 AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('|' || shingle), 1, 15))
                          AS BIGINT) % 1073741824 AS h30
              FROM sh),
            hs AS (
              SELECT doc_id, j,
                     MIN((h30 * (2 * j + 1)
                          + (j * 2654435761) % 2147483647)
                         % 2147483647) AS hv
              FROM h30, UNNEST(range(0, 32)) AS u(j)
              GROUP BY doc_id, j),
            bandkey AS (
              SELECT doc_id, (j // 4) AS band,
                     CAST(('0x' || substr(md5(string_agg(hv::VARCHAR, ','
                                                         ORDER BY j)),
                                          1, 15)) AS BIGINT) AS bucket
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
              GROUP BY c.id_a, c.id_b),
            und AS (
              SELECT id_a AS u, id_b AS v FROM agree WHERE n_eq >= 16
              UNION
              SELECT id_b, id_a FROM agree WHERE n_eq >= 16),
            cc AS (
              SELECT u AS node, u AS lbl FROM und
              UNION
              SELECT e.v AS node, cc.lbl
              FROM cc JOIN und e ON e.u = cc.node
              WHERE cc.lbl < e.v)
            SELECT node AS doc_id, MIN(lbl) AS cluster_id,
                   (node = MIN(lbl)) AS is_canonical
            FROM cc GROUP BY node
        """,
        "simhash_documents": """
            WITH tok AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('sh' || '|' || t), 1, 15))
                          AS BIGINT) AS hv
              FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                    FROM documents)),
            votes AS (
              SELECT doc_id, b,
                     SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END)
                       AS v
              FROM tok, UNNEST(range(0, 32)) AS r(b)
              GROUP BY doc_id, b)
            SELECT doc_id,
                   SUM(CASE WHEN v > 0 THEN (1::BIGINT << b)
                            ELSE 0 END)::BIGINT AS simhash
            FROM votes GROUP BY doc_id
        """,
        # planted-truth recall check: the 40 perturbed copies are
        # reconstructed here; found_by_lsh must be TRUE for every pair
        "lsh_ann_embeddings": """
            WITH o AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id < 40),
            p AS (SELECT vec_id, v,
                         list_transform(v, x -> x + 0.01 * x * x) AS vp
                  FROM o)
            SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
                   ROUND(list_dot_product(v, vp) /
                         (sqrt(list_dot_product(v, v)) *
                          sqrt(list_dot_product(vp, vp))), 6) AS cosine,
                   TRUE AS found_by_lsh
            FROM p
        """,
        # planted-recall bound for the KMeans IVF (r6): the quantizer
        # itself has no SQL analog, but the CONTRACT — every planted
        # near-twin must survive probe pruning into the top-10 — is
        # fully closed-form
        "ann_ivf_embeddings": """
            WITH o AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id < 40),
            p AS (SELECT vec_id, v,
                         list_transform(v, x -> x + 0.01 * x * x) AS vp
                  FROM o)
            SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
                   ROUND(list_dot_product(v, vp) /
                         (sqrt(list_dot_product(v, v)) *
                          sqrt(list_dot_product(vp, vp))), 6) AS cosine,
                   TRUE AS found_by_ivf
            FROM p
        """,
        # deterministic-quantizer IVF: centroid subsample, max-cosine
        # assignment (ties to larger centroid id), probe-3, pruned top-k
        "ann_ivf_fixed_embeddings": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            c AS (SELECT vec_id AS cid, v AS cv FROM e
                  WHERE vec_id % 50 = 3),
            probe AS (
              SELECT cid FROM c, q
              ORDER BY list_dot_product(cv, qv) /
                       (sqrt(list_dot_product(cv, cv)) *
                        sqrt(list_dot_product(qv, qv))) DESC, cid
              LIMIT 3),
            assign AS (
              SELECT vec_id, v, cid AS cluster FROM (
                SELECT e.vec_id, e.v, c.cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY list_dot_product(e.v, c.cv) /
                                  (sqrt(list_dot_product(e.v, e.v)) *
                                   sqrt(list_dot_product(c.cv, c.cv)))
                                  DESC, c.cid DESC) AS rn
                FROM e, c) WHERE rn = 1),
            cand AS (SELECT vec_id, v FROM assign
                     WHERE cluster IN (SELECT cid FROM probe))
            SELECT vec_id, ROUND(sim, 6) AS cosine FROM (
              SELECT vec_id,
                     list_dot_product(v, qv) /
                     (sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(qv, qv))) AS sim
              FROM cand, q)
            ORDER BY sim DESC, vec_id LIMIT 10
        """,
        # the persisted inverted-file variant returns the SAME top-k as
        # the in-memory fixed-quantizer plan (the layout changes the IO
        # shape, not the results) — identical oracle
        "ann_ivf_fixed_persisted": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            c AS (SELECT vec_id AS cid, v AS cv FROM e
                  WHERE vec_id % 50 = 3),
            probe AS (
              SELECT cid FROM c, q
              ORDER BY list_dot_product(cv, qv) /
                       (sqrt(list_dot_product(cv, cv)) *
                        sqrt(list_dot_product(qv, qv))) DESC, cid
              LIMIT 3),
            assign AS (
              SELECT vec_id, v, cid AS cluster FROM (
                SELECT e.vec_id, e.v, c.cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY list_dot_product(e.v, c.cv) /
                                  (sqrt(list_dot_product(e.v, e.v)) *
                                   sqrt(list_dot_product(c.cv, c.cv)))
                                  DESC, c.cid DESC) AS rn
                FROM e, c) WHERE rn = 1),
            cand AS (SELECT vec_id, v FROM assign
                     WHERE cluster IN (SELECT cid FROM probe))
            SELECT vec_id, ROUND(sim, 6) AS cosine FROM (
              SELECT vec_id,
                     list_dot_product(v, qv) /
                     (sqrt(list_dot_product(v, v)) *
                      sqrt(list_dot_product(qv, qv))) AS sim
              FROM cand, q)
            ORDER BY sim DESC, vec_id LIMIT 10
        """,
        # recompute the stub decoder's byte stats from the same utf-8
        # payload (documents text is ASCII at oracle scale, so unicode()
        # == byte value)
        "multimodal_features": """
            SELECT doc_id,
                   'application/octet-stream' AS media_type,
                   octet_length(encode(text))::INT AS n_bytes,
                   substr(md5(text), 1, 16) AS checksum,
                   ROUND(list_sum(list_transform(
                             range(1, length(text) + 1),
                             i -> unicode(substr(text, i, 1)))) /
                         octet_length(encode(text)), 6) AS feature_mean
            FROM documents
        """,
        # header-parser battery: DuckDB assembles the identical payload
        # hex (shared closed form) and predicts every parsed field;
        # feature_mean re-derived by parsing the hex pairs back to bytes
        "multimodal_image_headers": f"""
            WITH hx AS (SELECT doc_id, {PAYLOAD_HEX_SQL} AS ph
                        FROM documents)
            SELECT doc_id,
                   CASE CAST(doc_id % 3 AS INT)
                     WHEN 0 THEN 'image/png'
                     WHEN 1 THEN 'image/jpeg'
                     ELSE 'audio/wav' END AS media_type,
                   CAST(length(ph) / 2 AS INT) AS n_bytes,
                   CAST(CASE WHEN doc_id % 3 = 2 THEN NULL
                        ELSE (doc_id % 200) + 1 END AS INT) AS width,
                   CAST(CASE WHEN doc_id % 3 = 2 THEN NULL
                        ELSE (doc_id % 120) + 1 END AS INT) AS height,
                   CAST(CASE CAST(doc_id % 3 AS INT)
                     WHEN 0 THEN if(doc_id % 2 = 0, 3, 4)
                     WHEN 1 THEN if(doc_id % 2 = 0, 3, 1)
                     ELSE (doc_id % 2) + 1 END AS INT) AS channels,
                   ROUND(list_sum(list_transform(
                           range(0, CAST(length(ph) / 2 AS INT)),
                           i -> ('0x' || substr(ph, CAST(2*i+1 AS INT),
                                                2))::INT)) * 1.0
                         / (length(ph) / 2), 6) AS feature_mean
            FROM hx
        """,
        # full-pixel BASELINE JPEG decode: DC-only closed form — every
        # pixel is 128+v (gray) or the round-then-clamp JFIF transform
        # of three such constants (color); stats follow exactly
        "multimodal_jpeg_stats": """
            WITH b AS (
              SELECT doc_id,
                     CAST((doc_id % 8) + 1 AS INT) AS w,
                     CAST((doc_id % 6) + 1 AS INT) AS h,
                     CAST(160 + (doc_id % 32) AS DOUBLE) AS y,
                     CAST(32 + ((doc_id * 7) % 32) AS DOUBLE) AS cb,
                     CAST(32 + ((doc_id * 11) % 32) AS DOUBLE) AS cr,
                     (doc_id % 13 = 0) AS bad,
                     (doc_id % 2 = 0) AS gray
              FROM documents),
            c AS (
              SELECT *,
                LEAST(255.0, GREATEST(0.0,
                    round(y + 1.402 * cr))) AS r,
                LEAST(255.0, GREATEST(0.0,
                    round(y - 0.344136 * cb - 0.714136 * cr))) AS g,
                LEAST(255.0, GREATEST(0.0,
                    round(y + 1.772 * cb))) AS b2
              FROM b)
            SELECT doc_id,
              CASE WHEN bad THEN NULL ELSE w END AS width,
              CASE WHEN bad THEN NULL ELSE h END AS height,
              CASE WHEN bad THEN NULL WHEN gray THEN 1 ELSE 3 END
                AS channels,
              CAST(CASE WHEN bad THEN NULL WHEN gray THEN y
                   ELSE LEAST(r, g, b2) END AS INT) AS px_min,
              CAST(CASE WHEN bad THEN NULL WHEN gray THEN y
                   ELSE GREATEST(r, g, b2) END AS INT) AS px_max,
              CASE WHEN bad THEN NULL
                   WHEN gray THEN round(y, 6)
                   ELSE round((r + g + b2) / 3.0, 6) END AS px_mean,
              CASE WHEN bad THEN NULL WHEN gray THEN round(y, 6)
                   ELSE round(r, 6) END AS ch0_mean,
              CASE WHEN bad OR gray THEN NULL ELSE round(g, 6) END
                AS ch1_mean,
              CASE WHEN bad OR gray THEN NULL ELSE round(b2, 6) END
                AS ch2_mean
            FROM c
        """,
        # full-sample WAV decode: every statistic predicted from the
        # arithmetic-progression closed form as the SAME exact
        # integer-sum / integer-count division the decoder performs
        "multimodal_audio_stats": """
            WITH b AS (
              SELECT doc_id,
                     CAST((doc_id % 5) + 1 AS BIGINT) AS n,
                     (8000 + (doc_id % 4) * 4000) AS rate,
                     (doc_id % 97) AS a,
                     (doc_id % 7) AS st,
                     (doc_id % 11) AS k,
                     (doc_id % 13 = 0) AS bad,
                     CAST(doc_id % 3 AS INT) AS var
              FROM documents),
            s AS (
              SELECT *, (n * (n - 1)) // 2 AS tri FROM b)
            SELECT doc_id,
              CAST(CASE WHEN bad THEN NULL ELSE n END AS INT)
                AS n_frames,
              CAST(CASE WHEN bad THEN NULL WHEN var = 1 THEN 2
                   ELSE 1 END AS INT) AS channels,
              CAST(CASE WHEN bad THEN NULL ELSE rate END AS INT)
                AS sample_rate,
              CAST(CASE WHEN bad THEN NULL WHEN var = 0 THEN 8
                   WHEN var = 1 THEN 16 ELSE 24 END AS INT) AS bits,
              CAST(CASE WHEN bad THEN NULL
                   WHEN var = 0 THEN a - 128
                   WHEN var = 1 THEN a - 64
                   ELSE a * 1000 - 50000 END AS BIGINT) AS smp_min,
              CAST(CASE WHEN bad THEN NULL
                   WHEN var = 0 THEN a + (n - 1) * st - 128
                   WHEN var = 1 THEN a + (n - 1) * st + k - 64
                   ELSE (a + (n - 1) * st) * 1000 - 50000
                   END AS BIGINT) AS smp_max,
              CASE WHEN bad THEN NULL
                   WHEN var = 0 THEN round(
                     (n * (a - 128) + st * tri) / CAST(n AS DOUBLE), 6)
                   WHEN var = 1 THEN round(
                     (2 * n * (a - 64) + 2 * st * tri + n * k)
                     / CAST(2 * n AS DOUBLE), 6)
                   ELSE round(
                     (n * (a * 1000 - 50000) + 1000 * st * tri)
                     / CAST(n AS DOUBLE), 6) END AS smp_mean,
              CASE WHEN bad THEN NULL
                   WHEN var = 0 THEN round(
                     (n * (a - 128) + st * tri) / CAST(n AS DOUBLE), 6)
                   WHEN var = 1 THEN round(
                     (n * (a - 64) + st * tri) / CAST(n AS DOUBLE), 6)
                   ELSE round(
                     (n * (a * 1000 - 50000) + 1000 * st * tri)
                     / CAST(n AS DOUBLE), 6) END AS ch0_mean,
              CASE WHEN bad OR var <> 1 THEN NULL
                   ELSE round((n * (a - 64 + k) + st * tri)
                              / CAST(n AS DOUBLE), 6) END AS ch1_mean,
              CASE WHEN bad THEN NULL
                   ELSE round(n / CAST(rate AS DOUBLE), 9) END
                AS duration_sec
            FROM s
        """,
        # full-pixel PNG decode: every statistic predicted from the
        # stored-deflate closed form as the SAME exact integer-sum /
        # integer-count division the decoder performs (bit-identical
        # doubles before the shared round)
        "multimodal_pixel_stats": """
            WITH b AS (
              SELECT doc_id,
                     CAST((doc_id % 4) + 1 AS INT) AS w,
                     CAST((doc_id % 3) + 1 AS INT) AS h,
                     CAST(doc_id % 256 AS INT) AS v,
                     CAST((doc_id + 40) % 256 AS INT) AS v1,
                     CAST((doc_id + 80) % 256 AS INT) AS v2,
                     CAST((doc_id * 97) % 65536 AS INT) AS v16,
                     (doc_id % 2 = 0) AS gray,
                     (doc_id % 13 = 0) AS bad,
                     (doc_id % 13 <> 0 AND doc_id % 11 = 3) AS d16,
                     (doc_id % 13 <> 0 AND doc_id % 11 = 5) AS adam,
                     (doc_id % 13 <> 0 AND doc_id % 11 = 7) AS d4,
                     (doc_id % 13 <> 0 AND doc_id % 11 = 2) AS p2,
                     CAST(doc_id % 16 AS INT) AS v4,
                     CAST(50 * (doc_id % 4) AS INT) AS pbase
              FROM documents)
            SELECT doc_id,
              CASE WHEN bad THEN NULL ELSE w END AS width,
              CASE WHEN bad THEN NULL ELSE h END AS height,
              CASE WHEN bad THEN NULL
                   WHEN d16 OR adam OR d4 THEN 1
                   WHEN p2 THEN 3
                   WHEN gray THEN 1
                   ELSE 3 END AS channels,
              CAST(CASE WHEN bad THEN NULL WHEN d16 THEN v16
                   WHEN d4 THEN v4 WHEN p2 THEN pbase + 5
                   WHEN adam OR gray THEN v
                   ELSE least(v, v1, v2) END AS INT) AS px_min,
              CAST(CASE WHEN bad THEN NULL WHEN d16 THEN v16
                   WHEN d4 THEN v4 WHEN p2 THEN pbase + 45
                   WHEN adam OR gray THEN v
                   ELSE greatest(v, v1, v2) END AS INT) AS px_max,
              CASE WHEN bad THEN NULL
                   WHEN d16 THEN round(CAST(v16 AS DOUBLE), 6)
                   WHEN d4 THEN round(CAST(v4 AS DOUBLE), 6)
                   WHEN p2 THEN round(CAST(pbase + 25 AS DOUBLE), 6)
                   WHEN adam OR gray THEN round(CAST(v AS DOUBLE), 6)
                   ELSE round((h * w * (v + v1 + v2))
                              / CAST(h * w * 3 AS DOUBLE), 6) END
                AS px_mean,
              CASE WHEN bad THEN NULL
                   WHEN d16 THEN round(CAST(v16 AS DOUBLE), 6)
                   WHEN d4 THEN round(CAST(v4 AS DOUBLE), 6)
                   WHEN p2 THEN round(CAST(pbase + 5 AS DOUBLE), 6)
                   ELSE round(CAST(v AS DOUBLE), 6) END AS ch0_mean,
              CASE WHEN bad OR d16 OR adam OR d4 THEN NULL
                   WHEN p2 THEN round(CAST(pbase + 25 AS DOUBLE), 6)
                   WHEN gray THEN NULL
                   ELSE round(CAST(v1 AS DOUBLE), 6) END AS ch1_mean,
              CASE WHEN bad OR d16 OR adam OR d4 THEN NULL
                   WHEN p2 THEN round(CAST(pbase + 45 AS DOUBLE), 6)
                   WHEN gray THEN NULL
                   ELSE round(CAST(v2 AS DOUBLE), 6) END AS ch2_mean
            FROM b
        """,
        # independent re-derivation of the flagship pipeline's verdicts:
        # rebuild each generated row's crawl day / url / lang from the
        # portable hash and re-decide validity with DuckDB's own regex
        "pages_validate": """
            WITH ids AS (SELECT UNNEST(range(0, 20000)) AS id),
            base AS (
              SELECT id,
                     CASE WHEN id % 200 = 9 THEN id - 1 ELSE id END AS uid
              FROM ids),
            feat AS (
              SELECT id, uid,
                CAST(('0x' || substr(md5('42|' || id::VARCHAR || '|ts'),
                                     1, 15)) AS BIGINT) % 2592000 AS secs,
                CAST(('0x' || substr(md5('42|' || uid::VARCHAR ||
                                         '|domain'), 1, 15)) AS BIGINT)
                  % 1000 AS dh,
                CAST(('0x' || substr(md5('42|' || uid::VARCHAR || '|tail'),
                                     1, 15)) AS BIGINT) % 10000 AS tail,
                CAST(('0x' || substr(md5('42|' || id::VARCHAR || '|lang'),
                                     1, 15)) AS BIGINT) % 1000 AS lh
              FROM base),
            pages AS (
              SELECT id,
                DATE '1970-01-01'
                  + CAST((1717200000 + secs) // 86400 AS INT) AS day,
                'https://' ||
                  CASE WHEN dh < 150 THEN 'hot-zero.example.com'
                       WHEN dh < 250 THEN 'hot-one.example.com'
                       WHEN dh < 300 THEN 'hot-two.example.com'
                       ELSE 'site-' || tail::VARCHAR || '.example.org'
                  END || '/' ||
                  CASE WHEN uid % 100 = 7 THEN 'bad path/' || uid::VARCHAR
                       ELSE 'p/' || uid::VARCHAR END AS url,
                (id % 100 = 3) AS text_empty,
                CASE WHEN id % 200 = 11 THEN 'xx'
                     WHEN lh < 480 THEN 'en' WHEN lh < 630 THEN 'de'
                     WHEN lh < 750 THEN 'fr' WHEN lh < 850 THEN 'es'
                     WHEN lh < 930 THEN 'zh' WHEN lh < 960 THEN 'ja'
                     WHEN lh < 985 THEN 'pt' ELSE 'ru' END AS lang
              FROM feat),
            checked AS (
              SELECT day,
                (NOT regexp_matches(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*:' ||
                   '[A-Za-z0-9\\-._~:/?#\\[\\]@!$&''()*+,;=%]*$'))::INT
                + text_empty::INT
                + (lang NOT IN ('en','de','fr','es','zh','ja','pt','ru'))
                    ::INT AS n_viol
              FROM pages)
            SELECT day AS partition_key,
                   COUNT(*)::BIGINT AS rows_scanned,
                   SUM((n_viol > 0)::INT)::BIGINT AS invalid_rows,
                   SUM(n_viol)::BIGINT AS violation_count,
                   (SUM((n_viol > 0)::INT) = 0) AS passed
            FROM checked GROUP BY day ORDER BY day
        """,
        # exact distinct counts recomputed; the hll_within_5pct flag is
        # Spark's own honest bound check on its HLL++ estimate
        "hll_stats_events": """
            SELECT event_type, COUNT(*)::BIGINT AS n_rows,
                   COUNT(DISTINCT user_id)::BIGINT AS exact_users,
                   TRUE AS hll_within_5pct
            FROM events GROUP BY event_type
        """,
    }
