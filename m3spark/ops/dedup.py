"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All shuffle-aware by construction:

- exact: one keyed count (map-side combinable).
- Jaccard: shingle explode → self-join **on the shingle** (co-partitioned
  by the join key, so only same-shingle rows meet) → per-pair intersection
  counts.  At scale, band the shingles (MinHash) first so the join is on
  LSH buckets, not raw shingles.
- MinHash: per-doc signature via xxhash64 with K fixed salts (one pass,
  no shuffle), banded into LSH buckets; candidate pairs only join within
  a bucket.
- SimHash: token-hash bit-vote, one pass, no shuffle.

Everything stays in JVM expressions (xxhash64/transform/aggregate) —
no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# portable-minhash universal-hash constants (mirrored in the DuckDB
# oracle SQL): h30 = md5-60bit(shingle) mod 2^30; h_i = (a_i*h30+b_i) mod p
PORTABLE_H30 = 1 << 30
PORTABLE_P = (1 << 31) - 1


def _minhash_coeffs(i: int) -> tuple[int, int]:
    return 2 * i + 1, (i * 2654435761) % PORTABLE_P


def exact_duplicates(df: DataFrame, cols: list[str],
                     hash_col: str = "content_hash") -> DataFrame:
    """Groups of rows identical on ``cols``: (content_hash, dup_count),
    dup_count > 1.  One shuffle, partial-aggregated map-side."""
    h = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                               F.lit("\x00"))
                                    for c in cols]))
    return (df.select(h.alias(hash_col))
              .groupBy(hash_col)
              .agg(F.count(F.lit(1)).alias("dup_count"))
              .filter(F.col("dup_count") > 1))


def char_shingles(text_col, k: int = 8, stride: int = 4):
    """Distinct character k-shingles sampled every ``stride`` chars, as an
    array Column — pure JVM (sequence/transform), no UDF."""
    n = F.length(text_col) - (k - 1)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
            lambda i: F.substring(text_col, i, k)))


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  k: int = 8, stride: int = 4,
                  threshold_num: int = 1, threshold_den: int = 2,
                  max_shingle_freq: int | None = None) -> DataFrame:
    """Document pairs with shingle-Jaccard >= num/den (integer-ratio
    threshold so the cutoff is exact, no float boundary).

    Returns (id_a, id_b, inter_count, size_a, size_b, jaccard) with
    id_a < id_b.  The pair-generation join is keyed on the shingle, so
    Spark co-partitions both sides; ``max_shingle_freq`` drops shingles
    shared by more than that many docs before the join — a stop-shingle
    cut that bounds the quadratic fan-out (hot shingles carry no dedup
    signal; note it makes the Jaccard slightly conservative).  For
    corpus-scale near-dup detection use minhash_pairs instead.

    Shuffle budget: the fully-prepped (id, shingle, size) table — after
    the distinct, the stop-shingle cut, and the per-doc size window —
    is persisted MEMORY_AND_DISK, so that whole lineage (one parquet
    scan, one distinct shuffle, one frequency agg, one window shuffle)
    executes ONCE and both sides of the pair join read the cache; the
    per-doc shingle count rides along as a window over ``_id`` instead
    of a separate aggregate joined back twice.  The cached relation is
    exposed as ``result.cached_shingles`` — long-lived sessions that
    loop over corpora should call
    ``result.cached_shingles.unpersist()`` once the returned plan has
    been consumed (targeted release; ``spark.catalog.clearCache()``
    would drop unrelated caches too).  NOTE: the attribute lives only
    on the DataFrame object returned HERE — any further
    transformation (``.where``/``.select``/...) returns a new
    DataFrame without it, so grab the handle before deriving plans.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    sh = (df.select(F.col(id_col).alias("_id"),
                    F.explode(char_shingles(F.col(text_col), k, stride))
                     .alias("shingle"))
            .distinct())
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = (sh.join(F.broadcast(freq.where(F.col("_f") > max_shingle_freq)
                                      .select("shingle")),
                      "shingle", "left_anti"))
    # per-doc shingle count attached in-line (constant within each _id)
    sh = (sh.select("_id", "shingle",
                    F.count(F.lit(1)).over(Window.partitionBy("_id"))
                     .alias("sz"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    # both sides read the persisted table; AQE picks broadcast at tiny
    # SF and sort-merge at corpus scale — either way the prep lineage
    # is not recomputed per side
    a = sh.alias("a")
    b = sh.alias("b")
    out = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                  & (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter_count"),
                 F.min("a.sz").alias("size_a"),
                 F.min("b.sz").alias("size_b")))
    union = F.col("size_a") + F.col("size_b") - F.col("inter_count")
    res = (out.where(F.col("inter_count") * threshold_den
                     >= union * threshold_num)
              .select("id_a", "id_b", "inter_count", "size_a", "size_b",
                      F.round(F.col("inter_count") / union, 6)
                       .alias("jaccard")))
    # handle for targeted cache release (see docstring)
    res.cached_shingles = sh
    return res


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 32, k: int = 8,
                       stride: int = 4,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """(id, signature: array<bigint>) — min over shingles of
    hash(shingle, salt_i) per salt.

    ``hash_fn``: 'xxhash64' (default, fastest JVM op) or 'portable'
    (md5-60bit via ops.phash — bit-identical in DuckDB, so the whole
    MinHash pipeline is oracle-verifiable value-by-value).

    Explode-then-aggregate shape: shingles are computed ONCE per row,
    then num_hashes MIN aggregates run with map-side partial combine —
    one shuffle of one row per doc, regardless of text size.  (The
    expression-only alternative — num_hashes array_min(transform(...)) —
    recomputes the shingle array per salt: ~30x the work.)"""
    from m3spark.ops.phash import portable_hash60

    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(char_shingles(F.col(text_col), k, stride)).alias("shingle"))

    if hash_fn == "portable":
        # ONE md5 per shingle, then K universal-hash derivations
        # (a_i*h30 + b_i) mod p — 30-bit base keeps every product inside
        # int64, and DuckDB reproduces the exact values
        # (tools/check_oracles.py minhash_pairs_documents)
        base = (portable_hash60(F.col("shingle")) % F.lit(PORTABLE_H30))
        sh = sh.select("_id", base.alias("_h30"))

        def h(i):
            a, b = _minhash_coeffs(i)
            return (F.col("_h30") * F.lit(a) + F.lit(b)) % F.lit(PORTABLE_P)
    else:
        def h(i):
            return F.xxhash64(F.col("shingle"), F.lit(i))

    aggs = [F.min(h(i)).alias(f"_h{i}") for i in range(num_hashes)]
    return (sh.groupBy("_id").agg(*aggs)
              .select("_id", F.array(*[F.col(f"_h{i}")
                                       for i in range(num_hashes)])
                      .alias("signature")))


def minhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  num_hashes: int = 32, bands: int = 8,
                  k: int = 8, stride: int = 4,
                  hash_fn: str = "xxhash64") -> DataFrame:
    """LSH candidate pairs: signatures banded into ``bands`` buckets;
    pairs sharing any band bucket are candidates, scored by signature
    agreement (estimated Jaccard).  Join is on (band, bucket-hash) —
    bounded fan-out, scales to billions of docs.  With
    ``hash_fn='portable'`` the band bucket is md5 of the comma-joined
    band slice, reproducible in DuckDB."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k, stride,
                              hash_fn=hash_fn)

    def bucket_of(b):
        sl = F.slice(F.col("signature"), b * rows_per_band + 1,
                     rows_per_band)
        if hash_fn == "portable":
            joined = F.array_join(F.transform(sl, lambda x:
                                              x.cast("string")), ",")
            return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10) \
                    .cast("long")
        return F.xxhash64(sl.cast("string"))

    band_cols = [
        F.struct(F.lit(b).alias("band"), bucket_of(b).alias("bucket"))
        for b in range(bands)]
    exploded = (sigs.select("_id", "signature",
                            F.explode(F.array(*band_cols)).alias("bb"))
                    .select("_id", "signature",
                            F.col("bb.band").alias("band"),
                            F.col("bb.bucket").alias("bucket")))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a._id") < F.col("b._id")))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a.signature").alias("sig_a"),
                     F.col("b.signature").alias("sig_b"))
             .distinct())
    agree = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
        lambda m: m))
    return cand.select(
        "id_a", "id_b",
        F.round(agree / F.lit(num_hashes), 6).alias("est_jaccard"))


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = 32, hash_fn: str = "xxhash64") -> DataFrame:
    """(id, simhash: bigint) — per-token hash, bit-vote, sign fold.
    Near-dups differ in few bits (compare via bit_count(a ^ b)).
    Single pass, zero shuffle, pure JVM.  ``hash_fn='portable'`` uses
    the md5-60bit hash reproducible in DuckDB (oracle-verifiable)."""
    from m3spark.ops.phash import portable_hash60

    one = F.lit(1).cast("long")
    tokens = F.split(F.col(text_col), " ")
    if hash_fn == "portable":
        hashes = F.transform(tokens,
                             lambda t: portable_hash60(t, salt="sh"))
    else:
        hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _vote(b):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.shiftleft(one, b)) != 0, 1).otherwise(-1)

    votes = [F.aggregate(hashes, F.lit(0), _vote(b)) for b in range(bits)]
    fp = F.lit(0).cast("long")
    for b, v in enumerate(votes):
        fp = fp.bitwiseOR(F.when(v > 0, F.shiftleft(one, b))
                           .otherwise(F.lit(0).cast("long")))
    return df.select(F.col(id_col).alias("_id"), fp.alias("simhash"))


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b", max_iter: int = 30) -> DataFrame:
    """Duplicate-cluster resolution: connected components over
    candidate-pair edges -> (doc_id, cluster_id, is_canonical).

    The terminal dedup step: every near-dup op in this module emits
    PAIRS; the drop decision needs transitive clusters (a~b, b~c =>
    {a,b,c} one cluster, keep one).  Alternating large-star /
    small-star (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — O(log^2 n) rounds on any graph, each
    round two keyed shuffles — no driver-side union-find, the edge
    set is never collected.

    - large-star: per node u, hook every LARGER neighbor to
      m = min(N(u) + {u}).
    - small-star: orient edges big->small; per node u hook u and all
      its (smaller) neighbors to m = min(N(u)).

    Both are a window-min over the edge's source key (one shuffle)
    plus a distinct (second shuffle); every emitted edge keeps the
    big->small orientation, and the fixpoint is a star forest: each
    node points at its component minimum.  Convergence is detected by
    a (count, hash-xor) fingerprint — one single-row aggregate per
    round, the only driver-side data.  Lineage is truncated each
    round via localCheckpoint (on a cluster, set a reliable
    checkpoint dir and ``.checkpoint()`` takes over automatically).

    Returns one row per node seen in ``pairs``: cluster_id is the
    smallest doc id of the component, is_canonical marks the keeper.
    No reference analog (m3 has no dedup); training-data mandate.
    """
    from pyspark.sql import Window

    spark = pairs.sparkSession
    edges = (pairs.select(F.col(id_a).cast("long").alias("u"),
                          F.col(id_b).cast("long").alias("v"))
                  .where(F.col("u").isNotNull() & F.col("v").isNotNull()
                         & (F.col("u") != F.col("v")))
                  .select(F.greatest("u", "v").alias("u"),
                          F.least("u", "v").alias("v"))
                  .distinct())

    w = Window.partitionBy("u")

    def large_star(e):
        # symmetrize, then hook larger neighbors to the local min
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        s = sym.select("u", "v",
                       F.least(F.min("v").over(w), F.col("u")).alias("m"))
        return (s.where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .distinct())

    def small_star(e):
        # edges already big->small, so min(N(u) + {u}) = min(N(u))
        s = e.select("u", "v", F.min("v").over(w).alias("m"))
        hooked = (s.where(F.col("v") != F.col("m"))
                   .select(F.col("v").alias("u"), F.col("m").alias("v")))
        self_edge = s.select("u", F.col("m").alias("v"))
        return hooked.union(self_edge).distinct()

    def _materialize(e):
        if spark.sparkContext.getCheckpointDir() is not None:
            return e.checkpoint(eager=True)
        return e.localCheckpoint(eager=True)

    def _fingerprint(e):
        row = e.agg(F.count(F.lit(1)).alias("n"),
                    F.bit_xor(F.xxhash64("u", "v")).alias("h")).collect()[0]
        return row["n"], row["h"]

    cur = _materialize(edges)
    fp = _fingerprint(cur)
    prev_handle = cur
    for _ in range(max_iter):
        nxt = _materialize(small_star(large_star(cur)))
        nfp = _fingerprint(nxt)
        prev_handle.unpersist()
        cur, prev_handle = nxt, nxt
        if nfp == fp:
            break
        fp = nfp

    # fixpoint star forest: u -> component min; roots appear only as v
    labels = cur.select(F.col("u").alias("doc_id"),
                        F.col("v").alias("cluster_id"))
    roots = (cur.select(F.col("v").alias("doc_id"),
                        F.col("v").alias("cluster_id"))
                .distinct())
    return (labels.union(roots).distinct()
                  .select("doc_id", "cluster_id",
                          (F.col("doc_id") == F.col("cluster_id"))
                          .alias("is_canonical")))


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int,
               distinct_per_doc: bool) -> DataFrame:
    """(_id, gram) word n-gram stream — sliding windows via
    sequence/transform/slice, pure JVM.  ``distinct_per_doc`` dedupes
    the gram array BEFORE the explode (array_distinct, still local),
    so downstream per-gram doc counts are a plain map-side-combinable
    count — no two-phase distinct aggregate needed."""
    w = F.split(F.col(text_col), " ")
    grams = F.transform(F.sequence(F.lit(1), F.size("_w") - n + 1),
                        lambda i: F.array_join(F.slice("_w", i, n), " "))
    if distinct_per_doc:
        grams = F.array_distinct(grams)
    return (df.select(F.col(id_col).alias("_id"), w.alias("_w"))
              .where(F.size("_w") >= n)
              .select("_id", F.explode(grams).alias("gram")))


def substring_dup_passages(df: DataFrame, id_col: str, text_col: str,
                           n: int = 8, min_docs: int = 2,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Exact substring (passage) dedup: word n-grams appearing in at
    least ``min_docs`` documents -> (gram_hash, gram, n_docs).

    The training-data "exact substring deduplication" primitive
    (repeated boilerplate/passages across a crawl; cf. Lee et al. 2021
    deduplicating-training-data): whitespace word split, sliding
    n-gram windows via sequence/transform/slice (pure JVM, zero
    Python), per-doc array_distinct BEFORE the explode, then ONE
    aggregate keyed on the 8-byte gram hash.

    Scale shape (r7, replaces the r6 gram-string key): the shuffle key
    is ``xxhash64(gram)`` — 8 bytes instead of the ~n-word string —
    and because grams are already doc-distinct the doc count is a
    plain map-side-combinable ``count``, not a two-phase
    count-distinct: each map partition emits one (hash, partial_count,
    min-gram exemplar) row per distinct gram it saw, so shuffle bytes
    scale with distinct-grams-per-partition, not gram occurrences.
    The exemplar is ``min(gram)`` (deterministic, oracle-matchable);
    boilerplate grams remain the natural skew keys — AQE skew
    handling applies on the single hash-keyed shuffle.  64-bit hash
    collisions conflate grams (standard for this op; the exemplar
    shows one survivor).  ``hash_fn='portable'`` uses the md5-60bit
    hash (ops.phash) so DuckDB reproduces every key.  No reference
    analog (m3 has no dedup); training-data mandate."""
    from m3spark.ops.phash import portable_hash60

    grams = _doc_grams(df, id_col, text_col, n, distinct_per_doc=True)
    h = (portable_hash60(F.col("gram")) if hash_fn == "portable"
         else F.xxhash64("gram"))
    return (grams.select(h.alias("gram_hash"), "gram")
                 .groupBy("gram_hash")
                 .agg(F.min("gram").alias("gram"),
                      F.count(F.lit(1)).alias("n_docs"))
                 .where(F.col("n_docs") >= min_docs))


def substring_dup_fraction(df: DataFrame, id_col: str, text_col: str,
                           n: int = 8, min_docs: int = 2,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Per-document duplicate-passage fraction — the actual filter
    signal: (doc_id, n_grams, n_dup_grams, dup_fraction) where
    dup_fraction is the share of the doc's gram POSITIONS whose gram
    occurs in >= ``min_docs`` documents corpus-wide.

    Scale shape: the corpus-duplicated gram set is computed hash-keyed
    (see :func:`substring_dup_passages`, here without the exemplar so
    the dup-set shuffle carries (hash, count) only); the per-position
    stream carries (doc_id, hash) — 16 bytes/row — into a hash-keyed
    left-semi-style join (AQE broadcasts the dup set when small,
    sort-merges co-partitioned on the hash otherwise), then one
    doc-keyed count.  Nothing ever shuffles gram strings."""
    from m3spark.ops.phash import portable_hash60

    def h(c):
        return (portable_hash60(F.col(c)) if hash_fn == "portable"
                else F.xxhash64(c))

    dup = (_doc_grams(df, id_col, text_col, n, distinct_per_doc=True)
           .select(h("gram").alias("gram_hash"))
           .groupBy("gram_hash")
           .agg(F.count(F.lit(1)).alias("_nd"))
           .where(F.col("_nd") >= min_docs)
           .select("gram_hash"))
    pos = (_doc_grams(df, id_col, text_col, n, distinct_per_doc=False)
           .select("_id", h("gram").alias("gram_hash")))
    marked = pos.join(dup.withColumn("_dup", F.lit(1)),
                      "gram_hash", "left")
    return (marked.groupBy(F.col("_id").alias("doc_id"))
                  .agg(F.count(F.lit(1)).alias("n_grams"),
                       F.count("_dup").alias("n_dup_grams"))
                  .select("doc_id", "n_grams", "n_dup_grams",
                          F.round(F.col("n_dup_grams")
                                  / F.col("n_grams"), 6)
                           .alias("dup_fraction")))
