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

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# portable-minhash universal-hash constants (mirrored in the DuckDB
# oracle SQL): h30 = md5-60bit(shingle) mod 2^30; h_i = (a_i*h30+b_i) mod p
PORTABLE_H30 = 1 << 30
PORTABLE_P = (1 << 31) - 1


def _py_hash60(s: str | None) -> int:
    """Bit-identical Python mirror of ops.phash.portable_hash60 with the
    default empty salt: conv(substr(md5(concat_ws('|', '', s)), 1, 15),
    16, 10).  concat_ws SKIPS a null argument, so a NULL input hashes
    the bare '' (the lone empty-salt part), not '|'."""
    import hashlib

    data = b"" if s is None else ("|" + s).encode("utf-8")
    return int(hashlib.md5(data).hexdigest()[:15], 16)


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

    ``hash_fn='portable'`` (r8) computes the whole signature per doc in
    ONE Arrow stage: shingling, md5 and the K universal-hash mins run
    vectorized in the Python worker (hashlib md5 is bit-identical to
    the JVM/DuckDB md5, and the shingling mirrors
    sequence/substring/array_distinct exactly — see _py_hash60 and the
    inline notes), so the former explode + K-way MIN aggregate — one
    interpreted higher-order-function pass over every shingle plus a
    keyed shuffle of the shingle stream — collapses to a map-side
    batch computation with NO shuffle at all.  Per-doc work is bounded
    by text length, so the stage carries no skew.

    ``hash_fn='xxhash64'`` (r8) uses the same Arrow shape with the
    NumPy-vectorized XXH64 (ops/xxh64_vec.py — bit-identical to the
    JVM expression, fuzz-pinned against the tested scalar mirror):
    one length-bucketed batch hash per distinct shingle, one fused
    (shingles x salts) salt-chain matrix, segment-min per doc.  The
    former JVM shape exploded the shingle stream through interpreted
    higher-order functions and shuffled it into a 32-way MIN
    aggregate."""
    if hash_fn == "xxhash64":
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        from m3spark.ops.repart import widen_partitions
        from m3spark.ops.xxh64_vec import xxh64_int_chain, xxh64_str42

        salts = np.arange(num_hashes, dtype=np.int64)

        @pandas_udf("array<bigint>")
        def sig_fast(texts: pd.Series) -> pd.Series:
            shingles: list = []
            offsets = [0]
            for text in texts:
                if text is None:
                    # xxhash64 skips a NULL child: the lone exploded
                    # null shingle hashes as just the int salt
                    shingles.append(None)
                else:
                    m = max(len(text) - (k - 1), 1)
                    shingles.extend({text[i:i + k]
                                     for i in range(0, m, stride)})
                offsets.append(len(shingles))
            if not shingles:
                return pd.Series([], dtype=object)
            h1 = xxh64_str42(shingles)
            sig = xxh64_int_chain(h1, salts)
            mins = np.minimum.reduceat(sig, np.asarray(offsets[:-1]),
                                       axis=0)
            return pd.Series(list(mins.tolist()))

        base = widen_partitions(
            df.select(F.col(id_col).alias("_id"), F.col(text_col)))
        return base.select("_id",
                           sig_fast(F.col(text_col)).alias("signature"))

    if hash_fn == "portable":
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        coeffs = [_minhash_coeffs(i) for i in range(num_hashes)]
        a = np.asarray([c[0] for c in coeffs], dtype=np.int64)
        b = np.asarray([c[1] for c in coeffs], dtype=np.int64)

        @pandas_udf("array<bigint>")
        def sig(texts: pd.Series) -> pd.Series:
            out = []
            for text in texts:
                if text is None:
                    # char_shingles(NULL): sequence(1, greatest(n,1))
                    # yields [1]; substring(NULL,..) is NULL; the md5
                    # input collapses to '' (concat_ws skips nulls)
                    shingles = [None]
                else:
                    # sequence(1, greatest(len-k+1, 1), stride) with
                    # 1-based substring == 0-based range(0, m, stride)
                    m = max(len(text) - (k - 1), 1)
                    shingles = list({text[i:i + k]
                                     for i in range(0, m, stride)})
                h30 = np.asarray([_py_hash60(s) % PORTABLE_H30
                                  for s in shingles], dtype=np.int64)
                # (a_i * h30 + b_i) mod p: h30 < 2^30 and a_i < 2^7 at
                # num_hashes<=64, so products stay far inside int64
                out.append((h30[:, None] * a[None, :] + b[None, :])
                           .__mod__(PORTABLE_P).min(axis=0).tolist())
            return pd.Series(out)

        from m3spark.ops.repart import widen_partitions

        base = widen_partitions(
            df.select(F.col(id_col).alias("_id"), F.col(text_col)))
        return base.select("_id", sig(F.col(text_col)).alias("signature"))

    raise ValueError(f"unknown hash_fn {hash_fn!r} "
                     "(expected 'xxhash64' or 'portable')")


def minhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  num_hashes: int = 32, bands: int = 8,
                  k: int = 8, stride: int = 4,
                  hash_fn: str = "xxhash64") -> DataFrame:
    """LSH candidate pairs: signatures banded into ``bands`` buckets;
    pairs sharing any band bucket are candidates, scored by signature
    agreement (estimated Jaccard).  Join is on (band, bucket-hash) —
    bounded fan-out, scales to billions of docs.  With
    ``hash_fn='portable'`` the band bucket is md5 of the comma-joined
    band slice, reproducible in DuckDB.

    The signature table is persisted: the band self-join evaluates its
    input once per side (the broadcast build defeats exchange reuse),
    so without the cache the whole Arrow signature stage — the
    pipeline's dominant compute — ran TWICE.  The result carries the
    handle as ``.cached_sigs``; long-lived sessions should call
    ``result.cached_sigs.unpersist()`` once consumed (the
    jaccard_pairs ``cached_shingles`` convention)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k, stride,
                              hash_fn=hash_fn).persist()

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
    res = cand.select(
        "id_a", "id_b",
        F.round(agree / F.lit(num_hashes), 6).alias("est_jaccard"))
    # handle for targeted cache release (see docstring)
    res.cached_sigs = sigs
    return res


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = 32, hash_fn: str = "xxhash64") -> DataFrame:
    """(id, simhash: bigint) — per-token hash, bit-vote, sign fold.
    Near-dups differ in few bits (compare via bit_count(a ^ b)).
    Single pass, zero shuffle.  ``hash_fn='portable'`` uses the
    md5-60bit hash reproducible in DuckDB (oracle-verifiable).

    r8: the per-token hash + bit vote runs vectorized in one Arrow
    stage (the former ``bits`` aggregate(transform(...)) expressions
    were CodegenFallback — interpreted lambda evaluation per token per
    bit).  Value parity with the old JVM fold: a NULL text folds to
    fingerprint 0 (every vote NULL -> otherwise(0)); tokens keep
    duplicates (no distinct); bit b is set iff the vote is strictly
    positive."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from m3spark.ops.repart import widen_partitions
    from m3spark.ops.xxh64_vec import xxh64_str42

    if hash_fn == "portable":
        def hash_tokens(toks):
            import hashlib
            return np.asarray(
                [int(hashlib.md5(("sh|" + t).encode("utf-8"))
                     .hexdigest()[:15], 16) for t in toks],
                dtype=np.uint64)
    else:
        def hash_tokens(toks):
            return xxh64_str42(toks)

    weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64))

    @pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for j, text in enumerate(texts):
            if text is None:
                continue
            h = hash_tokens(text.split(" "))
            set_bits = ((h[:, None] & weights[None, :]) != 0) \
                .sum(axis=0)
            votes = 2 * set_bits - len(h)
            out[j] = int((weights[votes > 0]).sum())
        return pd.Series(out)

    base = widen_partitions(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)))
    return base.select("_id", fp(F.col(text_col)).alias("simhash"))


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
    The returned DataFrame carries the final materialized edge set as
    ``.cached_edges`` — long-lived sessions that loop over corpora
    should call ``result.cached_edges.unpersist()`` once the result is
    consumed (targeted release, mirroring jaccard_pairs; note the
    attribute lives only on the object returned HERE, not on derived
    DataFrames).  Doc ids must be numeric (or numeric strings): the
    ids are cast to long and rows whose cast nulls out are dropped —
    a non-numeric id column raises instead of silently emitting an
    empty result.  Convergence is checked every TWO rounds (half the
    blocking materialize+collect barriers; a converged graph is a
    fixpoint of both stars, so the extra round is a no-op on the edge
    set); exhausting ``max_iter`` without a stable fingerprint warns —
    partially-converged labels would silently corrupt the keep/drop
    decision.
    No reference analog (m3 has no dedup); training-data mandate.
    """
    import warnings

    from pyspark.sql import Window
    from pyspark.sql import types as T

    for c in (id_a, id_b):
        dt = pairs.schema[c].dataType
        if not isinstance(dt, (T.NumericType, T.StringType)):
            raise TypeError(
                f"dedup_clusters: id column {c!r} has type "
                f"{dt.simpleString()}; numeric (or numeric-string) doc "
                f"ids are required — a non-numeric id casts to NULL "
                f"and would silently drop every edge")

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
        # symmetrize, then hook larger neighbors to the local min.
        # No distinct here: duplicates (one per shared neighbor) do
        # not affect the downstream small-star window-min, output rows
        # are bounded by the symmetrized input, and small_star's own
        # distinct resets multiplicity — dropping it removes one of
        # the round's three shuffles.
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        s = sym.select("u", "v",
                       F.least(F.min("v").over(w), F.col("u")).alias("m"))
        return (s.where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v")))

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
    it = 0
    converged = False
    while it < max_iter:
        # two alternating rounds per materialize+fingerprint barrier:
        # halves the blocking collects and checkpoint jobs; the
        # fixpoint is stable under extra rounds, so the result set is
        # unchanged
        step = small_star(large_star(cur))
        it += 1
        if it < max_iter:
            step = small_star(large_star(step))
            it += 1
        nxt = _materialize(step)
        nfp = _fingerprint(nxt)
        prev_handle.unpersist()
        cur, prev_handle = nxt, nxt
        if nfp == fp:
            converged = True
            break
        fp = nfp
    if not converged and max_iter > 0:
        warnings.warn(
            f"dedup_clusters: fingerprint did not stabilize within "
            f"max_iter={max_iter} rounds — emitted labels may not be "
            f"a fixpoint (nodes can carry non-minimal cluster_ids); "
            f"raise max_iter",
            RuntimeWarning, stacklevel=2)

    # fixpoint star forest: u -> component min; roots appear only as v
    labels = cur.select(F.col("u").alias("doc_id"),
                        F.col("v").alias("cluster_id"))
    roots = (cur.select(F.col("v").alias("doc_id"),
                        F.col("v").alias("cluster_id"))
                .distinct())
    res = (labels.union(roots).distinct()
                 .select("doc_id", "cluster_id",
                         (F.col("doc_id") == F.col("cluster_id"))
                         .alias("is_canonical")))
    # handle for targeted cache release (see docstring)
    res.cached_edges = cur
    return res


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


def _doc_gram_entries_arrow(df: DataFrame, id_col: str, text_col: str,
                            n: int, with_gram: bool) -> DataFrame:
    """One row per (doc, DISTINCT word n-gram) with the portable 60-bit
    hash and the gram's position count, computed in ONE Arrow stage:
    split, sliding windows, dedup and md5 all run batch-side in the
    Python worker (hashlib md5 is bit-identical to JVM/DuckDB md5; the
    split/window construction mirrors F.split(' ')/sequence/slice
    exactly — Python str.split(' ') keeps leading/trailing/consecutive
    empties just like the JVM regex split).  Replaces two interpreted
    higher-order-function passes (distinct + positional gram streams)
    per consumer.  Distinctness is per GRAM STRING (then hashed), so
    intra-doc 60-bit collisions produce two entries with one hash —
    the exact multiplicity the JVM array_distinct path emitted.

    Returns (_id, gram_hash, [gram,] cnt); docs with fewer than n
    words (or NULL text) contribute no rows, like the size(_w) >= n
    filter."""
    from pyspark.sql.functions import pandas_udf

    out_t = ("array<struct<h:bigint,g:string,c:int>>" if with_gram
             else "array<struct<h:bigint,c:int>>")

    @pandas_udf(out_t)
    def entries(texts: pd.Series) -> pd.Series:
        res = []
        for text in texts:
            if text is None:
                res.append([])
                continue
            w = text.split(" ")
            if len(w) < n:
                res.append([])
                continue
            counts: dict = {}
            for i in range(len(w) - n + 1):
                g = " ".join(w[i:i + n])
                counts[g] = counts.get(g, 0) + 1
            if with_gram:
                res.append([(_py_hash60(g), g, c)
                            for g, c in counts.items()])
            else:
                res.append([(_py_hash60(g), c)
                            for g, c in counts.items()])
        return pd.Series(res)

    from m3spark.ops.repart import widen_partitions

    base = widen_partitions(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)))
    e = base.select("_id", F.explode(entries(F.col(text_col))).alias("e"))
    cols = ["_id", F.col("e.h").alias("gram_hash")]
    if with_gram:
        cols.append(F.col("e.g").alias("gram"))
    return e.select(*cols, F.col("e.c").alias("cnt"))


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
    hash so DuckDB reproduces every key, and (r8) computes the per-doc
    distinct gram entries in one Arrow batch stage instead of two
    interpreted higher-order-function passes — same rows, same hashes
    (_doc_gram_entries_arrow).  No reference analog (m3 has no dedup);
    training-data mandate."""
    if hash_fn == "portable":
        ex = _doc_gram_entries_arrow(df, id_col, text_col, n,
                                     with_gram=True)
        return (ex.groupBy("gram_hash")
                  .agg(F.min("gram").alias("gram"),
                       F.count(F.lit(1)).alias("n_docs"))
                  .where(F.col("n_docs") >= min_docs))

    grams = _doc_grams(df, id_col, text_col, n, distinct_per_doc=True)
    return (grams.select(F.xxhash64("gram").alias("gram_hash"), "gram")
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

    Scale shape (r8, portable): ONE Arrow pass builds the per-doc
    (distinct gram hash, position count) entries
    (_doc_gram_entries_arrow) — the r7 shape rebuilt the full gram
    stream TWICE (distinct for the dup set, positional for the
    fraction) through interpreted higher-order functions.  The
    corpus-wide per-gram doc count then rides a window over the single
    hash-keyed shuffle (count of (doc, distinct-gram) entries per
    hash — identical to the old dup-set aggregate), and the doc-keyed
    sum of position counts replaces the positional join.  Nothing
    ever shuffles gram strings, and the entry stream is smaller than
    the old positional stream (distinct grams vs positions).

    ``hash_fn='xxhash64'`` keeps the JVM two-stream shape."""
    if hash_fn == "portable":
        from pyspark.sql import Window

        ex = _doc_gram_entries_arrow(df, id_col, text_col, n,
                                     with_gram=False)
        nd = F.count(F.lit(1)).over(Window.partitionBy("gram_hash"))
        marked = ex.select("_id", "cnt", (nd >= min_docs).alias("_dup"))
        return (marked.groupBy(F.col("_id").alias("doc_id"))
                      .agg(F.sum("cnt").alias("n_grams"),
                           F.sum(F.when(F.col("_dup"), F.col("cnt"))
                                  .otherwise(0)).alias("n_dup_grams"))
                      .select("doc_id", "n_grams", "n_dup_grams",
                              F.round(F.col("n_dup_grams")
                                      / F.col("n_grams"), 6)
                               .alias("dup_fraction")))

    dup = (_doc_grams(df, id_col, text_col, n, distinct_per_doc=True)
           .select(F.xxhash64("gram").alias("gram_hash"))
           .groupBy("gram_hash")
           .agg(F.count(F.lit(1)).alias("_nd"))
           .where(F.col("_nd") >= min_docs)
           .select("gram_hash"))
    pos = (_doc_grams(df, id_col, text_col, n, distinct_per_doc=False)
           .select("_id", F.xxhash64("gram").alias("gram_hash")))
    marked = pos.join(dup.withColumn("_dup", F.lit(1)),
                      "gram_hash", "left")
    return (marked.groupBy(F.col("_id").alias("doc_id"))
                  .agg(F.count(F.lit(1)).alias("n_grams"),
                       F.count("_dup").alias("n_dup_grams"))
                  .select("doc_id", "n_grams", "n_dup_grams",
                          F.round(F.col("n_dup_grams")
                                  / F.col("n_grams"), 6)
                           .alias("dup_fraction")))
