"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run as JVM higher-order functions (zip_with/aggregate);
  top-k is a single ORDER BY ... LIMIT k, which Spark executes as
  per-partition TakeOrdered + driver merge of k rows (no full sort
  shuffle) — linear scan, scales with executors.
- ``lsh_ann_pairs``: random-hyperplane LSH — each vector hashed to a
  signed bit bucket; candidate pairs only join within a bucket.  The
  scale path: the join key is the bucket, so comparisons are local.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(x * x for x in query) ** 0.5
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def cosine_topk(df: DataFrame, vec_col: str, query: list[float], k: int,
                id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity to ``query``; deterministic
    tie-break on id.  Returns (id, cosine)."""
    sim = cosine_similarity(F.col(vec_col), query).alias("_sim")
    return (df.select(F.col(id_col), sim)
              .orderBy(F.col("_sim").desc(), F.col(id_col))
              .limit(k)
              .select(id_col, F.round(F.col("_sim"), 6).alias("cosine")))


def ivf_topk(df: DataFrame, vec_col: str, query: list[float], k: int,
             id_col: str = "vec_id", n_clusters: int = 16,
             n_probe: int = 2, seed: int = 42,
             train_fraction: float = 1.0) -> DataFrame:
    """IVF approximate top-k: MLlib KMeans coarse quantizer; only the
    ``n_probe`` clusters whose centroids are nearest the query are
    scanned (the classic inverted-file ANN recipe).  At scale, train the
    quantizer on a sample (``train_fraction``) and persist the assigned
    table bucketed by cluster so queries prune partitions."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(F.col(id_col), F.col(vec_col),
                     array_to_vector(F.col(vec_col)).alias("_feat"))
    train = feat if train_fraction >= 1.0 else feat.sample(
        fraction=train_fraction, seed=seed)
    model = KMeans(k=n_clusters, seed=seed, featuresCol="_feat",
                   predictionCol="_cluster").fit(train.select("_feat"))
    assigned = model.transform(feat)
    q = np.asarray(query, dtype="float64")
    qn = float(np.linalg.norm(q)) or 1.0
    sims = [float(np.dot(c, q) / ((np.linalg.norm(c) or 1.0) * qn))
            for c in model.clusterCenters()]
    probe = [int(i) for i in np.argsort(sims)[::-1][:n_probe]]
    cand = assigned.where(F.col("_cluster").isin(probe)) \
                   .select(id_col, vec_col)
    return cosine_topk(cand, vec_col, query, k, id_col)


def ivf_topk_queries(df: DataFrame, queries_df: DataFrame, k: int,
                     vec_col: str = "v", id_col: str = "vec_id",
                     q_vec_col: str = "qv", q_id_col: str = "q_id",
                     n_clusters: int = 16, n_probe: int = 2,
                     seed: int = 42,
                     train_fraction: float = 1.0) -> DataFrame:
    """Batch IVF approximate top-k: ONE shared KMeans coarse quantizer,
    per-query probe sets, per-query windowed top-k.

    Scale shape (the production IVF recipe, 100-TB framing):
    - the quantizer trains once (optionally on a sample);
    - cluster assignment is a map-side model.transform — no shuffle;
    - the (query x centroid) ranking runs over a BROADCAST centroid
      table (n_clusters rows), so probe-set selection is map-side;
    - candidates come from broadcasting the small probe table against
      the assigned vectors filtered to probed clusters — the big side
      is scanned once and never shuffled;
    - only the per-query top-k window shuffles, on q_id, sized
      |queries| x k.

    Returns (q_id, vec_id, cosine, rank<=k)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    from m3spark.ops.repart import widen_partitions

    feat = widen_partitions(
        df.select(F.col(id_col), F.col(vec_col))) \
        .select(F.col(id_col), F.col(vec_col),
                array_to_vector(F.col(vec_col)).alias("_feat"))
    train = feat if train_fraction >= 1.0 else feat.sample(
        fraction=train_fraction, seed=seed)
    if train_fraction < 1.0 and \
            train.limit(n_clusters).count() < n_clusters:
        # a thin sample can undershoot k and crash KMeans.fit —
        # fall back to full-data training (r6 advice)
        train = feat
    model = KMeans(k=n_clusters, seed=seed, featuresCol="_feat",
                   predictionCol="_cluster").fit(train.select("_feat"))
    assigned = model.transform(feat).select(id_col, vec_col, "_cluster")
    spark = df.sparkSession
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c])
         for i, c in enumerate(model.clusterCenters())],
        "_cid int, _cv array<double>")
    # zero-norm guard (r6 advice): cosine against a zero vector is
    # undefined — emit NULL (orderBy ... desc ranks nulls last) instead
    # of NaN, which would silently perturb probe/rank ordering
    qsim = F.when((_norm(F.col(q_vec_col)) > 0) & (_norm(F.col("_cv")) > 0),
                  _dot(F.col(q_vec_col), F.col("_cv")) / (
                      _norm(F.col(q_vec_col)) * _norm(F.col("_cv"))))
    probe = (queries_df.crossJoin(F.broadcast(centers))
             .withColumn("_r", F.row_number().over(
                 Window.partitionBy(q_id_col)
                       .orderBy(qsim.desc(), F.col("_cid"))))
             .where(F.col("_r") <= n_probe)
             .select(q_id_col, q_vec_col, F.col("_cid")))
    cand = assigned.join(F.broadcast(probe),
                         assigned["_cluster"] == probe["_cid"])
    # candidate scoring is the volume stage (|probed lists| x queries
    # rows): Arrow-vectorized rowwise cosine instead of interpreted
    # zip_with/aggregate per row (guide §4.2)
    cos = _cos_pairs_arrow(F.col(q_vec_col), F.col(vec_col))
    ranked = (cand.select(q_id_col, id_col, cos.alias("cosine"))
              .withColumn("rank", F.row_number().over(
                  Window.partitionBy(q_id_col)
                        .orderBy(F.col("cosine").desc(), F.col(id_col)))))
    return ranked.where(F.col("rank") <= k)


def _cos_pairs_arrow(a_col, b_col):
    """Rowwise cosine over two array<double> columns, Arrow-vectorized
    (one batched einsum instead of interpreted zip_with/aggregate per
    row — higher-order functions are CodegenFallback, ~30us/row).
    Mirrors the JVM guard `when(norm(a)>0 and norm(b)>0, ...)`: NULL
    when either norm fails the guard (zero-norm or null/ragged input),
    rounded to 6dp HALF_UP like F.round.  One documented divergence:
    a vector containing NaN elements yields NULL here (pandas float64
    cannot carry NaN distinct from null through Arrow) where the JVM
    would yield NaN — unreachable for real embedding data and
    irrelevant to rank membership in the planted-recall contract."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos2(a: pd.Series, b: pd.Series) -> pd.Series:
        res = np.full(len(a), np.nan)
        if len(a) == 0:
            return pd.Series(res)
        good = np.asarray(
            [x is not None and y is not None and len(x) == len(y)
             for x, y in zip(a, b)])
        if good.any():
            A = np.asarray([np.asarray(x, dtype="float64")
                            for x in a[good]])
            B = np.asarray([np.asarray(x, dtype="float64")
                            for x in b[good]])
            na = np.sqrt((A * A).sum(axis=1))
            nb = np.sqrt((B * B).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                c = (A * B).sum(axis=1) / (na * nb)
            c = np.copysign(np.floor(np.abs(c) * 1e6 + 0.5), c) / 1e6
            res[np.flatnonzero(good)] = np.where(
                (na > 0) & (nb > 0), c, np.nan)
        return pd.Series(res)

    return cos2(a_col, b_col)


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (pure function of
    seed — no RNG state, reproducible across runs/executors)."""
    import math
    out = []
    x = seed * 2654435761 % (2**32)
    for i in range(dim):
        x = (1103515245 * (x + i) + 12345) % (2**31)
        out.append(math.cos(x))  # in [-1, 1], deterministic
    return out


def lsh_bucket(vec_col, dim: int, n_planes: int = 12, seed: int = 42):
    """Signed random-projection bucket id (bigint Column)."""
    one = F.lit(1).cast("long")
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, seed + p)])
        bit = F.when(_dot(vec_col, plane) > 0,
                     F.shiftleft(one, p)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def _plane_matrix(dim: int, n_planes: int, n_tables: int, seed: int):
    """dim x (n_tables*n_planes) hyperplane matrix — the same floats
    lsh_bucket uses (plane (t,p) = _hyperplane(dim, seed+1000t+p))."""
    import numpy as np

    cols = [_hyperplane(dim, seed + 1000 * t + p)
            for t in range(n_tables) for p in range(n_planes)]
    return np.asarray(cols, dtype="float64").T


def lsh_buckets_arrow(vec_col, dim: int, n_planes: int = 12,
                      n_tables: int = 1, seed: int = 42):
    """All-tables bucket ids as ONE Arrow-vectorized matmul:
    (batch x dim) @ (dim x tables*planes) -> signs -> 12-bit packs.
    Returns an array<long> Column of length n_tables.

    This is the scale path for multi-table LSH: the pure-JVM
    lsh_bucket builds tables*planes separate aggregate(zip_with(...))
    expressions whose codegen cost dwarfs the data at realistic table
    counts (measured 13s -> sub-second on the dedup headline at 8x12);
    one BLAS matmul per Arrow batch is how a production system hashes."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = _plane_matrix(dim, n_planes, n_tables, seed)
    weights = (np.int64(1) << np.arange(n_planes, dtype="int64"))

    @pandas_udf("array<long>")
    def bucketize(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        # Null / wrong-length vectors must not fail the batch (a single
        # bad row would otherwise make the stacked array ragged and kill
        # the whole stage): mask them out of the matmul and emit null
        # bucket arrays, mirroring the JVM path where a null vector
        # yields null dot products.
        good = s.map(lambda x: x is not None and len(x) == dim)
        if not good.any():
            return pd.Series([None] * len(s), dtype=object)
        v = np.asarray([np.asarray(x, dtype="float64")
                        for x in s[good.values]])
        signs = (v @ P) > 0
        b = signs.reshape(len(v), n_tables, n_planes).astype("int64")
        out = pd.Series([None] * len(s), dtype=object)
        out.iloc[np.flatnonzero(good.values)] = list(b @ weights)
        return out

    return bucketize(vec_col)


def lsh_candidates(df: DataFrame, vec_col: str, dim: int,
                   id_col: str = "vec_id", n_planes: int = 12,
                   n_tables: int = 1, seed: int = 42,
                   engine: str = "arrow") -> DataFrame:
    """Candidate pairs from ``n_tables`` independent hash tables (the
    standard recall amplifier: a pair is a candidate if ALL plane signs
    agree in ANY table).  One explode (n_tables rows/vector) + one
    equi-join on (table, bucket) — no all-pairs stage anywhere.
    Returns distinct (id_a, id_b, v_a, v_b).

    ``engine='arrow'`` (default) hashes with one vectorized matmul per
    Arrow batch (lsh_buckets_arrow); ``'jvm'`` keeps the pure-Column
    expression path (zero Python, right for small table counts).

    The (id, table, bucket) stream is persisted before the self-join:
    the broadcast build side defeats exchange reuse, so without the
    cache the bucketize stage ran once per join side.  The result
    carries the handle as ``.cached_buckets`` for targeted release
    (the jaccard_pairs ``cached_shingles`` convention)."""
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).alias("_v"))
    if engine == "arrow":
        from m3spark.ops.repart import widen_partitions

        base = widen_partitions(base)
        tb = (base.select("_id",
                          F.posexplode(
                              lsh_buckets_arrow(F.col("_v"), dim,
                                                n_planes, n_tables, seed))
                           .alias("t", "bucket")))
    else:
        buckets = F.array(*[
            F.struct(F.lit(t).alias("t"),
                     lsh_bucket(F.col("_v"), dim, n_planes,
                                seed + 1000 * t).alias("bucket"))
            for t in range(n_tables)])
        tb = (base.select("_id", F.explode(buckets).alias("tb"))
                  .select("_id", F.col("tb.t").alias("t"),
                          F.col("tb.bucket").alias("bucket")))
    # r8 (guide §8): the bucket self-join carries only (id, table,
    # bucket) — the r7 shape shipped n_tables COPIES of every vector
    # through the join shuffle.  The heavy payload is re-attached to
    # the (much smaller) distinct pair set afterwards, so each vector
    # crosses a shuffle once per join side instead of once per table.
    # (For inputs with duplicate ids the old distinct was over
    # (id, id, vec, vec); ids are the entity keys here.)
    tb = tb.persist()
    a, b = tb.alias("a"), tb.alias("b")
    pairs = (a.join(b, (F.col("a.t") == F.col("b.t"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a._id") < F.col("b._id")))
              .select(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"))
              .distinct())
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("v_a"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("v_b"))
    res = (pairs.join(va, "id_a").join(vb, "id_b")
                .select("id_a", "id_b", "v_a", "v_b"))
    # handle for targeted cache release (see docstring)
    res.cached_buckets = tb
    return res


def lsh_ann_pairs(df: DataFrame, vec_col: str, dim: int,
                  id_col: str = "vec_id", n_planes: int = 12,
                  min_cosine: float = 0.8, seed: int = 42,
                  n_tables: int = 1) -> DataFrame:
    """Approximate near-neighbor pairs: bucket by random hyperplanes
    (``n_tables`` tables), compare only within buckets, keep cosine >=
    min_cosine.  Returns (id_a, id_b, cosine)."""
    cand = lsh_candidates(df, vec_col, dim, id_col, n_planes, n_tables,
                          seed)
    pair_cos = _dot(F.col("v_a"), F.col("v_b")) / (
        _norm(F.col("v_a")) * _norm(F.col("v_b")))
    res = (cand.select("id_a", "id_b",
                       F.round(pair_cos, 6).alias("cosine"))
               .where(F.col("cosine") >= min_cosine))
    # propagate the bucket-cache handle (see lsh_candidates)
    res.cached_buckets = cand.cached_buckets
    return res


def ivf_topk_fixed(df: DataFrame, vec_col: str, query: list[float], k: int,
                   id_col: str = "vec_id", centroid_mod: int = 50,
                   centroid_rem: int = 3, n_probe: int = 3) -> DataFrame:
    """IVF top-k with a DETERMINISTIC coarse quantizer: the centroids are
    the data vectors whose id satisfies ``id % centroid_mod ==
    centroid_rem`` (a fixed subsample — the classic 'sample your
    centroids' IVF bootstrap, minus the k-means refinement, so the whole
    plan is reproducible in plain SQL for the oracle gate; ivf_topk is
    the k-means-refined production variant).

    Plan shape at scale: centroids are broadcast (tiny), assignment is a
    map-side argmax per vector (no shuffle), probe prunes to n_probe
    inverted lists, then exact top-k scans only those lists."""
    cents = _fixed_codebook(df, vec_col, id_col, centroid_mod,
                            centroid_rem)
    e = _fixed_assign(df, vec_col, id_col, cents)
    probe = _fixed_probe(cents, query, n_probe)
    cand = (e.where(F.col("_cluster").isin(probe))
             .select(F.col("_id").alias(id_col),
                     F.col("_v").alias(vec_col)))
    return cosine_topk(cand, vec_col, query, k, id_col)


def _fixed_codebook(df: DataFrame, vec_col: str, id_col: str,
                    centroid_mod: int, centroid_rem: int):
    return (df.where((F.col(id_col) % centroid_mod) == centroid_rem)
              .select(F.col(id_col).alias("_cid"),
                      F.col(vec_col).alias("_cv"))
              .collect())  # bounded: one row per centroid


def _fixed_assign(df: DataFrame, vec_col: str, id_col: str,
                  cents) -> DataFrame:
    """(_id, _v, _cluster): assignment is an argmax over the codebook
    via a BROADCAST join + max(struct(cos, cid)) aggregation.

    The r7 implementation inlined every centroid as an array literal
    into one per-row array_max expression.  Two problems at scale: the
    expression tree (and generated code) grew LINEARLY with the
    codebook (n_rows/centroid_mod centroids), and higher-order
    functions (zip_with/aggregate) are CodegenFallback — every one of
    the n_rows x n_centroids cosines ran through interpreted, boxed
    lambda evaluation (~140 s for 20k x 400 at sf1.0, nearly pure
    expression-eval overhead).  Like lsh_buckets_arrow, the scale
    path is ONE BLAS matmul per Arrow batch: (batch x dim) @
    (dim x n_cent) -> cosine matrix -> argmax, constant-size plan.

    Argmax semantics are kept identical to the old
    array_max(struct(cos, cid)) JVM ordering: NaN cosine sorts GREATEST
    (so a zero-norm centroid wins over finite scores), equal scores
    tie-break to the LARGEST cid, and a degenerate row (null vector,
    wrong length, null/NaN element => every cosine null or NaN) gets
    the largest cid overall."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from m3spark.ops.repart import widen_partitions

    inner = widen_partitions(df.select(F.col(id_col).alias("_id"),
                                       F.col(vec_col).alias("_v")))
    if not cents:
        return inner.select("_id", "_v",
                            F.lit(None).cast("long").alias("_cluster"))
    cids = np.asarray([int(r["_cid"]) for r in cents], dtype="int64")
    C = np.asarray([[float(x) for x in r["_cv"]] for r in cents],
                   dtype="float64")
    dim = C.shape[1]
    c_norm = np.sqrt((C * C).sum(axis=1))
    fallback_cid = int(cids.max())

    @pandas_udf("long")
    def assign(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        good = s.map(lambda x: x is not None and len(x) == dim)
        out = np.full(len(s), fallback_cid, dtype="int64")
        if good.any():
            V = np.asarray([np.asarray(x, dtype="float64")
                            for x in s[good.values]])
            v_norm = np.sqrt((V * V).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sc = (V @ C.T) / (v_norm[:, None] * c_norm[None, :])
            # NaN sorts greatest in the JVM struct ordering
            sc = np.where(np.isnan(sc), np.inf, sc)
            best = sc.max(axis=1)
            # tie-break: largest cid among the max-score centroids
            win = np.where(sc == best[:, None], cids[None, :], -1) \
                    .max(axis=1)
            out[np.flatnonzero(good.values)] = win
        return pd.Series(out)

    return inner.select("_id", "_v", assign("_v").alias("_cluster"))


def _fixed_probe(cents, query: list[float], n_probe: int) -> list:
    """The n_probe centroid ids nearest the query — driver-side over
    the already-collected codebook."""
    import math
    qn = math.sqrt(sum(x * x for x in query)) or 1.0

    def qcos(cv):
        dot = 0.0
        for a, b in zip(cv, query):
            dot += float(a) * b
        n = math.sqrt(sum(float(a) * float(a) for a in cv)) or 1.0
        return dot / (n * qn)

    return [cid for _, cid in
            sorted(((qcos(r["_cv"]), r["_cid"]) for r in cents),
                   key=lambda t: (-t[0], t[1]))[:n_probe]]


def ivf_persist_fixed(df: DataFrame, path: str, vec_col: str = "v",
                      id_col: str = "vec_id", centroid_mod: int = 50,
                      centroid_rem: int = 3,
                      mode: str = "overwrite"):
    """Materialize the inverted-file layout: assign every vector with
    the deterministic fixed quantizer and WRITE the table partitioned
    by ``_cluster`` (one directory per inverted list — the tables.py
    layout), so probe-time reads prune partitions at the SCAN instead
    of filtering after it.  Returns the codebook to pass to
    :func:`ivf_topk_fixed_persisted`.  This makes the 'persist the
    assigned table bucketed by cluster' promise in :func:`ivf_topk`
    real; with Iceberg on the classpath the same layout comes from
    ``writeTo(...).partitionedBy("_cluster")``."""
    cents = _fixed_codebook(df, vec_col, id_col, centroid_mod,
                            centroid_rem)
    e = _fixed_assign(df, vec_col, id_col, cents)
    (e.repartition("_cluster")
      .write.mode(mode).partitionBy("_cluster").parquet(path))
    return cents


def ivf_topk_fixed_persisted(spark, path: str, cents,
                             query: list[float], k: int,
                             vec_col: str = "v",
                             id_col: str = "vec_id",
                             n_probe: int = 3) -> DataFrame:
    """Probe-time IVF top-k over a persisted inverted-file table: the
    ``_cluster IN (probe set)`` predicate lands in the parquet scan's
    PartitionFilters (proof: tests/test_ops.py
    test_ivf_persisted_partition_pruning), so only the n_probe
    inverted-list directories are read — the IO shape a 100-TB ANN
    serving path needs."""
    probe = _fixed_probe(cents, query, n_probe)
    e = spark.read.parquet(path).where(F.col("_cluster").isin(probe))
    cand = e.select(F.col("_id").alias(id_col),
                    F.col("_v").alias(vec_col))
    return cosine_topk(cand, vec_col, query, k, id_col)
