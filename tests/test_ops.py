"""Tests for the training-data ops: dedup, similarity, text, multimodal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from m3spark.ops import (
    cosine_topk, decode_binary_features, exact_duplicates, fingerprint,
    jaccard_pairs, lang_id, lsh_ann_pairs, minhash_pairs, quality, simhash,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (5, "der hund und die katze und das haus und nicht"),
        (6, "le chat est une la les merveille est une belle"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def test_exact_duplicates(docs):
    dups = exact_duplicates(docs, ["text"]).collect()
    assert len(dups) == 1 and dups[0]["dup_count"] == 2


def test_jaccard_pairs(docs):
    pairs = jaccard_pairs(docs, "doc_id", "text", k=4, stride=1,
                          threshold_num=1, threshold_den=2)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 4) in got and got[(1, 4)] == 1.0     # exact dup
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1  # near-dup
    assert not any(3 in p for p in got)               # unrelated doc


def test_jaccard_cache_handle_unpersists(docs):
    """r6 advice: the persisted shingle table is exposed as
    ``cached_shingles`` so long-lived sessions can release it without
    clearing unrelated caches."""
    pairs = jaccard_pairs(docs, "doc_id", "text", k=4, stride=1,
                          threshold_num=1, threshold_den=2)
    pairs.collect()
    sh = pairs.cached_shingles
    assert sh.storageLevel.useMemory or sh.storageLevel.useDisk
    sh.unpersist(blocking=True)
    assert not (sh.storageLevel.useMemory or sh.storageLevel.useDisk)


def test_jaccard_hot_shingle_cap(docs):
    """max_shingle_freq drops shingles shared by more than N docs before
    the pair join (bounds the quadratic fan-out); near-dup pairs that
    share rare shingles survive."""
    pairs = jaccard_pairs(docs, "doc_id", "text", k=4, stride=1,
                          threshold_num=1, threshold_den=2,
                          max_shingle_freq=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 4) in got  # exact dups share every (rare) shingle
    # a universal shingle shared by >2 docs can no longer create pairs
    # on its own: unrelated docs stay unpaired
    assert not any(3 in p for p in got)


def test_minhash_pairs(docs):
    pairs = minhash_pairs(docs, "doc_id", "text", num_hashes=64, bands=16,
                          k=4, stride=1)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(1, 4)] == 1.0
    assert (1, 2) in got and got[(1, 2)] > 0.3
    assert (3, 5) not in got


def test_simhash_near_dups(docs):
    fps = {r["_id"]: r["simhash"]
           for r in simhash(docs, "doc_id", "text", bits=32).collect()}
    assert fps[1] == fps[4]  # identical text -> identical fingerprint

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFF).count("1")

    assert hamming(fps[1], fps[2]) < hamming(fps[1], fps[3])


def test_cosine_topk(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]), (3, [-1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    top = cosine_topk(df, "v", [1.0, 0.0, 0.0], 2, id_col="vec_id").collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    assert top[0]["cosine"] == 1.0


def test_lsh_ann_finds_planted_cluster(spark):
    """Planted near-identical vectors land in the same hyperplane bucket
    and surface as pairs; orthogonal vectors don't."""
    base = [1.0 if i % 7 == 0 else 0.1 * ((i % 5) - 2) for i in range(16)]
    near = list(base)
    near[3] += 0.01
    ortho = [(-1.0) ** i * (1.0 if i % 3 == 0 else 0.05) for i in range(16)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, ortho)], "vec_id int, v array<double>")
    pairs = lsh_ann_pairs(df, "v", 16, n_planes=8, min_cosine=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_ivf_topk_finds_planted_neighbors(spark):
    """IVF with enough probes finds the planted tight cluster; the
    query's own cluster is always probed first."""
    import random

    rnd = random.Random(7)
    rows = []
    base = [1.0] * 8
    for i in range(5):  # tight cluster around `base`
        rows.append((i, [x + rnd.uniform(-0.01, 0.01) for x in base]))
    for i in range(5, 40):  # scattered background
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(8)]))
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    from m3spark.ops import ivf_topk

    top = ivf_topk(df, "v", base, 5, id_col="vec_id",
                   n_clusters=4, n_probe=2)
    got = {r["vec_id"] for r in top.collect()}
    assert got == {0, 1, 2, 3, 4}


def test_token_stats(docs):
    r = {x["doc_id"]: x for x in token_stats(docs, "doc_id", "text").collect()}
    assert r[1]["n_tokens"] == 9
    assert r[1]["distinct_tokens"] == 8  # 'the' twice
    assert r[1]["n_chars"] == len("the quick brown fox jumps over the lazy dog")


def test_quality_monotone(docs):
    r = {x["doc_id"]: x["quality_score"]
         for x in quality(docs, "doc_id", "text").collect()}
    assert all(0 <= v <= 1 for v in r.values())
    # doc 3 has full diversity, doc 1 repeats 'the'
    assert r[3] > 0


def test_lang_id(docs):
    r = {x["doc_id"]: x["predicted_lang"]
         for x in lang_id(docs, "doc_id", "text").collect()}
    assert r[1] == "en" and r[5] == "de" and r[6] == "fr"


def test_lang_id_charclass(spark):
    df = spark.createDataFrame(
        [(1, "你好世界"), (2, "привет мир")],
        "doc_id int, text string")
    r = {x["doc_id"]: x["predicted_lang"]
         for x in lang_id(df, "doc_id", "text").collect()}
    assert r[1] == "zh" and r[2] == "ru"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "other")],
        "doc_id int, text string")
    r = {x["doc_id"]: x["fingerprint"]
         for x in fingerprint(df, "doc_id", "text").collect()}
    assert r[1] == r[2] != r[3]
    assert len(r[1]) == 16


def test_multimodal_decode(spark):
    rows = [(1, b"\x89PNG\r\n\x1a\nrest"), (2, b"\xff\xd8\xff\xe0jpg"),
            (3, b"plain bytes"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id int, payload binary")
    out = {r["doc_id"]: r for r in
           decode_binary_features(df, "payload", "doc_id").collect()}
    assert out[1]["media_type"] == "image/png"
    assert out[2]["media_type"] == "image/jpeg"
    assert out[3]["media_type"] == "application/octet-stream"
    assert out[3]["n_bytes"] == 11
    assert out[4]["media_type"] is None
    assert abs(out[3]["feature_mean"]
               - sum(b"plain bytes") / 11) < 1e-6


def test_lsh_arrow_null_and_ragged_vectors_survive(spark):
    """A NULL or wrong-length embedding must not fail the Arrow hashing
    stage (ADVICE r3): bad rows get null buckets and simply produce no
    candidates; good rows still pair up."""
    base = [1.0 if i % 7 == 0 else 0.1 * ((i % 5) - 2) for i in range(16)]
    near = list(base)
    near[3] += 0.01
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, None), (3, [1.0, 2.0])],
        "vec_id int, v array<double>")
    pairs = lsh_ann_pairs(df, "v", 16, n_planes=8, min_cosine=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p and 3 not in p for p in got)


def test_lsh_arrow_all_null_batch(spark):
    from m3spark.ops.similarity import lsh_candidates

    df = spark.createDataFrame([(0, None), (1, None)],
                               "vec_id int, v array<double>")
    assert lsh_candidates(df, "v", 16, n_planes=4).count() == 0


def test_psi_split_empty_side_is_finite(spark):
    """An all-one-side split must yield a finite PSI (clamped totals),
    mirroring the driver-side psi()'s `or 1` guard (ADVICE r3)."""
    from m3spark.checks.drift import ks_split, psi_split
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, "en") for i in range(10)],
                               "id int, lang string")
    r = psi_split(df, "lang", F.lit(True)).collect()[0]
    assert r["psi"] is not None
    k = ks_split(df, F.col("id") % 3, F.lit(True)).collect()[0]
    assert k["ks"] is not None


def test_substring_dup_passages(spark):
    """Planted repeated passage across docs: the shared 8-gram windows
    are reported with DISTINCT-doc counts; within-doc repetition does
    not inflate the count; short docs are excluded."""
    from m3spark.ops.dedup import substring_dup_passages

    shared = "the quick brown fox jumps over the lazy"  # exactly 8 words
    rows = [
        (1, shared + " dog sits"),
        (2, "intro words here then " + shared + " dog"),
        (3, shared + " cat and also " + shared + " cat"),  # twice in one doc
        (4, "totally unrelated content with eight plus words in it"),
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["gram"]: r["n_docs"]
           for r in substring_dup_passages(df, "doc_id", "text").collect()}
    # the full shared passage appears in docs 1, 2, 3 -> 3 distinct
    assert out[shared] == 3
    # "...lazy dog" window shared by docs 1 and 2 only
    tail = "quick brown fox jumps over the lazy dog"
    assert out[tail] == 2
    # no gram from the unrelated or short docs
    assert all(g not in out for g in ("totally unrelated content with "
                                      "eight plus words in",))
    # within-doc duplication (doc 3) never counts twice
    assert all(v >= 2 for v in out.values())


def test_substring_dup_min_docs_and_n(spark):
    from m3spark.ops.dedup import substring_dup_passages

    rows = [(1, "a b c d"), (2, "a b c e"), (3, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["gram"]: r["n_docs"]
           for r in substring_dup_passages(df, "doc_id", "text",
                                           n=3, min_docs=3).collect()}
    assert out == {"a b c": 3}
    out2 = {r["gram"]: r["n_docs"]
            for r in substring_dup_passages(df, "doc_id", "text",
                                            n=4, min_docs=2).collect()}
    assert out2 == {"a b c d": 2}


# ---- dedup_clusters: connected components over candidate pairs ----


def _uf_clusters(edges):
    """Test-local union-find oracle (driver-side is fine IN A TEST)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check_clusters(spark, edges, max_iter=30):
    from m3spark.ops import dedup_clusters

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_clusters(df, max_iter=max_iter).collect()}
    want = _uf_clusters(edges)
    assert set(got) == set(want)
    for node, (cid, canon) in got.items():
        assert cid == want[node], (node, cid, want[node])
        assert canon == (node == cid)
    # exactly one canonical per cluster
    canons = [n for n, (_, c) in got.items() if c]
    assert sorted(canons) == sorted(set(c for c, _ in got.values()))


def test_dedup_clusters_multi_component(spark):
    """Planted multi-component graph: chain + triangle sharing a node,
    a separate pair, transitive closure across both."""
    edges = [(1, 2), (2, 3), (3, 4),          # chain
             (10, 11), (11, 12), (10, 12),    # triangle
             (4, 10),                         # merges chain+triangle
             (20, 21),                        # separate component
             (30, 31), (31, 32)]
    _check_clusters(spark, edges)


def test_dedup_clusters_long_chain_converges(spark):
    """A 60-node path is the worst case for plain min-propagation
    (diameter 59); large-star/small-star must converge in far fewer
    rounds than the diameter (max_iter=12 << 59)."""
    edges = [(i, i + 1) for i in range(60)]
    _check_clusters(spark, edges, max_iter=12)


def test_dedup_clusters_dirty_input(spark):
    """Reversed duplicates, self-loops, and repeated pairs collapse to
    the same clusters."""
    edges = [(2, 1), (1, 2), (3, 3), (2, 3), (3, 2), (5, 4)]
    from m3spark.ops import dedup_clusters

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_dedup_clusters_id_type_guard_and_cache_handle(spark):
    """r8: a non-numeric id column raises (instead of silently casting
    every edge to NULL and returning an empty result), numeric-string
    ids still work, and the returned DataFrame exposes the final
    materialized edge set for targeted unpersist."""
    import pytest

    from m3spark.ops import dedup_clusters

    bad = spark.createDataFrame([([1], [2])],
                                "id_a array<long>, id_b array<long>")
    with pytest.raises(TypeError, match="numeric"):
        dedup_clusters(bad)

    ok = spark.createDataFrame([("1", "2"), ("2", "3")],
                               "id_a string, id_b string")
    res = dedup_clusters(ok)
    got = {r["doc_id"]: r["cluster_id"] for r in res.collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    # the handle is the final materialized (localCheckpointed) edge
    # set; unpersist is a safe no-op release hook either way
    assert set(res.cached_edges.columns) == {"u", "v"}
    res.cached_edges.unpersist()


def test_substring_dup_hashed_key_twins(spark):
    """r7: the aggregate is keyed on the 8-byte gram hash; the
    xxhash64 production twin and the portable (oracle) twin must agree
    on every (gram, n_docs) — only the key values differ."""
    from m3spark.ops.dedup import substring_dup_passages

    rows = [(1, "a b c d e"), (2, "a b c d f"), (3, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fast = {(r["gram"], r["n_docs"])
            for r in substring_dup_passages(df, "doc_id", "text",
                                            n=4).collect()}
    port = {(r["gram"], r["n_docs"])
            for r in substring_dup_passages(df, "doc_id", "text", n=4,
                                            hash_fn="portable").collect()}
    assert fast == port == {("a b c d", 3), ("b c d e", 2)}


def test_substring_dup_fraction(spark):
    """Per-doc duplicate-passage fraction counts gram POSITIONS whose
    gram is corpus-duplicated; within-doc repeats of a duplicated gram
    all count, but within-doc-only repeats do not create dups."""
    from m3spark.ops.dedup import substring_dup_fraction

    rows = [(1, "a b c d x"),            # grams: 'a b c'(dup) 'b c d'(dup) 'c d x'
            (2, "a b c d y"),            # 'a b c'(dup) 'b c d'(dup) 'c d y'
            (3, "q q q q q")]            # 'q q q' x3 positions, one doc only
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_fraction"])
           for r in substring_dup_fraction(df, "doc_id", "text",
                                           n=3).collect()}
    assert out[1] == (3, 2, round(2 / 3, 6))
    assert out[2] == (3, 2, round(2 / 3, 6))
    assert out[3] == (3, 0, 0.0)


def test_ivf_persisted_partition_pruning(spark, tmp_path_factory):
    """r7: the persisted inverted-file layout prunes at the SCAN — the
    probe predicate lands in the parquet scan's PartitionFilters and
    the persisted top-k equals the in-memory fixed-quantizer top-k."""
    import re

    from m3spark.ops import (ivf_persist_fixed, ivf_topk_fixed,
                             ivf_topk_fixed_persisted)

    rng = __import__("numpy").random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    query = rows[5][1]
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    cents = ivf_persist_fixed(df, path, centroid_mod=40, centroid_rem=1)
    got = ivf_topk_fixed_persisted(spark, path, cents, query, 7,
                                   n_probe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "_cluster" in m.group(1), plan
    want = ivf_topk_fixed(df, "v", query, 7, centroid_mod=40,
                          centroid_rem=1, n_probe=2).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == \
        [(r["vec_id"], r["cosine"]) for r in want]
