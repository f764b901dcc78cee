"""Scale-hazard unit tests for the dedup/similarity operators:

* prefix-filtered exact Jaccard: a stopword shingle present in EVERY
  document must not generate quadratic candidates, and the result must
  still equal brute force (the filter is provably lossless).
* tiled embedding_top_pairs: a hot label larger than the tile size must
  produce the same top-k as the single-block path while every pandas
  group stays bounded by 2*tile_size rows.
"""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from docling_core_spark.textops import (
    embedding_top_pairs,
    jaccard_pairs_prefix,
    prefix_candidates,
)


def _skew_corpus():
    """40 docs; every doc contains the hot shingle 'the quick fox' plus
    mostly-unique filler; three engineered near-dup pairs."""
    rows = []
    for i in range(40):
        shingles = {"the quick fox"}
        shingles |= {f"unique {i} s{j}" for j in range(6)}
        rows.append((f"d{i:03d}", sorted(shingles)))
    # near-dups: d100/d101 identical, d102/d103 share 5/8, d104/d105
    # share 6/8
    base = [f"dup {j}" for j in range(7)] + ["the quick fox"]
    rows.append(("d100", sorted(base)))
    rows.append(("d101", sorted(base)))
    rows.append(("d102", sorted(base[:4] + [f"x{j}" for j in range(3)]
                                + ["the quick fox"])))
    rows.append(("d103", sorted(base[:4] + [f"y{j}" for j in range(3)]
                                + ["the quick fox"])))
    rows.append(("d104", sorted(base[:6] + ["z0", "the quick fox"])))
    rows.append(("d105", sorted(base[:6] + ["z1", "the quick fox"])))
    return rows


def _brute_jaccard(rows, t):
    out = []
    for (da, sa), (db, sb) in itertools.combinations(
            sorted(rows), 2):
        a, b = set(sa), set(sb)
        j = len(a & b) / len(a | b)
        if round(j, 4) >= t:
            out.append((da, db, round(j, 4)))
    return sorted(out)


def test_prefix_jaccard_matches_brute_force(spark):
    rows = _skew_corpus()
    sh = spark.createDataFrame(
        [(d, s) for d, ss in rows for s in ss], ["doc_id", "sh"])
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_prefix(sh, 0.5).collect())
    assert got == _brute_jaccard(rows, 0.5)
    assert len(got) >= 3  # the engineered near-dups are found


def test_prefix_filter_defuses_hot_shingle(spark):
    """All 46 docs share one shingle -> naive inverted index emits
    C(46,2) = 1035 candidate pairs from that key alone; the df-ordered
    prefix keeps the hot shingle out of (almost) every prefix."""
    rows = _skew_corpus()
    sh = spark.createDataFrame(
        [(d, s) for d, ss in rows for s in ss], ["doc_id", "sh"])
    n_cand = prefix_candidates(sh, 0.5).count()
    assert n_cand <= 50  # vs 1035+ without the prefix filter
    # and the candidates still cover every true pair
    cand = {(r.doc_a, r.doc_b)
            for r in prefix_candidates(sh, 0.5).collect()}
    true_pairs = {(a, b) for a, b, _ in _brute_jaccard(rows, 0.5)}
    assert true_pairs <= cand


def test_postings_plan_equals_prefix_plan(spark):
    """Cost-based selection safety: both exact plans produce identical
    results on the skew corpus AND on random rows, so the optimizer's
    df-stat choice can never change the answer."""
    from docling_core_spark.textops import jaccard_pairs_postings

    rows = _skew_corpus()
    sh = spark.createDataFrame(
        [(d, s) for d, ss in rows for s in ss], ["doc_id", "sh"])
    got = sorted((r.doc_a, r.doc_b, r.jaccard)
                 for r in jaccard_pairs_postings(sh, 0.5).collect())
    assert got == _brute_jaccard(rows, 0.5)
    assert got == sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_prefix(sh, 0.5).collect())


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_prefix_filter_lossless_random(spark, threshold):
    """Randomized losslessness across thresholds (fixed seed)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(f"r{i:02d}",
             sorted(set(rng.sample(vocab, rng.randint(3, 12)))))
            for i in range(25)]
    sh = spark.createDataFrame(
        [(d, s) for d, ss in rows for s in ss], ["doc_id", "sh"])
    got = sorted((r.doc_a, r.doc_b, r.jaccard)
                 for r in jaccard_pairs_prefix(sh, threshold).collect())
    assert got == _brute_jaccard(rows, threshold)


# ----------------------------------------------------------------------
def _emb_rows():
    """One hot label (0) with 23 vectors, two small labels; dims=8."""
    import random

    rng = random.Random(11)
    rows = []
    for vid in range(23):
        rows.append((vid, 0, [rng.uniform(-1, 1) for _ in range(8)]))
    for vid in range(23, 30):
        rows.append((vid, 1 + vid % 2,
                     [rng.uniform(-1, 1) for _ in range(8)]))
    # plant a very similar pair inside the hot label, crossing tiles
    base = rows[2][2]
    rows.append((90, 0, [x + 0.01 for x in base]))
    return rows


def test_tiled_top_pairs_equals_single_block(spark):
    emb = spark.createDataFrame(_emb_rows(),
                                ["vec_id", "label", "embedding"])
    single = [(r.vec_a, r.vec_b, r.label, r.cos_sim)
              for r in embedding_top_pairs(emb, tile_size=4096,
                                           k=15).collect()]
    tiled = [(r.vec_a, r.vec_b, r.label, r.cos_sim)
             for r in embedding_top_pairs(emb, tile_size=5,
                                          k=15).collect()]
    assert tiled == single
    # the planted near-identical pair wins and crosses a tile boundary
    assert (tiled[0][0], tiled[0][1]) == (2, 90)


def test_tile_groups_are_bounded(spark):
    """No pandas group may exceed 2*tile_size rows even when one label
    dominates - the OOM hazard the tiling removes."""
    emb = spark.createDataFrame(_emb_rows(),
                                ["vec_id", "label", "embedding"])
    tile = 5
    w_counts = (
        emb.withColumn(
            "tile",
            ((F.row_number().over(
                __import__("pyspark.sql.window",
                           fromlist=["Window"]).Window
                .partitionBy("label").orderBy("vec_id")) - 1)
             / tile).cast("int")))
    ntiles = w_counts.groupBy("label").agg(
        F.max("tile").alias("max_tile"))
    rep = (w_counts.join(ntiles, "label")
           .select("label", "tile",
                   F.explode(F.sequence(F.lit(0), F.col("max_tile")))
                   .alias("other"))
           .withColumn("ti", F.least("tile", "other"))
           .withColumn("tj", F.greatest("tile", "other"))
           .filter((F.col("tile") == F.col("ti"))
                   | (F.col("tile") == F.col("tj"))))
    sizes = rep.groupBy("label", "ti", "tj").count().collect()
    assert max(r["count"] for r in sizes) <= 2 * tile


def test_connected_components_matches_union_find(spark):
    """CC over engineered pair graphs == a classic union-find."""
    from docling_core_spark.textops import connected_components

    pairs = [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g"),
             ("g", "h"), ("h", "a")]  # chain joins {a,b,c} with {f,g,h}
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    got = {(r.doc_id, r.cluster_id)
           for r in connected_components(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want
    # the 6-node chain has diameter 5: label propagation still
    # converges inside the iteration cap
    assert ("c", "a") in got and ("e", "d") in got


def test_connected_components_long_chain_bounded_rounds(spark):
    """A chain-shaped cluster (diameter >> rounds) converges in
    O(log n) alternating large-star/small-star rounds: a 1024-node
    chain has diameter 1023, so the pre-r3 one-hop label propagation
    would need >1000 rounds, while the star-contraction loop must
    finish inside max_iter=12 (~log2 n) WITHOUT raising."""
    from docling_core_spark.textops import connected_components

    n = 1024
    ids = [f"d{i:05d}" for i in range(n)]
    pairs = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"]).coalesce(4)
    # threshold 0 forces the DISTRIBUTED star-contraction path (the
    # default would route this statistic-sized graph to union-find)
    got = connected_components(df, max_iter=12, small_graph_threshold=0)
    rows = got.collect()
    assert len(rows) == n
    assert {r.cluster_id for r in rows} == {ids[0]}


def test_connected_components_paths_agree(spark):
    """Union-find fast path == distributed star contraction on the
    same graph (mixed components incl. a chain and singleton-ish
    pairs)."""
    from docling_core_spark.textops import connected_components

    pairs = ([(f"c{i:03d}", f"c{i + 1:03d}") for i in range(40)]
             + [("x1", "x2"), ("x2", "x3"), ("y1", "y2"),
                ("z9", "z9")])
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    fast = {(r.doc_id, r.cluster_id)
            for r in connected_components(df).collect()}
    dist = {(r.doc_id, r.cluster_id)
            for r in connected_components(
                df, small_graph_threshold=0).collect()}
    assert fast == dist


# ----------------------------------------------------------------------
# trained IVF: the distributed exact-integer Lloyd rounds must equal a
# sequential numpy reference of the same spec
# ----------------------------------------------------------------------

def _np_kpp_seeds(qa, n_cells):
    """Sequential reference of the deterministic k-means|| seeding
    (textops.kpp_seed_ids spec): shared LCG hash, exact-integer
    threshold sampling, first-k floor, weight-ranked reduction."""
    import numpy as np

    from docling_core_spark.textops import KPP_L, KPP_M, KPP_ROUNDS

    def h(v, r, m):
        return ((v % 2147483647) * 1103515245 + r * 12345 + 12345) \
            % 2147483647 % m

    n = len(qa)
    init = min(range(n), key=lambda v: (h(v, 0, 2147483647), v))
    cand = {init}
    for r in range(1, KPP_ROUNDS + 1):
        cm = qa[sorted(cand)]
        d2 = ((qa[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2) \
            .min(axis=1)
        phi = int(d2.sum())
        if not phi:
            break
        cand |= {v for v in range(n)
                 if h(v, r, KPP_M) * phi < KPP_L * KPP_M * int(d2[v])}
    cand |= set(range(n_cells))
    cids = sorted(cand)
    cm = qa[cids]
    d2 = ((qa[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    win = np.asarray(cids)[d2.argmin(axis=1)]  # ties -> lowest cid
    w = {c: int((win == c).sum()) for c in cids if (win == c).any()}
    top = sorted(w, key=lambda c: (-w[c], c))[:n_cells]
    return sorted(top)


def _np_ivf_kmeans(vecs, n_cells, n_iters):
    """Sequential reference: deterministic k-means|| seeding + integer
    Lloyd with round-half-up centroids (floor((2s + c) / (2c)))."""
    import numpy as np

    qa = np.rint(np.asarray(vecs, dtype=np.float64) * 1000).astype(
        np.int64)
    cent = {cid: qa[cid].copy() for cid in _np_kpp_seeds(qa, n_cells)}

    def assign(cent):
        cids = sorted(cent)
        cm = np.stack([cent[c] for c in cids])
        d2 = ((qa[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        # ties -> lowest cid; cids sorted so argmin picks it
        return np.asarray(cids)[d2.argmin(axis=1)]

    for _ in range(n_iters):
        cells = assign(cent)
        new = {}
        for cid in sorted(set(cells.tolist())):
            m = qa[cells == cid]
            s, c = m.sum(axis=0), len(m)
            a = 2 * s + c
            b = 2 * c
            new[cid] = (a - ((a % b + b) % b)) // b
        cent = new
    return assign(cent), cent


def test_ivf_kmeans_fit_matches_numpy_reference(spark):
    from pyspark.sql import Row

    from docling_core_spark.textops import (
        _QINT,
        _L2Q,
        N_CELLS,
        _ivf_assign,
        ivf_kmeans_fit,
    )

    import numpy as np

    rng = np.random.RandomState(7)
    # 3 planted clusters + uniform noise, 60 vectors x 64 dims
    centers = rng.uniform(-0.4, 0.4, size=(3, 64))
    vecs = np.vstack([
        centers[i % 3] + rng.uniform(-0.05, 0.05, size=64)
        for i in range(48)
    ] + [rng.uniform(-0.5, 0.5, size=(12, 64))])
    emb_rows = [Row(vec_id=i, embedding=[float(x) for x in v])
                for i, v in enumerate(vecs)]
    emb = (spark.createDataFrame(emb_rows)
           .select("vec_id", "embedding",
                   F.expr(_QINT.format(c="embedding")).alias("qa")))

    got_cent = dict(ivf_kmeans_fit(emb, n_iters=2))
    want_assign, want_cent = _np_ivf_kmeans(vecs, N_CELLS, 2)

    assert sorted(got_cent) == sorted(want_cent)
    for cid in want_cent:
        assert got_cent[cid] == want_cent[cid].tolist(), cid

    # final assignment equality too
    cdf = spark.createDataFrame(
        sorted((int(c), [int(x) for x in q]) for c, q in got_cent.items()),
        "cid long, qb array<long>")
    d = emb.crossJoin(F.broadcast(cdf)).withColumn("d2", F.expr(_L2Q))
    got_assign = {r["vec_id"]: r["cell"]
                  for r in _ivf_assign(d).collect()}
    assert got_assign == {i: int(c) for i, c in enumerate(want_assign)}


def test_trained_ivf_recall_vs_exact_knn(spark):
    """The k-means||-seeded trained IVF must recall a solid share of
    the exact brute-force top-10 (it probes N_PROBES of N_CELLS cells,
    so perfect recall is not expected - but a broken quantizer would
    drop to near-zero overlap)."""
    import os

    from docling_core_spark.queries import q_knn_cosine
    from docling_core_spark.textops import q_ann_ivf_kmeans_topk

    sf = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    exact = {r["vec_id"] for r in q_knn_cosine(spark, sf).collect()[:10]}
    approx = {r["vec_id"]
              for r in q_ann_ivf_kmeans_topk(spark, sf).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"recall@10 = {recall}"


def test_dedup_retention_properties(spark):
    """Canonical selection invariants: exactly one survivor per
    cluster, the survivor has the cluster-max n_words (smallest doc_id
    among ties), singletons keep themselves, and the kept set covers
    every cluster exactly once."""
    import os
    from collections import defaultdict

    from docling_core_spark.textops import q_dedup_retention

    sf = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = q_dedup_retention(spark, sf).collect()
    assert rows  # whole corpus present
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    n_multi = 0
    for cid, members in by_cluster.items():
        kept = [r for r in members if r["keep"]]
        assert len(kept) == 1, cid
        best = max(r["n_words"] for r in members)
        want = min(r["doc_id"] for r in members
                   if r["n_words"] == best)
        assert kept[0]["doc_id"] == want, cid
        assert kept[0]["survivor"] == want
        if len(members) > 1:
            n_multi += 1
    assert n_multi >= 1  # the corpus plants real near-dup clusters
    assert len(rows) == len({r["doc_id"] for r in rows})
