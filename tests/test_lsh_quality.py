"""Quantitative quality gates for the approximate operators (q31/q32/q33/q41).

The driver's correctness gate can only row-count these (no SQL oracle), so
each one gets a measured recall/error bound here against its exact
counterpart:

- simhash candidate generation: recall MUST be 1.0 within the Hamming ball
  (the pigeonhole block scheme is a guarantee, not a heuristic).
- minhash LSH estimate: |estimated - exact shingle Jaccard| within the
  binomial error of a 64-hash signature.
- q41 (LSH-verified near-dup): recall vs the exact all-pairs token-Jaccard
  baseline, precision exact-by-construction.
- ANN LSH: recall ≥ 0.9 on clustered vectors (the realistic embedding
  case); a measured floor on the isotropic testdata corpus, where any
  sublinear ANN provably degrades (no neighbor structure to exploit).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tika_addons_spark.operators import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_simhash_candidate_recall_is_exactly_one(spark, docs):
    """Pigeonhole guarantee: every pair within max_hamming must be found.

    q32 calls max_hamming=8 → 9 blocks; a pair differing ≤8 bits shares at
    least one block. Exact baseline computed all-pairs in numpy."""
    sigs = dedup.simhash_signatures(docs, "doc_id", "text")
    sp = sigs.toPandas()
    vals = sp["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
    ids = sp["id"].to_numpy()

    x = vals[:, None] ^ vals[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    tmp = x.copy()
    for _ in range(64):
        ham += (tmp & np.uint64(1)).astype(np.int64)
        tmp >>= np.uint64(1)
    iu, ju = np.triu_indices(len(ids), 1)
    exact = {
        (min(ids[i], ids[j]), max(ids[i], ids[j])): int(ham[i, j])
        for i, j in zip(iu, ju)
        if ham[i, j] <= 8
    }
    assert exact, "fixture must contain pairs within the ball"

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_pairs(sigs, max_hamming=8).collect()
    }
    missed = set(exact) - set(got)
    assert not missed, f"pigeonhole recall violated: {sorted(missed)[:5]}"
    # and the reported hamming distances are exact
    assert all(got[p] == exact[p] for p in exact)
    # no false positives past the verify filter
    assert set(got) == set(exact)


def test_minhash_estimate_error_bound(spark, docs):
    """64-hash MinHash estimate vs exact char-5-shingle Jaccard on every LSH
    candidate pair: binomial error ⇒ mean |err| ≲ 0.05, max ≲ 0.25
    (measured on this corpus: mean 0.036, max 0.147)."""
    sigs = dedup.minhash_signatures(docs, "doc_id", "text").persist()
    est = dedup.minhash_jaccard_estimate(
        sigs, dedup.minhash_lsh_pairs(sigs)
    ).toPandas()
    assert len(est) > 100

    txt = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}

    def shingles(t, k=5):
        t = (t or "").lower()
        if len(t) < k:
            t = t + " " * (k - len(t))
        return {t[i : i + k] for i in range(len(t) - k + 1)}

    errs = np.array(
        [
            abs(
                len(shingles(txt[r.id_a]) & shingles(txt[r.id_b]))
                / len(shingles(txt[r.id_a]) | shingles(txt[r.id_b]))
                - r.est_jaccard
            )
            for r in est.itertuples()
        ]
    )
    assert errs.mean() <= 0.06
    assert errs.max() <= 0.25
    sigs.unpersist()


def test_q41_verified_neardup_recall_and_precision(spark):
    """q41 (token-unit MinHash → LSH candidates → exact Jaccard verify) vs
    the exact all-pairs token-Jaccard ≥ 0.8 baseline (DuckDB).

    Precision is 1.0 by construction (the verify step is exact); recall
    depends only on LSH candidate coverage — the 16×4 banding puts the
    s-curve midpoint at ~0.5, so ≥0.8-Jaccard pairs are caught w.p. ~0.9998
    each (measured 1.0 on this corpus)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    tok = "list_distinct(regexp_extract_all(lower(text), '[\\p{L}]+'))"
    exact = con.sql(
        f"""WITH t AS (SELECT doc_id, {tok} AS toks FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8"""
    ).df()
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    assert len(exact_pairs) > 1000

    got = entry_mod.queries()["q41_lsh_verified_neardup"](spark, SF_DIR).toPandas()
    got_pairs = set(zip(got.id_a, got.id_b))

    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    precision = len(got_pairs & exact_pairs) / max(len(got_pairs), 1)
    assert recall >= 0.99, f"recall {recall}"
    assert precision == 1.0, f"precision {precision}"


def test_dup_clusters_match_union_find(spark, docs):
    """minhash_dup_clusters (3 rounds of min-label propagation) must agree
    with an exact union-find over the same LSH candidate pairs — i.e. the
    linear-output operator computes the same partition the quadratic pair
    enumeration implies."""
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", unit="token").persist()
    pairs = dedup.minhash_lsh_pairs(sigs).toPandas()
    got = {
        r.id: r.cluster_id
        for r in dedup.minhash_dup_clusters(sigs, iterations=3).collect()
    }

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = [r.id for r in sigs.select("id").collect()]
    for i in all_ids:
        find(i)
    for r in pairs.itertuples():
        union(r.id_a, r.id_b)
    # canonical representative = min id of component
    comp: dict = {}
    for i in all_ids:
        comp.setdefault(find(i), []).append(i)
    expected = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            expected[i] = m

    assert got == expected
    sigs.unpersist()


def test_hot_bucket_cap_bounds_pair_output(spark):
    """100 identical docs → one bucket of 100 → 4,950 pairs uncapped.
    With max_bucket_size=10 the bucket is skipped entirely (the documented
    trade: massive dup families belong to exact dedup / clustering)."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(100)]
    rows += [(200, "a genuinely unique document about spark physical plans"),
             (201, "a genuinely unique document about spark physical planz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df, "doc_id", "text").persist()

    uncapped = dedup.minhash_lsh_pairs(sigs).count()
    assert uncapped >= 100 * 99 / 2

    capped = dedup.minhash_lsh_pairs(sigs, max_bucket_size=10).toPandas()
    capped_pairs = set(zip(capped.id_a, capped.id_b))
    assert (200, 201) in capped_pairs          # near-dup pair survives
    assert len(capped_pairs) < 100             # hot bucket suppressed
    # clustering still owns the big family, with linear output
    clusters = dedup.minhash_dup_clusters(sigs, iterations=2).toPandas()
    big = clusters[clusters.id < 100]
    assert set(big.cluster_id) == {0}
    sigs.unpersist()


def test_ngram_block_cap_bounds_pair_output(spark):
    """Degenerate single-block corpus: every doc shares one natural key, so
    uncapped ngram_jaccard_pairs goes O(n²) in that block. max_block_size
    skips the hot block (same contract as minhash_lsh_pairs); a small block
    under the cap still produces its pairs."""
    rows = [(i, "identical boilerplate text body", "en") for i in range(60)]
    rows += [(100, "unique snippet about catalyst", "fr"),
             (101, "unique snippet about catalyst", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    uncapped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", "lang").count()
    assert uncapped >= 60 * 59 / 2

    capped = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", max_block_size=10
    ).toPandas()
    pairs = set(zip(capped.id_a, capped.id_b))
    assert pairs == {(100, 101)}  # hot "en" block skipped, small block kept


def test_exact_duplicates_mega_family_bounded(spark):
    """10⁵ copies of one text: the ids column must stay capped (no unbounded
    collect_list row) while counts stay exact; small families unaffected."""
    n = 100_000
    df = (
        spark.range(n).selectExpr("id", "'same text' AS text")
        .union(spark.range(n, n + 2).selectExpr("id", "concat('u', id) AS text"))
    )
    out = dedup.exact_duplicates(df, "id", "text", max_ids=50).toPandas()
    fam = out[out.n_copies == n].iloc[0]
    assert fam.keep_id == 0
    assert len(fam.ids) == 50 and bool(fam.ids_truncated)
    assert list(fam.ids) == list(range(50))  # first max_ids ascending
    small = out[out.n_copies == 1]
    assert len(small) == 2
    assert all(not t for t in small.ids_truncated)


def test_ann_lsh_recall_clustered(spark):
    """Multi-table hyperplane LSH must reach recall ≥ 0.9 where embeddings
    have real neighbor structure (clusters with within-cluster cos ~0.9)."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(10, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for i in range(200):
        c = centers[i % 10]
        v = c + 0.25 * rng.normal(size=32)
        vecs.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 10)

    exact = similarity.cosine_topk_bruteforce(df, q, k=5).toPandas()
    ann = similarity.cosine_topk_lsh(
        df, q, k=5, n_bits=8, dim=32, n_tables=16
    ).toPandas()
    ex = set(zip(exact.query_id, exact.neighbor_id))
    an = set(zip(ann.query_id, ann.neighbor_id))
    recall = len(ex & an) / len(ex)
    assert recall >= 0.9, f"clustered recall {recall}"


def test_ann_lsh_recall_floor_on_testdata(spark):
    """q33 vs q23 on the driver's isotropic embeddings: top-5 'neighbors'
    sit at cos ~0.3-0.45, where LSH gaps narrow by theory. Pin a measured
    floor (0.48 at the current parameters) so regressions are visible."""
    exact = entry_mod.queries()["q23_ann_bruteforce"](spark, SF_DIR).toPandas()
    ann = entry_mod.queries()["q33_ann_lsh"](spark, SF_DIR).toPandas()
    ex = set(zip(exact.query_id, exact.neighbor_id))
    an = set(zip(ann.query_id, ann.neighbor_id))
    recall = len(ex & an) / len(ex)
    assert recall >= 0.4, f"testdata recall {recall}"


def test_ann_ivf_recall_clustered(spark):
    """IVF-Flat must reach recall ≥ 0.9 on clustered embeddings with a
    generous probe budget, and full probing must equal brute force."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(10, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for i in range(200):
        c = centers[i % 10]
        v = c + 0.25 * rng.normal(size=32)
        vecs.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 10)

    exact = similarity.cosine_topk_bruteforce(df, q, k=5).toPandas()
    ex = set(zip(exact.query_id, exact.neighbor_id))

    ivf = similarity.cosine_topk_ivf(
        df, q, k=5, n_centroids=16, n_probe=6, sample=200
    ).toPandas()
    an = set(zip(ivf.query_id, ivf.neighbor_id))
    recall = len(ex & an) / len(ex)
    assert recall >= 0.9, f"ivf clustered recall {recall}"

    # degeneracy check: probing every list IS brute force
    full = similarity.cosine_topk_ivf(
        df, q, k=5, n_centroids=16, n_probe=16, sample=200
    ).toPandas()
    fu = set(zip(full.query_id, full.neighbor_id))
    assert fu == ex


def test_ann_ivf_recall_floor_on_testdata(spark):
    """q50 vs q23 on the isotropic driver embeddings: pin a measured floor
    (like the LSH path's) so regressions are visible."""
    exact = entry_mod.queries()["q23_ann_bruteforce"](spark, SF_DIR).toPandas()
    ivf = entry_mod.queries()["q50_ann_ivf"](spark, SF_DIR).toPandas()
    ex = set(zip(exact.query_id, exact.neighbor_id))
    an = set(zip(ivf.query_id, ivf.neighbor_id))
    recall = len(ex & an) / len(ex)
    assert recall >= 0.4, f"ivf testdata recall {recall}"


def test_ivf_training_deterministic(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    c1 = similarity.train_ivf_centroids(emb, n_centroids=8, sample=256)
    c2 = similarity.train_ivf_centroids(emb, n_centroids=8, sample=256)
    assert np.array_equal(c1, c2)


def test_ivf_train_sample_plan_is_filtered(spark):
    """The 100 TB shape: the codebook's ordered-top-k must rank a
    hash-filtered subset — the TakeOrderedAndProject sits ABOVE a
    deterministic pmod(xxhash64(id), mod) filter, never over the raw
    corpus — and the filtered draw is layout-independent."""
    df = spark.range(2000).selectExpr(
        "id AS vec_id", "array(cast(id AS float), 1.0f) AS embedding"
    )
    plan = (
        similarity._ivf_train_sample_plan(df, "vec_id", "embedding", 64, 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "xxhash64" in plan
    assert "TakeOrderedAndProject" in plan
    # plan prints top-down: the Take appears above (before) the filter,
    # i.e. it consumes already-filtered rows
    assert plan.index("TakeOrderedAndProject") < plan.index("xxhash64")

    # layout independence: same rows regardless of partitioning
    a = similarity._ivf_train_sample_plan(df, "vec_id", "embedding", 64, 64).collect()
    b = similarity._ivf_train_sample_plan(
        df.repartition(7), "vec_id", "embedding", 64, 64
    ).collect()
    assert a == b and 0 < len(a) <= 64


def test_incremental_pairs_never_touch_corpus_corpus(spark):
    """The daily-increment path: new×old and new×new pairs only — an old
    near-dup pair inside the corpus must NOT be re-emitted, and every
    new-involving pair from the full self-join must be recovered."""
    corpus = spark.createDataFrame(
        [(1, "aaa bbb ccc ddd words here"), (2, "aaa bbb ccc ddd words here"),
         (3, "completely different corpus text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "aaa bbb ccc ddd words here"),   # dup of corpus 1/2
         (11, "brand new family text"), (12, "brand new family text"),
         (13, "unique newcomer")],
        "doc_id long, text string",
    )
    cs = dedup.minhash_signatures(corpus, "doc_id", "text", unit="token")
    ns = dedup.minhash_signatures(new, "doc_id", "text", unit="token")

    got = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs_incremental(ns, cs).collect()
    }
    # (1,2) is an old×old dup — must be absent
    assert (1, 2) not in got and (2, 1) not in got
    assert (10, 1) in got and (10, 2) in got   # new×old, new id first
    assert (11, 12) in got                      # new×new, ordered
    assert all(a in (10, 11, 12, 13) for a, _ in got)

    # completeness vs the full self-join, restricted to new-involving pairs
    full = dedup.minhash_lsh_pairs(cs.unionByName(ns))
    new_ids = {10, 11, 12, 13}
    expect = set()
    for r in full.collect():
        a, b = r.id_a, r.id_b
        if a in new_ids or b in new_ids:
            if a in new_ids:
                expect.add((a, b) if (b in new_ids and a < b) or b not in new_ids else (a, b))
            else:
                expect.add((b, a))
    norm_got = {(a, b) for a, b in got}
    assert norm_got == expect, (norm_got, expect)
