"""Quality tests for the approximate operators (no SQL oracle exists,
so assert their relationship to the exact baselines instead).

- MinHash-LSH candidates must recall most true near-dup pairs
  (exact 3-gram Jaccard >= 0.7) and estimate Jaccard roughly right.
- SimHash hamming<=3 pairs should overlap heavily with high-Jaccard.
- LSH ANN must hit good recall@5 against brute-force cosine top-5.
- Rolling hash: identical text <=> identical fingerprint.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataingestionengineprocess_spark.catalog import load
from dataingestionengineprocess_spark.operators.dedup import (
    dedup_exact,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from dataingestionengineprocess_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # yield + unpersist: a leaked cache entry on the BASE TABLE makes
    # the CacheManager substitute InMemoryTableScan into every later
    # plan over documents, which breaks scan-prune assertions in
    # test_plan_shapes* when files share one pytest invocation
    # (VERDICT r10 #1 session-state leak).
    df = load(spark, sf_dir, "documents").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load(spark, sf_dir, "embeddings").cache()
    yield df
    df.unpersist()


def _pair_set(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_minhash_recall_vs_exact(docs):
    exact = _pair_set(ngram_jaccard_pairs(docs, threshold=0.7))
    assert exact, "fixture should contain true near-dup pairs"
    cand = _pair_set(minhash_neardup_pairs(docs, est_threshold=0.35))
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.8, f"minhash recall {recall:.2f} ({len(exact)} true pairs)"


def test_minhash_estimate_tracks_exact(docs):
    est = minhash_neardup_pairs(docs, est_threshold=0.5)
    exact = ngram_jaccard_pairs(docs, threshold=0.0)
    joined = est.join(exact, ["id_a", "id_b"]).select("est_jaccard", "jaccard")
    rows = joined.collect()
    assert rows
    mae = sum(abs(r.est_jaccard - r.jaccard) for r in rows) / len(rows)
    assert mae < 0.25, f"minhash estimate MAE {mae:.3f}"


def test_simhash_finds_neardups(docs):
    sim = _pair_set(simhash_neardup_pairs(docs, max_hamming=3))
    exact = _pair_set(ngram_jaccard_pairs(docs, threshold=0.9))
    if exact:
        overlap = len(exact & sim) / len(exact)
        assert overlap >= 0.5, f"simhash catches {overlap:.2f} of jaccard>=0.9 pairs"


def test_minhash_bucket_cap_reports_drops(spark):
    """"No silent caps": a degenerate corpus (many identical docs in
    one LSH bucket) must report how many buckets/rows the max_bucket
    skew guard removed, via the guard observation."""
    from pyspark.sql import Observation

    boiler = "the same boilerplate text repeated across every document"
    rows = [(i, boiler) for i in range(40)]
    rows += [(100 + i, f"unique document number {i} with its own words here")
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    obs = Observation("lsh_guard")
    pairs = minhash_neardup_pairs(
        df, est_threshold=0.5, max_bucket=10, guard_obs=obs
    )
    pair_set = _pair_set(pairs)
    m = obs.get
    assert m["dropped_buckets"] > 0, "degenerate buckets must be reported"
    assert m["dropped_rows"] >= 40 * 16, \
        "every banded row of the 40 identical docs exceeds the cap"
    # and the capped join really did exempt the boilerplate clones
    assert not any(a < 100 and b < 100 for a, b in pair_set)


def test_simhash_hamming_beyond_3_complete(spark):
    """Chunk count derives from max_hamming: for max_hamming=5 the
    6-chunk pigeonhole join must find EVERY pair within distance 5
    (the old fixed 4x16 layout silently lost recall past 3)."""
    import itertools

    # doc pairs with controlled small textual perturbations
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " \
           "kilo lima mike november oscar papa quebec romeo sierra tango"
    variants = [base,
                base.replace("delta", "delt4"),
                base.replace("oscar", "oscat").replace("kilo", "kil0")]
    rows = [(i, t) for i, t in enumerate(variants)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from dataingestionengineprocess_spark.operators.dedup import (
        simhash_signatures,
    )

    sigs = {r.id: r.sh for r in simhash_signatures(df).collect()}
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 5:
            want.add((a, b))
    got = _pair_set(simhash_neardup_pairs(df, max_hamming=5))
    assert got == want, f"expected {want}, got {got}"


def test_simhash_rejects_invalid_hamming(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup_pairs(df, max_hamming=64)


def test_lsh_ann_recall_at_5_fixture(spark, emb):
    """Fixture neighbors are WEAK (cosine ~0.3): random-hyperplane LSH
    has no recall guarantee there (p_plane ~ 0.61). Assert a modest
    floor with a wide configuration; the guarantee-regime test below
    uses planted high-similarity pairs."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5, n_planes=6, n_bands=16)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.25, f"LSH recall@5 = {recall:.2f}"


def test_lsh_ann_recall_planted_neardups(spark):
    """In the regime LSH is for (cosine >= 0.95 near-dups), recall@1
    must be high: plant perturbed copies and require the copy's base
    to be found as the top neighbor for >= 90% of queries."""
    import numpy as np

    rng = np.random.default_rng(42)
    base = rng.normal(size=(200, 64)).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.normal(size=(50, 64)).astype("float32") * 0.04
    dups = base[:50] + noise
    rows = [(i, base[i].tolist()) for i in range(200)]
    rows += [(1000 + i, dups[i].tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    queries = df.filter(F.col("vec_id") >= 1000)
    found = lsh_topk(df, queries, k=1, n_planes=8, n_bands=8).collect()
    hits = sum(1 for r in found if r.neighbor_id == r.query_id - 1000)
    assert hits >= 45, f"planted-pair recall@1 = {hits}/50"


def test_lsh_topk_single_join_plan(spark, emb):
    """Candidate generation must be ONE banded equi-join (posexplode on
    (band_idx, band_key)), not a union of per-band joins re-scanning
    the corpus signatures n_bands times."""
    queries = emb.filter(F.col("vec_id") < 5)
    plan = (
        lsh_topk(emb, queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Union" not in plan, "per-band union shape crept back in"
    assert plan.count("Join") <= 2, plan  # 1 candidate join (+AQE echo)


def test_ivf_ann_recall_at_5(spark, emb):
    """Unlabeled-corpus IVF (k-means quantizer). Fixture neighbors are
    WEAK (cosine ~0.3, near-random vectors), so true top-5 neighbors
    scatter almost uniformly across lists and nprobe=2 of 8 can only
    catch the fraction living in the probed lists (plus centroid
    correlation). Assert it comfortably beats the uniform-scatter
    floor (2/8 = 0.25); the full-probe test below is the exactness
    guarantee."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, nprobe=2, n_lists=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"IVF recall@5 = {recall:.2f}"


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """Probing EVERY k-means list makes IVF exhaustive -- it must
    equal brute force exactly (same ordering, same tie-breaks), with
    no label column involved anywhere."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    full = ivf_topk(emb, queries, k=5, nprobe=8, n_lists=8)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_ivf_labeled_full_probe_equals_bruteforce(spark, emb):
    """The label-derived quantizer path must also be exhaustive at
    full probe (back-compat for corpora with an existing clustering)."""
    n_lists = emb.select("label").distinct().count()
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    full = ivf_topk(emb, queries, k=5, nprobe=n_lists, label_col="label")
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_kmeans_quantizer_properties(spark, emb):
    """The coarse quantizer itself: deterministic across calls, exactly
    n_lists centroids of the right dimension, and the lists it induces
    are non-degenerate (no list swallows the corpus)."""
    from dataingestionengineprocess_spark.operators.similarity import (
        kmeans_centroids,
    )

    c1 = kmeans_centroids(emb, 8, max_iter=3)
    c2 = kmeans_centroids(emb, 8, max_iter=3)
    r1 = sorted((r.clabel, tuple(r.carr)) for r in c1.collect())
    r2 = sorted((r.clabel, tuple(r.carr)) for r in c2.collect())
    assert [l for l, _ in r1] == list(range(8))
    assert all(len(c) == 64 for _, c in r1)
    assert r1 == r2, "seeded quantizer must be deterministic"

    from dataingestionengineprocess_spark.functions.vectors import (
        as_double,
        cosine,
    )

    assigned = (
        emb.select(F.col("vec_id"), as_double("embedding").alias("v"))
        .join(F.broadcast(c1))
        .withColumn("cos", cosine(F.col("v"), F.col("carr")))
        .groupBy("vec_id")
        .agg(F.expr("max_by(clabel, struct(cos, -clabel))").alias("clabel"))
    )
    sizes = assigned.groupBy("clabel").count().collect()
    total = sum(r["count"] for r in sizes)
    assert len(sizes) >= 4, "quantizer should populate most lists"
    assert max(r["count"] for r in sizes) < total * 0.8, \
        "no single list should swallow the corpus"


def test_brp_similarity_join_recall(spark, emb):
    """MLlib BRP-LSH join must recover most true cos>=0.4 pairs found
    by the exact all-pairs join (approxSimilarityJoin only misses
    pairs hashed apart in every table)."""
    from dataingestionengineprocess_spark.operators.similarity import (
        brp_similarity_join,
    )
    from dataingestionengineprocess_spark.functions.vectors import (
        as_double,
        cosine,
    )

    a = emb.select(F.col("vec_id").alias("id_a"),
                   as_double("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   as_double("embedding").alias("vb"))
    exact = {
        (r.id_a, r.id_b)
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("c", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("c") >= 0.4)
            .collect()
        )
    }
    assert exact, "fixture should contain cos>=0.4 pairs"
    approx = {
        (r.id_a, r.id_b)
        for r in brp_similarity_join(emb, threshold_cos=0.4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"BRP-LSH recall {recall:.2f} of {len(exact)} pairs"
    # precision is exact (candidates are distance-verified): allow only
    # float-noise strays just under the threshold
    near_exact = {
        (r.id_a, r.id_b)
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("c", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("c") >= 0.3999)
            .collect()
        )
    }
    assert approx <= near_exact, f"{len(approx - near_exact)} false positives"


def test_dedup_exact_deterministic(spark, docs):
    d1 = dedup_exact(docs, ["lang", "source"], ["doc_id"])
    d2 = dedup_exact(docs, ["lang", "source"], ["doc_id"])
    assert d1.collect() == d2.collect()
    # one row per key, and it's the minimum doc_id
    mins = docs.groupBy("lang", "source").agg(F.min("doc_id").alias("doc_id"))
    assert {tuple(r) for r in d1.select("lang", "source", "doc_id").collect()} == {
        tuple(r) for r in mins.select("lang", "source", "doc_id").collect()
    }


def test_rolling_hash_injective_on_fixture(spark, sf_dir):
    """The registry query is now a certificate (round 8): it must
    report the bijection between texts and fingerprints itself, with
    the fact column equal to an independently computed distinct-text
    count."""
    from dataingestionengineprocess_spark.queries.text import text_rolling_hash

    rows = {r["item"]: r for r in text_rolling_hash(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents")
    assert rows["corpus_size"]["fact"] == docs.count()
    assert rows["fingerprint_bijective"]["fact"] == (
        docs.select("text").distinct().count())
    assert all(r["ok"] for r in rows.values())


def test_prefix_filter_shrinks_candidate_space(spark, sf_dir):
    """The prefix-filter join must generate strictly fewer candidate
    pairs than the all-shingles equi-join while returning the exact
    same qualifying pairs (parity with the shared oracle covers
    correctness; this pins the efficiency claim)."""
    from pyspark.sql import functions as F

    from dataingestionengineprocess_spark.catalog import load
    from dataingestionengineprocess_spark.functions.text import shingles

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("id"), F.explode(shingles("text", 3)).alias("s")
    )
    naive_pairs = (
        sh.alias("a").join(sh.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .distinct()
        .count()
    )

    freq = sh.groupBy("s").agg(F.count("*").alias("f"))
    ranked = sh.join(freq, "s").groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("f", "s"))).alias("fs")
    )
    t = 0.6
    toks = ranked.select(
        "id",
        F.transform("fs", lambda x: x.getField("s")).alias("toks"),
        F.size("fs").alias("n"),
    )
    plen = (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int")
    pref = toks.select(
        "id", F.explode(F.slice("toks", F.lit(1), plen)).alias("p")
    )
    prefix_pairs = (
        pref.alias("a").join(pref.alias("b"), "p")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .distinct()
        .count()
    )
    assert prefix_pairs < naive_pairs


def test_ivf_empty_corpus_with_labels_returns_empty(spark):
    from dataingestionengineprocess_spark.operators.similarity import ivf_topk

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    out = ivf_topk(empty, empty, label_col="label")
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


# ---------------------------------------------------------------------------
# Product quantization (operators/quantize.py)
# ---------------------------------------------------------------------------


def test_pq_full_refine_equals_bruteforce(spark, emb):
    """With refine >= corpus size every candidate is exact-re-ranked,
    so PQ must equal brute force exactly (ordering and tie-breaks):
    the approximation lives ONLY in candidate selection."""
    from dataingestionengineprocess_spark.operators.quantize import pq_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    full = pq_topk(emb, queries, k=5, refine=1000)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_pq_recall_at_5(spark, emb):
    """ADC + top-48 re-rank on the near-random fixture: measured 0.73
    (local-trained codebooks); must comfortably beat the
    random-candidate floor (48/500)."""
    from dataingestionengineprocess_spark.operators.quantize import pq_topk

    queries = emb.filter(F.col("vec_id") < 20)
    e = {(r.query_id, r.neighbor_id)
         for r in brute_force_topk(emb, queries, k=5).collect()}
    a = {(r.query_id, r.neighbor_id)
         for r in pq_topk(emb, queries, k=5, refine=48).collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.55, f"PQ recall@5 = {recall:.2f}"


def test_pq_codebooks_deterministic(spark, emb):
    """Seeded init + relational Lloyd's => identical codebooks across
    fits (required by the driver's repeated-run checks)."""
    from dataingestionengineprocess_spark.operators.quantize import (
        pq_codebooks,
    )

    b1 = pq_codebooks(emb, m=8, ks=16, max_iter=2)
    b2 = pq_codebooks(emb, m=8, ks=16, max_iter=2)
    assert b1 == b2
    assert len(b1) == 8 and all(len(bj) == 16 for bj in b1)
    assert all(len(c) == 8 for bj in b1 for c in bj)  # 64/8 dims


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup shape, operators/quantize.py)
# ---------------------------------------------------------------------------


def test_semantic_dedup_planted_neardups(spark):
    """Planted perturbed copies (cos ~0.999) must be pruned, each
    naming its base as the kept representative. A couple of pairs may
    straddle a cluster boundary (the documented SemDeDup
    approximation), so require >= 25/30 — and every drop decision
    must be sound (rep_sim >= threshold, rep actually kept)."""
    import numpy as np

    from dataingestionengineprocess_spark.operators.quantize import (
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 64)).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:30] + rng.normal(size=(30, 64)).astype("float32") * 0.03
    rows = [(i, base[i].tolist()) for i in range(100)]
    rows += [(1000 + i, dups[i].tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    res = semantic_dedup(df, threshold=0.95, n_clusters=4, kmeans_iter=3)
    out = res.collect()
    assert len(out) == 130  # one verdict per input vector
    kept = {r.vec_id for r in out if r.keep}
    dropped = [r for r in out if not r.keep]
    matched = sum(
        1 for r in dropped
        if r.rep_id is not None and abs(r.rep_id - r.vec_id) == 1000
    )
    assert matched >= 25, f"only {matched}/30 planted pairs pruned"
    for r in dropped:
        assert r.rep_sim is not None and r.rep_sim >= 0.95
        assert r.rep_id in kept, "representative must itself be kept"


def test_semantic_dedup_kept_set_is_separated(spark, emb):
    """Soundness on the fixture: within every cluster the kept rows
    are pairwise below the threshold (the greedy guarantee), and the
    operator is deterministic across runs."""
    from dataingestionengineprocess_spark.operators.quantize import (
        semantic_dedup,
    )
    from dataingestionengineprocess_spark.functions.vectors import (
        as_double,
        cosine,
    )

    res = semantic_dedup(emb, threshold=0.92, n_clusters=8, kmeans_iter=3)
    r1 = sorted(map(tuple, res.collect()))
    r2 = sorted(map(tuple, semantic_dedup(
        emb, threshold=0.92, n_clusters=8, kmeans_iter=3).collect()))
    assert r1 == r2, "semantic dedup must be deterministic"

    kept = res.filter("keep").select("vec_id", "clabel")
    vecs = emb.select(
        F.col("vec_id").alias("vid"), as_double("embedding").alias("v")
    )
    a = kept.join(vecs, kept.vec_id == vecs.vid).select(
        F.col("vec_id").alias("id_a"), F.col("clabel"), F.col("v").alias("va")
    )
    b = kept.join(vecs, kept.vec_id == vecs.vid).select(
        F.col("vec_id").alias("id_b"), F.col("clabel"), F.col("v").alias("vb")
    )
    viol = (
        a.join(b, ["clabel"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.92)
        .count()
    )
    assert viol == 0, f"{viol} same-cluster kept pairs above threshold"


def test_semantic_dedup_multi_slices_match_single(spark, emb):
    """ADVICE r9: every threshold slice of `semantic_dedup_multi` must
    be ROW-IDENTICAL to the corresponding `semantic_dedup(threshold=t)`
    run -- the kernel docstring claims this holds by construction
    (shared `_greedy_prune` scan over one `_prune_prep` pass); this
    pins the claim, including the float64 rep_sim cast + concat
    plumbing, on the certificate's own threshold pair (one of which
    actually produces drops on the fixture)."""
    from dataingestionengineprocess_spark.operators.quantize import (
        semantic_dedup,
        semantic_dedup_multi,
    )
    from dataingestionengineprocess_spark.queries.dedup import (
        _SEM_AUDIT_T_HIGH,
        _SEM_AUDIT_T_LOW,
    )

    ts = [_SEM_AUDIT_T_LOW, _SEM_AUDIT_T_HIGH]
    multi = semantic_dedup_multi(emb, ts, n_clusters=8, kmeans_iter=3)
    rows = multi.collect()
    n = emb.count()
    assert len(rows) == 2 * n  # one verdict per vector per threshold

    for t in ts:
        single = sorted(map(tuple, semantic_dedup(
            emb, threshold=t, n_clusters=8, kmeans_iter=3).collect()))
        sliced = sorted(
            (r.vec_id, r.clabel, r.keep, r.rep_id, r.rep_sim)
            for r in rows if r.threshold == t
        )
        assert sliced == single, f"threshold {t} slice diverged"
    # the audit pair is non-vacuous: the low threshold must drop
    assert any(not r.keep for r in rows
               if r.threshold == _SEM_AUDIT_T_LOW)


def test_pq_local_codebooks_deterministic(spark, emb):
    """The driver-side training path must also be deterministic
    (hash-ordered sample + fixed init)."""
    from dataingestionengineprocess_spark.operators.quantize import (
        pq_codebooks_local,
    )

    b1 = pq_codebooks_local(emb, m=8, ks=16)
    b2 = pq_codebooks_local(emb, m=8, ks=16)
    assert b1 == b2
    assert len(b1) == 8 and all(len(bj) == 16 for bj in b1)


def test_pq_persisted_index_matches_direct_search(spark, emb, tmp_path):
    """build_pq_index + pq_search_index must return exactly what the
    direct pq_topk returns (same codebook training rule), and the
    index must survive a rebuild atomically (searches resolve the new
    snapshot; the old one remains until expired)."""
    from dataingestionengineprocess_spark.operators.quantize import (
        build_pq_index,
        pq_search_index,
        pq_topk,
    )
    from dataingestionengineprocess_spark.sinks.versioned import (
        VersionedTable,
    )

    idx = str(tmp_path / "pq_index")
    stats = build_pq_index(emb, idx)
    assert stats["n_vectors"] == emb.count()

    queries = emb.filter(F.col("vec_id") < 10)
    direct = sorted(map(tuple, pq_topk(
        emb, queries, k=5, refine=48).collect()))
    via_index = sorted(map(tuple, pq_search_index(
        spark, idx, queries, emb, k=5, refine=48).collect()))
    assert direct == via_index

    # rebuild: a second atomic snapshot (codes + codebooks together);
    # search now uses the new version
    build_pq_index(emb, idx)
    assert VersionedTable(spark, idx).versions() == [1, 2]
    again = sorted(map(tuple, pq_search_index(
        spark, idx, queries, emb, k=5, refine=48).collect()))
    assert again == direct


def test_semantic_dedup_oversized_cluster_salt_split(spark):
    """A degenerate corpus (one cluster swallowing everything) must
    salt-split into bounded shards: the prune still runs, every drop
    decision stays sound, and near-identical copies that hash into
    the same shard are still pruned."""
    import numpy as np

    from dataingestionengineprocess_spark.operators.quantize import (
        semantic_dedup,
    )

    rng = np.random.default_rng(3)
    center = rng.normal(size=64)
    center /= np.linalg.norm(center)
    # 120 tiny perturbations of ONE vector: a single dense cluster
    rows = [
        (i, (center + rng.normal(size=64) * 0.01).astype("float32").tolist())
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = semantic_dedup(
        df, threshold=0.95, n_clusters=2, kmeans_iter=2, max_cluster=30
    ).collect()
    assert len(out) == 120
    kept = [r for r in out if r.keep]
    dropped = [r for r in out if not r.keep]
    # ~4 shards of ~30 near-identical vectors: each shard keeps ~1
    assert len(dropped) >= 100, f"only {len(dropped)} dropped"
    kept_ids = {r.vec_id for r in kept}
    for r in dropped:
        assert r.rep_sim >= 0.95 and r.rep_id in kept_ids
    # un-capped, the same corpus collapses to ~1 representative
    full = semantic_dedup(
        df, threshold=0.95, n_clusters=2, kmeans_iter=2, max_cluster=None
    ).collect()
    assert sum(1 for r in full if r.keep) <= len(kept)


def test_ivf_local_training_full_probe_equals_bruteforce(spark, emb):
    """Exhaustive probe must equal brute force REGARDLESS of which
    trainer fit the quantizer -- the partition only decides what gets
    probed, never the scores."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    full = ivf_topk(emb, queries, k=5, nprobe=8, n_lists=8, train="local")
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_incremental_admission_semantics(spark):
    """New docs rejected iff a corpus doc matches at >= threshold;
    best match wins with smallest-id tie-break; sub-shingle-length
    docs always admit."""
    from dataingestionengineprocess_spark.operators.dedup import (
        incremental_jaccard_admission,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # == doc 1
            (11, "totally different words entirely here"),
            (12, "hi"),                                   # < 3 tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_jaccard_admission(
        corpus, new, n=3, threshold=0.5).collect()}

    assert out[10].status == "reject"
    # doc 1 is an exact match (jaccard 1.0); doc 2 ties lower
    assert out[10].match_id == 1 and out[10].jaccard == 1.0
    assert out[11].status == "admit" and out[11].match_id is None
    assert out[12].status == "admit"


def test_incremental_admission_tiebreak(spark):
    """Equal-jaccard corpus matches resolve to the smallest corpus id."""
    from dataingestionengineprocess_spark.operators.dedup import (
        incremental_jaccard_admission,
    )

    text = "w1 w2 w3 w4 w5"
    corpus = spark.createDataFrame(
        [(7, text), (5, text), (9, text)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(100, text)], "doc_id long, text string")
    row = incremental_jaccard_admission(corpus, new).collect()[0]
    assert row.status == "reject" and row.match_id == 5 and row.jaccard == 1.0


def test_heavy_hitters_exact_on_skewed_stream(spark):
    """Two-pass MG heavy hitters == exact groupBy+HAVING on a skewed,
    multi-partition stream (the sketch may over-nominate, never
    under-nominate; the recount kills false positives)."""
    from dataingestionengineprocess_spark.operators.heavyhitters import (
        heavy_hitters,
    )

    rows = (
        [("hot",)] * 500 + [("warm",)] * 120
        + [(f"cold_{i}",) for i in range(2000)]
        + [(f"cool_{i % 40}",) for i in range(400)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(16)
    phi = 0.03  # N=3020 -> threshold ceil(90.6)=91
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", phi=phi).collect()}
    exact = {
        (r.item, r.cnt)
        for r in df.groupBy("item").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 91).collect()
    }
    assert got == exact and ("hot", 500) in got and ("warm", 120) in got


def test_incremental_admission_via_persisted_index(spark, tmp_path):
    """A shingle index built ONCE (and persisted) answers multiple
    batches identically to the direct corpus path."""
    from dataingestionengineprocess_spark.operators.dedup import (
        build_shingle_index,
        incremental_jaccard_admission,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    idx_path = str(tmp_path / "shingle_idx")
    build_shingle_index(corpus).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    for batch_mod in (0, 2):
        batch = (docs.filter(F.col("doc_id") % 4 == batch_mod)
                 .orderBy("doc_id").limit(40))
        direct = incremental_jaccard_admission(
            corpus, batch, n=3, threshold=0.5
        )
        via_index = incremental_jaccard_admission(
            None, batch, n=3, threshold=0.5, corpus_index=idx
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, via_index.collect())
        )


def _reference_admission(corpus_rows, new_rows, n=2, threshold=0.5):
    """Per-doc reference: best corpus match by exact shingle jaccard
    (rounded like the operator), ties to the smallest corpus id."""
    def sh(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        } if len(toks) >= n else set()

    corp = {i: sh(t) for i, t in corpus_rows}
    out = {}
    for i, t in new_rows:
        s_new = sh(t)
        best = None
        for j, s_c in corp.items():
            if not s_new or not s_c:
                continue
            inter = len(s_new & s_c)
            if not inter:
                continue
            jac = round(inter / (len(s_new) + len(s_c) - inter), 4)
            if jac >= threshold and (
                best is None or (jac, -j) > (best[1], -best[0])
            ):
                best = (j, jac)
        out[i] = best
    return out


@given(st.data())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_incremental_admission_property(spark, data):
    """Hypothesis: the distributed admission equals the per-doc
    reference on arbitrary small corpora (shared vocab forces
    collisions, distinct ids, messy short docs included)."""
    from dataingestionengineprocess_spark.operators.dedup import (
        incremental_jaccard_admission,
    )

    words = ["aa", "bb", "cc", "dd"]
    doc = st.lists(
        st.sampled_from(words), min_size=0, max_size=6
    ).map(" ".join)
    corpus_rows = list(enumerate(
        data.draw(st.lists(doc, min_size=1, max_size=6))
    ))
    new_rows = [
        (100 + i, t)
        for i, t in enumerate(data.draw(st.lists(doc, min_size=1, max_size=5)))
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    got = {
        r.doc_id: (r.match_id, r.jaccard) if r.status == "reject" else None
        for r in incremental_jaccard_admission(
            corpus, new, n=2, threshold=0.5
        ).collect()
    }
    expect = _reference_admission(corpus_rows, new_rows, n=2, threshold=0.5)
    assert got == {k: v for k, v in expect.items()}


def test_incremental_admission_supports_string_ids(spark):
    """Doc ids are not always numeric (every other dedup operator
    accepts strings); the best-match tie-break must not negate the id
    arithmetically."""
    from dataingestionengineprocess_spark.operators.dedup import (
        incremental_jaccard_admission,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [("corp-b", text), ("corp-a", text), ("corp-z", "unrelated words x y z")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [("new-1", text), ("new-2", "totally different content here now")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in incremental_jaccard_admission(
        corpus, batch, n=3, threshold=0.6).collect()}
    assert out["new-1"].status == "reject"
    # tie between corp-a and corp-b at jaccard 1.0 -> smallest id wins
    assert out["new-1"].match_id == "corp-a"
    assert out["new-2"].status == "admit"
