"""Round-4 query invariants beyond the oracle gate: the JDBC read is
genuinely partitioned, the repetition filters match a pure-Python
reference, DSIR selects exactly floor(n/4) docs with deterministic
re-runs, and the BPE certificate's first merge equals the reference
trainer's first merge."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dataingestionengineprocess_spark.queries import all_queries


def test_jdbc_roundtrip_read_is_partitioned(spark, sf_dir):
    """The readback must fan out over numPartitions JDBC range
    queries, not funnel through one connection."""
    from dataingestionengineprocess_spark.queries.round4 import (
        _DERBY_DRIVER, _derby_url,
    )
    from dataingestionengineprocess_spark.sources.jdbc import (
        JdbcConfig, read_jdbc,
    )

    # run the query once so the Derby table exists
    out = all_queries()["source_jdbc_roundtrip"](spark, sf_dir).collect()
    assert len(out) == 5  # five regions
    assert sum(r.n_nations for r in out) == 25

    # resolve the exact path the query used (shared derivation rule,
    # no wipe) and assert the partition contract on a fresh read of
    # the published table
    from dataingestionengineprocess_spark.catalog import scratch_path

    path = scratch_path("derby_jdbc", sf_dir)
    cfg = JdbcConfig(
        url=_derby_url(path), table="nation",
        properties={"driver": _DERBY_DRIVER},
        partition_column="n_nationkey", lower_bound="0",
        upper_bound="25", num_partitions=4,
    )
    back = read_jdbc(spark, cfg)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 25


def test_repetition_filters_match_reference(spark, sf_dir):
    """Spark fractions/gates == a pure-Python recount on the same
    docs (independent of the DuckDB oracle)."""
    from dataingestionengineprocess_spark.catalog import load

    got = {
        r.doc_id: r
        for r in all_queries()["text_repetition_filters"](spark, sf_dir)
        .collect()
    }
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    import math

    checked = 0
    for d in docs[:50]:
        t = d.text.split(" ")
        if len(t) < 3:
            assert d.doc_id not in got
            continue
        g2 = Counter(zip(t, t[1:]))
        g3 = Counter(zip(t, t[1:], t[2:]))
        tot2, tot3 = sum(g2.values()), sum(g3.values())
        top2 = max(g2.values())
        dup3 = sum(c for c in g3.values() if c > 1)
        r = got[d.doc_id]
        assert r.top2_frac == math.floor(top2 * 1e6 / tot2 + 0.5) / 1e6
        assert r.dup3_frac == math.floor(dup3 * 1e6 / tot3 + 0.5) / 1e6
        assert r.keep == (top2 * 12 <= tot2 and dup3 * 10 <= tot3)
        checked += 1
    assert checked >= 40


def test_dsir_selects_exact_quarter_deterministically(spark, sf_dir):
    rows = all_queries()["curation_dsir_weights"](spark, sf_dir).collect()
    n = len(rows)
    assert sum(1 for r in rows if r.selected) == int(n * 0.25)
    again = all_queries()["curation_dsir_weights"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bpe_certificate_first_merge_matches_reference(spark, sf_dir):
    """The certificate's first merge must equal a pure-Python
    frequency count's argmax under (count DESC, pair ASC)."""
    from dataingestionengineprocess_spark.catalog import load

    cert = {
        r.item: r
        for r in all_queries()["text_bpe_train_certificate"](spark, sf_dir)
        .collect()
    }
    assert cert["well_formed_chain"].ok

    freq: Counter = Counter()
    for d in load(spark, sf_dir, "documents").select("text").collect():
        for w, c in Counter(
            w for w in d.text.split(" ") if w
        ).items():
            for a, b in zip(w, w[1:]):
                freq[(a, b)] += c
    (l, r), c = min(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    fm = cert["first_merge"]
    assert (fm.left_sym, fm.right_sym, fm.pair_freq) == (l, r, c)


def test_persisted_shingle_index_maintenance(spark, tmp_path):
    """The deployment loop: admit batch 1 against the published index,
    APPEND the admitted docs' index rows as the next snapshot, and
    batch 2 must then be rejected against batch-1 content it
    duplicates -- the corpus is never re-scanned."""
    from pyspark.sql import Row

    from dataingestionengineprocess_spark.operators.dedup import (
        build_shingle_index,
        incremental_jaccard_admission,
    )
    from dataingestionengineprocess_spark.sinks.versioned import (
        VersionedTable,
    )

    corpus = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=2, text="one two three four five six seven"),
    ])
    b1 = spark.createDataFrame([
        Row(doc_id=10, text="red orange yellow green blue indigo"),
        Row(doc_id=11, text="alpha beta gamma delta epsilon zeta"),  # dup of 1
    ])
    b2 = spark.createDataFrame([
        Row(doc_id=20, text="red orange yellow green blue indigo"),  # dup of 10
    ])

    vt = VersionedTable(spark, str(tmp_path / "idx"))
    vt.publish(build_shingle_index(corpus, n=3))

    d1 = {r.doc_id: r for r in incremental_jaccard_admission(
        None, b1, corpus_index=vt.read(), n=3, threshold=0.6).collect()}
    assert d1[10].status == "admit"
    assert d1[11].status == "reject" and d1[11].match_id == 1

    admitted = b1.filter(F.col("doc_id") == 10)
    vt.publish(vt.read().unionByName(build_shingle_index(admitted, n=3)))

    d2 = {r.doc_id: r for r in incremental_jaccard_admission(
        None, b2, corpus_index=vt.read(), n=3, threshold=0.6).collect()}
    assert d2[20].status == "reject" and d2[20].match_id == 10
    assert vt.current_version() == 2
