"""Semantic invariants for the curation surface (parity with the
DuckDB oracles is covered by test_oracle_parity; these pin the
properties the oracles can't express)."""

from __future__ import annotations

import duckdb

from dataingestionengineprocess_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _doc_counts():
    return duckdb.sql(
        f"SELECT count(*) AS n, count(DISTINCT source) AS s "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()


def test_packing_partitions_every_doc(spark):
    rows = all_queries()["curation_sequence_packing"](spark, SF).collect()
    n_docs, n_sources = _doc_counts()
    assert sum(r.n_docs for r in rows) == n_docs
    # pack ids per source are contiguous from 0 (no budget gap can be
    # skipped: a doc starting past a boundary fills the earlier pack).
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.pack_id)
    assert len(by_src) == n_sources
    for ids in by_src.values():
        assert sorted(ids) == list(range(len(ids)))


def test_decontaminate_excludes_benchmark_docs(spark):
    rows = all_queries()["curation_decontaminate"](spark, SF).collect()
    assert rows, "fixture vocab is small; overlap must exist"
    assert all(r.doc_id % 11 != 0 for r in rows)
    assert all(r.n_hits >= 1 for r in rows)


def test_pii_redaction_counts_and_scrubs(spark):
    df = all_queries()["curation_pii_redaction"](spark, SF)
    rows = df.collect()
    n_docs, _ = _doc_counts()
    assert len(rows) == n_docs
    # every doc got exactly the one synthetic email + one IP appended
    assert all(r.n_emails == 1 for r in rows)
    assert all(r.n_ips == 1 for r in rows)
    assert all(r.clean_len > 0 for r in rows)


def test_domain_mix_rates_and_budgets(spark):
    rows = all_queries()["curation_domain_mix"](spark, SF).collect()
    _, n_sources = _doc_counts()
    assert len(rows) == n_sources
    for r in rows:
        assert 0.0 < r.rate <= 1.0
        assert 0 <= r.kept_tokens <= r.src_tokens
    # uniform fixture sources -> mean tokens ~= every source's tokens,
    # so every rate is ~1 and nearly everything is kept.
    assert sum(r.kept_docs for r in rows) > 0
