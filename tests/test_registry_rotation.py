"""The correctness-window rotation is load-bearing evidence plumbing:
the driver checks ~50 queries from the FRONT of the registry each
round, and `all_queries()` must order never-yet-verified queries
first (oracle-backed ahead of rows-only) for successive rounds to
tile the full surface. Pin the invariant against the real on-disk
artifacts."""

from __future__ import annotations

import json
import os

from dataingestionengineprocess_spark import queries as reg

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_names() -> set[str]:
    """Mirror of the registry rule: hash rows count forever; rows-only
    (no_oracle) rows count only while the query still has no oracle --
    an oracle upgrade must send the query back to the front for a
    full-strength re-check."""
    hash_seen, rows_only = set(), set()
    for name in sorted(os.listdir(ROOT)):
        if name.startswith("CORRECTNESS_r") and name.endswith(".json"):
            with open(os.path.join(ROOT, name)) as f:
                art = json.load(f)
            for q, res in art.items():
                if not isinstance(res, dict):
                    continue
                if res.get("hash_match"):
                    hash_seen.add(q)
                elif res.get("err") == "no_oracle":
                    rows_only.add(q)
    oracles = set(reg.all_oracles())
    return hash_seen | {q for q in rows_only if q not in oracles}


def test_verified_names_match_artifacts():
    reg.all_queries()  # ensure registry is loaded before the mirror
    assert reg._driver_verified_names() == _artifact_names()


def test_registry_orders_unverified_oracles_first():
    ordered = list(reg.all_queries())
    oracles = set(reg.all_oracles())
    verified = reg._driver_verified_names() & set(ordered)

    def tier(name: str) -> int:
        if name not in verified and name in oracles:
            return 0  # full hash check, not yet in any artifact
        if name not in verified:
            return 1  # rows-only check, not yet in any artifact
        return 2      # already evidenced by a prior round

    tiers = [tier(n) for n in ordered]
    assert tiers == sorted(tiers), (
        "registry must be tiered: unverified-oracle, unverified-rows-only, "
        "verified"
    )
    # the driver's ~50-query window must be spent entirely on queries
    # that can still earn NEW full-hash evidence (as long as enough
    # remain)
    n_unverified_oracle = tiers.count(0)
    window = ordered[: min(50, n_unverified_oracle)]
    assert all(tier(n) == 0 for n in window)


def test_verified_tier_reverifies_stalest_first():
    """With the unverified backlog drained (round 8), the driver's
    ~50-query window must be spent on the stalest evidence: the
    verified tier orders by ascending last-verified round so rows
    whose plans were rewritten since their only check (the round-5
    funnel-removal campaign touched many round-1/2 rows) are re-seen
    first, and the rotation keeps tiling oldest-first each round."""
    ordered = list(reg.all_queries())
    rounds = reg._driver_verified_rounds()
    verified_in_order = [rounds[n] for n in ordered if n in rounds]
    assert verified_in_order == sorted(verified_in_order), (
        "verified tier must be ordered stalest-evidence-first")


def test_every_query_has_callable_and_consistent_oracle_keys():
    qs, os_ = reg.all_queries(), reg.all_oracles()
    assert set(os_) <= set(qs), "oracle without a query"
    assert all(callable(f) for f in qs.values())
