"""Named-query registry: the engine's oracle-checkable surface.

Every operator from SURVEY.md §2 ships here as a named query: a
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an equivalent ANSI-SQL string the DuckDB oracle runs on the same
parquet tables. The driver compares row count + schema + value hash.

Registration is decorator-based so each module stays self-contained:

    @register("q1_pricing_summary", oracle=QL_SQL)
    def q1(spark, sf_dir): ...

Parity rules (FIXTURES.md "DuckDB oracle notes"):
- alias every computed column identically in Spark and SQL;
- round float aggregates (sum-order nondeterminism + engine ulp drift);
- pin UTC semantics (session.tune_session) before any timestamp work.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: LSH joins,
    streaming state, stubbed multimodal decode).

    Execution contract (ADVICE r10): CONSTRUCTING a registered query
    -- calling ``fn(spark, sf_dir)`` -- may run eager cluster work
    before the returned frame's own action: bounded collects (model
    fits, strategy probes), eager localCheckpoints, streaming drains,
    and in the extreme (``events_holt_linear``) the full recursion.
    The bench times construction + action together, so this is always
    measured; but plan-only tooling (tools/explain_query.py,
    tools/dump_plans.py) pays that execution too, and anything that
    mutates session state during construction (temp views, scoped
    shuffle-partition pins) assumes the bench's SEQUENTIAL,
    one-query-at-a-time methodology -- do not construct registered
    queries concurrently on one session.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def _load_all() -> None:
    # Import side effect populates the registries.
    #
    # Module order here is only the WITHIN-GROUP tiebreak:
    # ``all_queries`` re-orders the registry each call so that queries
    # not yet covered by any on-disk driver artifact
    # (CORRECTNESS_r*.json) come first -- the driver checks a bounded
    # ~50-query window from the front, so successive rounds
    # automatically tile the full surface without hand-rotating these
    # imports. Highest-value unverified families stay first below so
    # their relative priority holds within the unverified group.
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import mlprep  # noqa: F401
    from . import curation  # noqa: F401
    from . import text  # noqa: F401
    from . import scalars  # noqa: F401
    from . import tpch_more  # noqa: F401
    from . import tpch_rest  # noqa: F401
    from . import analytics  # noqa: F401
    from . import extensions  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import udf  # noqa: F401
    from . import relational  # noqa: F401
    from . import windows  # noqa: F401
    from . import streaming  # noqa: F401
    # round-4+ additions import LAST: new unverified queries append to
    # the BACK of the unverified tier, so a mid-round addition never
    # displaces an already-pre-flighted entry out of the driver's
    # ~50-query correctness window.
    from . import round4  # noqa: F401
    from . import round4b  # noqa: F401
    from . import round4c  # noqa: F401
    from . import round4d  # noqa: F401
    from . import round4e  # noqa: F401
    from . import round4f  # noqa: F401
    from . import round4g  # noqa: F401
    from . import round4h  # noqa: F401
    from . import round4i  # noqa: F401
    from . import round4j  # noqa: F401
    from . import round4k  # noqa: F401
    from . import round4l  # noqa: F401
    from . import round4m  # noqa: F401
    from . import round4n  # noqa: F401
    from . import round4o  # noqa: F401
    from . import round4p  # noqa: F401
    from . import round4q  # noqa: F401
    from . import round4r  # noqa: F401
    from . import round4s  # noqa: F401
    from . import round4t  # noqa: F401
    from . import round4u  # noqa: F401
    from . import round4v  # noqa: F401
    from . import round4w  # noqa: F401
    from . import round4x  # noqa: F401
    from . import round4y  # noqa: F401
    from . import round4z  # noqa: F401
    from . import round5a  # noqa: F401
    from . import round5b  # noqa: F401
    from . import round5c  # noqa: F401
    from . import round5d  # noqa: F401
    from . import round5e  # noqa: F401
    from . import round5f  # noqa: F401
    from . import round5g  # noqa: F401
    from . import round5h  # noqa: F401
    from . import round5i  # noqa: F401
    from . import round5j  # noqa: F401
    from . import round5k  # noqa: F401
    from . import round5l  # noqa: F401
    from . import round5m  # noqa: F401
    from . import round5n  # noqa: F401
    from . import round5o  # noqa: F401
    from . import round5p  # noqa: F401
    from . import round5q  # noqa: F401
    from . import round6  # noqa: F401
    from . import round6b  # noqa: F401
    from . import round6c  # noqa: F401
    from . import round6d  # noqa: F401
    from . import round6e  # noqa: F401
    from . import round6f  # noqa: F401
    from . import round6g  # noqa: F401
    from . import round6h  # noqa: F401
    from . import round6i  # noqa: F401
    from . import round7  # noqa: F401


_LOADED = False


def _driver_verified_names() -> set[str]:
    """Query names already covered by ANY per-round driver artifact
    (``CORRECTNESS_r*.json`` at the repo root). Used to auto-rotate
    registration order: the driver checks a bounded window from the
    FRONT of the registry each round, so not-yet-verified queries must
    register first for successive artifacts to tile the full surface.

    A full hash-match row is evidence forever. A rows-only row
    (``err == "no_oracle"``) evidences the query ONLY while it still
    has no oracle: a query later upgraded with an oracle (e.g. the A3
    sketches' bounded-error booleans) rotates back to the front so the
    driver re-checks it at full hash strength. Callers must invoke
    this after ``_load_all`` so ORACLES is populated."""
    return set(_driver_verified_rounds())


def _driver_verified_rounds() -> dict[str, int]:
    """Map of verified query name -> the LATEST driver round that
    evidenced it (hash rows count forever; rows-only rows count only
    while the query still has no oracle). The round number feeds the
    verified tier's staleness ordering in ``all_queries``: with the
    unverified backlog drained (round 8), the driver's ~50-query
    window is spent re-verifying the stalest evidence first — many
    round-1/2 rows had their plans rewritten by the round-5
    funnel-removal campaign after their only driver check."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    hash_seen: dict[str, int] = {}
    rows_only_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                artifact = json.load(f)
        except (OSError, ValueError):
            continue
        for name, res in artifact.items():
            if not isinstance(res, dict):
                continue
            if res.get("hash_match"):
                hash_seen[name] = max(hash_seen.get(name, 0), rnd)
            elif res.get("err") == "no_oracle":
                rows_only_seen[name] = max(rows_only_seen.get(name, 0), rnd)
    out = dict(hash_seen)
    for n, rnd in rows_only_seen.items():
        if n not in ORACLES and rnd > out.get(n, 0):
            out[n] = rnd
    return out


_VERIFIED: dict[str, int] | None = None


def all_queries() -> dict[str, QueryFn]:
    global _LOADED, _VERIFIED
    if not _LOADED:
        _load_all()
        _LOADED = True
    if _VERIFIED is None:
        # computed once per process: artifacts only change between
        # driver rounds, and a stable iteration order matters more
        # than noticing a mid-session artifact drop
        _VERIFIED = _driver_verified_rounds()
    # Three tiers, front to back: unverified queries WITH an oracle
    # (each one the driver checks is a full hash comparison), then
    # unverified rows-only queries (weaker check, still evidence),
    # then everything already covered by a prior round's artifact —
    # the verified tier ordered STALEST EVIDENCE FIRST (ascending
    # last-verified round, import order as the within-round tiebreak)
    # so that once the unverified backlog is drained (round 8) the
    # driver's window continuously re-verifies the oldest rows, which
    # may have had their plans rewritten since their only check.
    # Within the unverified tiers the import order above is preserved,
    # except that judge-flagged priority names (hardest semantics,
    # most value from driver-side evidence) pin to the very front of
    # their tier until a driver artifact covers them.
    priority = ("stream_rate_limit_gate", "stream_tws_user_stats",
                "ml_gbdt_stumps_portable", "knn_hnsw_layer_portable",
                "ml_als_halfstep_portable")

    def tier_sort(names: list[str]) -> list[str]:
        return ([n for n in priority if n in names]
                + [n for n in names if n not in priority])

    ordered = tier_sort(
        [n for n in QUERIES if n not in _VERIFIED and n in ORACLES])
    ordered += tier_sort(
        [n for n in QUERIES if n not in _VERIFIED and n not in ORACLES])
    import_rank = {n: i for i, n in enumerate(QUERIES)}
    ordered += sorted(
        (n for n in QUERIES if n in _VERIFIED),
        key=lambda n: (_VERIFIED[n], import_rank[n]))
    return {n: QUERIES[n] for n in ordered}


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLES)
