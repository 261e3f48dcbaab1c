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
    # Registration order is deliberate: the driver's per-round
    # CORRECTNESS artifact has historically covered a bounded window
    # of the registry (50 queries in round 1), so the modules whose
    # queries have NOT yet appeared in a driver artifact register
    # first.  Round 1 verified relational/windows/streaming
    # (CORRECTNESS_r01.json: 48 hash-pass, 2 rows-only, 0 fail);
    # those now register last so the LLM-pipeline, scalar, TPC-H
    # analog, analytics, and extension surface lands inside the
    # driver's window this round.
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
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


_LOADED = False


def all_queries() -> dict[str, QueryFn]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLES)
