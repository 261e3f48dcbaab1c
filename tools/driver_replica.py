"""Pre-flight the driver's correctness gate locally.

Replicates what the driver does each round: take the first N entries
of ``__spark_entry__.queries()`` (the driver checks a bounded window
from the front), run each at sf0.01 on Spark AND its ``oracle_sql()``
on DuckDB, compare row count + sorted column names + an
order-insensitive value digest. Prints one line per query and a
summary, exits non-zero on any mismatch.

    python tools/driver_replica.py [N | name1,name2,...] [sf_dir]

The first argument may also be a comma-separated list of query names:
new queries register at the BACK of the rotated registry (behind the
pre-flighted driver window), so a name list is how a fresh addition
gets the same digest check without sweeping the whole front.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from dataingestionengineprocess_spark.oracle_compare import digest_frame  # noqa: E402

ARG = sys.argv[1] if len(sys.argv) > 1 else "50"
N = int(ARG) if ARG.isdigit() else None
NAMES = None if N is not None else [n for n in ARG.split(",") if n]
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def digest(df: "pd.DataFrame") -> str:
    # 9-digit float rounding absorbs engine ulp drift in the pre-flight;
    # the strict gate (tests/test_oracle_parity.py) uses no rounding.
    return digest_frame(df, float_digits=9)


def main() -> int:
    from dataingestionengineprocess_spark.catalog import TABLES, table_path
    from dataingestionengineprocess_spark.session import get_spark

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    spark = get_spark()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF, t)}')"
        )

    if NAMES is not None:
        unknown = [n for n in NAMES if n not in qs]
        if unknown:
            print(f"unknown query names: {unknown}")
            return 1
        names = NAMES
    else:
        names = list(qs)[:N]
    from dataingestionengineprocess_spark.session import (
        release_persistent_rdds,
    )

    def _release_checkpoints() -> None:
        """Per-query hygiene, same helper as bench.py: the real
        driver's window is ~50 queries per round -- a 400-query
        single-session sweep is OUR full-surface gate, and letting 8
        rounds' worth of MEMORY_AND_DISK blocks pin the default-1g
        heap eventually starves task execution memory mid-sweep
        (observed: an executor-side heap OOM at query ~294 on a
        contended host). Releasing per query models successive driver
        rounds."""
        release_persistent_rdds(spark)

    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{i:3d} {name:40s} SPARK-ERROR {type(e).__name__}: {e}")
            _release_checkpoints()
            continue
        if name not in oracles:
            print(f"{i:3d} {name:40s} rows-only rows={len(sdf)} "
                  f"{time.time() - t0:.1f}s")
            _release_checkpoints()
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{i:3d} {name:40s} ORACLE-ERROR {type(e).__name__}: {e}")
            _release_checkpoints()
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and digest(sdf) == digest(odf)
        status = "PASS" if ok_hash else "FAIL"
        if not ok_hash:
            failures.append(name)
        print(f"{i:3d} {name:40s} {status} rows={len(sdf)}/{len(odf)} "
              f"cols={'ok' if ok_cols else sorted(sdf.columns)} "
              f"{time.time() - t0:.1f}s")
        _release_checkpoints()
    print(f"\n{len(names) - len(failures)}/{len(names)} pass; "
          f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
