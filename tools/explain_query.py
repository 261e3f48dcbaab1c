"""Dump `.explain("formatted")` for named queries to files.

    python tools/explain_query.py name1,name2,... <out_suffix> [sf_dir]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<out_suffix>.txt for each
query (round dir defaults to r11).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestionengineprocess_spark.queries import all_queries  # noqa: E402
from dataingestionengineprocess_spark.session import (  # noqa: E402
    get_spark,
    release_persistent_rdds,
)


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("explain", extra_confs={
        "spark.ui.enabled": "false",
        "spark.driver.memory": "8g",
    })
    registry = all_queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        release_persistent_rdds(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
