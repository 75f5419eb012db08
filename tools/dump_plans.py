"""Dump .explain("formatted") for named registry queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> [query ...]
       (default query set = both bench suites)

Writes plans/<round>/<query>_<suffix>.txt for each query, where <round> is
$SPARK_GRAFT_PLANS_ROUND (default "r13"). The bench's sf dir is taken from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) so the plan matches what
the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_vectordb_spark.plans.parity import REGISTRY  # noqa: E402
from auto_vectordb_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE, HEADLINE_V2  # noqa: E402

        names = [*HEADLINE, *HEADLINE_V2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
