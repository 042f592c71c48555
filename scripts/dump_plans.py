#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for named queries() ids to
plans/$PLAN_ROUND/<id>_<suffix>.txt (PLAN_ROUND defaults to r10) —
the optimization round's before/after plan evidence (guide §1:
capture the plan shape for every query you touch).  Usage:

    python scripts/dump_plans.py <suffix> <id> [<id> ...]

Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) — plan shapes, not
timings, so co-tenant load does not matter.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p2_mapreduce_spark.session import get_spark  # noqa: E402

import __spark_entry__ as contract  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    ids = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLAN_ROUND", "r10"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("p2-plan-dump")
    qs = contract.queries()
    for name in ids:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure
            txt = f"ERROR: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
