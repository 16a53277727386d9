"""Dump ``explain("formatted")`` for registry queries to files.

CLI: python tools/capture_plans.py OUTDIR SUFFIX [sf_dir] QUERY [QUERY...]

Writes OUTDIR/<query>_<SUFFIX>.txt per query — the round-8 deliverable
format (plans/r08/<query>_before.txt / _after.txt). The plan is the
pre-execution AdaptiveSparkPlan (isFinalPlan=false); Exchange counts,
join strategies, PushedFilters and ReadSchema are all visible there.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    from dissertation_iceberg_spark.queries.registry import (
        REGISTRY,
        _ensure_loaded,
    )
    from dissertation_iceberg_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("capture-plans")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
