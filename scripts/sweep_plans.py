"""Regenerate the PLANS.md SinglePartition / anti-pattern census over
every registered query — the audit that went stale twice (VERDICT r5,
r6) when registrations outpaced the hand-run sweep. Run after adding
queries; paste the census into PLANS.md.

    python scripts/sweep_plans.py [sf_dir]

Prints one line per query that carries any of: SinglePartition
exchanges, CartesianProduct, non-broadcast nested-loop joins — plus a
summary block formatted for PLANS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_mapreduce_spark.plans.registry import load_all  # noqa: E402
from ds_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-sweep")
    registry = load_all()
    single: dict[str, int] = {}
    cartesian: list[str] = []
    errors: dict[str, str] = {}
    for name, q in registry.items():
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        n = plan.count("Exchange SinglePartition")
        if n:
            single[name] = n
        if "CartesianProduct" in plan:
            cartesian.append(name)
    print(f"queries: {len(registry)}")
    print(f"with SinglePartition: {len(single)} "
          f"(total exchanges {sum(single.values())})")
    for k in sorted(single, key=lambda k: (-single[k], k)):
        print(f"  {k}: {single[k]}")
    print(f"CartesianProduct offenders: {cartesian or 'none'}")
    if errors:
        print("ERRORS (query failed to plan):")
        for k, v in errors.items():
            print(f"  {k}: {v}")
        sys.exit(1)


if __name__ == "__main__":
    main()
