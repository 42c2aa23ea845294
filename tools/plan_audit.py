"""One-shot catalog plan audit backing the r9 lint work.

For every registered query this builds the physical plan twice:

1. under ``spark.sql.autoBroadcastJoinThreshold=-1`` — a would-be
   cartesian cannot hide behind the auto-broadcast fallback at fixture
   scale (the ADVICE r8 finding: the motivating geo bug's relations are
   under the 2 MB fixture threshold, so the CartesianProduct lint never
   saw the quadratic shape it was written for). Explicit
   ``F.broadcast()`` hints still apply, which is exactly the contract we
   want: a bounded side must be DECLARED bounded, not accidentally small.
2. under the normal fixture conf — counting parquet scans of the fact
   tables (lineitem / events / documents) per plan. The r8 sf10 audit's
   worst finds were N-fold fact re-scans (graph_triangles: 70 lineitem
   scans), a class the CartesianProduct lint cannot see.

Prints one line per offender; exit 0 always (audit, not gate — the
gates live in tests/test_registry_contract.py).
"""

from __future__ import annotations

import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_application_with_vectordb_spark.plans.registry import load_all  # noqa: E402
from rag_application_with_vectordb_spark.plans.plan_introspect import (  # noqa: E402
    effective_fact_scans,
    single_partition_fact_exposures,
)
from rag_application_with_vectordb_spark.session import get_spark  # noqa: E402

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    spark = get_spark("plan-audit", cpus=4, shuffle_partitions=4)
    specs = load_all()
    if names:
        specs = {n: specs[n] for n in names}
    n_cart = n_scan = n_sp = 0
    for name, spec in specs.items():
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            if "CartesianProduct" in plan:
                n_cart += 1
                print(f"CARTESIAN-at-nobroadcast  {name}")
        except Exception as exc:  # noqa: BLE001
            print(f"ERR(nobroadcast) {name}: {exc}")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(2 * 1024 * 1024))
        try:
            df = spec.fn(spark, sf_dir)
            counts = effective_fact_scans(df)
            worst = {t: c for t, c in counts.items() if c > 3}
            if worst:
                n_scan += 1
                print(f"FACT-RESCAN>3  {name}  {worst}")
            sp = single_partition_fact_exposures(df)
            if sp:
                n_sp += 1
                print(f"SINGLE-PARTITION-FACT  {name}  {sp} exchange(s)")
        except Exception as exc:  # noqa: BLE001
            print(f"ERR(scan) {name}: {exc}")
    print(
        f"done: {len(specs)} plans, {n_cart} cartesian-at-nobroadcast, "
        f"{n_scan} fact-rescan>3, {n_sp} single-partition-fact"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
