"""Partitioning-invariance audit: every catalog query must produce the
IDENTICAL value hash under different shuffle-partition settings.

Cross-partition fp accumulation order is the classic silent-wrongness
channel in a distributed engine: a query can be green against the
oracle at one partitioning and drift at another (which is exactly what
a 1000-executor deployment is — a different partitioning). The engine's
determinism rules (DECIMAL/integer sums, fixed-order HOF folds, keyed
windows with full tiebreaks) are supposed to make every query
partitioning-proof; this audit checks that claim MECHANICALLY for the
whole catalog instead of trusting per-query reasoning.

Usage: python tools/invariance_audit.py [sf_dir] [name-filter...]
Runs each query under (shuffle.partitions, AQE) = (3, on), (32, on),
(32, off) and compares value hashes — the AQE toggle exercises runtime
re-planning (coalesced partitions, join-strategy flips), which is the
other channel a cluster deployment varies that local testing doesn't.
Exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import value_hash  # noqa: E402
from rag_application_with_vectordb_spark.plans.registry import load_all  # noqa: E402
from rag_application_with_vectordb_spark.session import get_spark  # noqa: E402

# (shuffle.partitions, adaptive.enabled)
SETTINGS = (("3", "true"), ("32", "true"), ("32", "false"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]
    specs = load_all()
    spark = get_spark("invariance-audit")
    failures, skipped = [], []
    for name, spec in sorted(specs.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        hashes = []
        try:
            for parts, aqe in SETTINGS:
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                spark.conf.set("spark.sql.adaptive.enabled", aqe)
                df = spec.fn(spark, sf_dir)
                # query fns call tune(), which re-pins AQE on — re-apply
                # the matrix AFTER plan construction; both confs are read
                # lazily at action time, so this governs the execution
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                spark.conf.set("spark.sql.adaptive.enabled", aqe)
                hashes.append(value_hash(df.collect(), df.columns))
        except Exception as exc:  # noqa: BLE001 — isolate per query
            skipped.append(name)
            print(f"err   {name}: {type(exc).__name__}: {str(exc)[:160]}")
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        if len(set(hashes)) == 1:
            print(f"ok    {name} [{time.time() - t0:.1f}s]")
        else:
            failures.append(name)
            print(f"FAIL  {name}: hash differs across settings {SETTINGS}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if skipped:
        print(f"{len(skipped)} errored (investigate separately): {skipped}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
