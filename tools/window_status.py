"""Driver-window bookkeeping: which registered queries have never
produced a green driver CORRECTNESS row, and what the current 50-slot
window covers.

The driver checks only the first 50 registry entries per round
(DRIVER_WINDOW_PRIORITY), so the rotation must be planned against the
actual CORRECTNESS_r*.json history — this script computes that diff so
the registry comment never goes stale by hand.

Usage: python tools/window_status.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_application_with_vectordb_spark.plans.registry import (  # noqa: E402
    DRIVER_WINDOW_PRIORITY,
    load_all,
)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    last_round: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(f) if c.isdigit()))
        for name, row in json.load(open(f)).items():
            if row.get("hash_match") or row.get("rows_match"):
                green.add(name)
                last_round[name] = rnd
    cat = load_all()
    never = [n for n in cat if n not in green and cat[n].oracle is not None]
    no_oracle = [n for n in cat if cat[n].oracle is None]
    window = list(DRIVER_WINDOW_PRIORITY)
    first_proofs = [n for n in window if n not in green]
    print(f"registered:            {len(cat)}")
    print(f"oracle-backed:         {len(cat) - len(no_oracle)}")
    print(f"ever driver-green:     {len(green & set(cat))}")
    print(f"never-checked backlog: {len(never)} (oracle-backed)")
    print(f"window first-proofs:   {len(first_proofs)}/{len(window)}")
    stale = sorted(
        ((r, n) for n, r in last_round.items() if n in cat), key=lambda t: t[0]
    )[:10]
    print("\nstalest greens (last green round, name):")
    for r, n in stale:
        print(f"  r{r:02d}  {n}")
    print("\nnever-checked AND not in this window (next rotations):")
    for n in never:
        if n not in window:
            print(f"  {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
