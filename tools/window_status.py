"""Driver-window bookkeeping: which registered queries have never
produced a green driver CORRECTNESS row, and what the current 50-slot
window covers.

The driver checks only the first 50 registry entries per round
(DRIVER_WINDOW_PRIORITY), so the rotation must be planned against the
actual CORRECTNESS_r*.json history — this script computes that diff so
the registry comment never goes stale by hand.

Usage: python tools/window_status.py            # status report
       python tools/window_status.py --propose  # print a ready-to-paste
                                                # DRIVER_WINDOW_PRIORITY
                                                # tuple for the NEXT round

--propose applies the rotation policy mechanically: first-proofs beat
re-confirmation (never-driver-checked oracle-backed queries in
registration order fill the window first); any remaining slots go to
the stalest greens (oldest last-green round first). Run it only AFTER
the round's CORRECTNESS_r*.json has landed in the repo root — the
proposal is computed from those files.
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
    if "--propose" in sys.argv:
        # Registration order = module import order, which load_all()
        # perturbs by putting the current window first — recover true
        # registration order for the backlog by iterating the catalog
        # minus the reorder (window names keep their slot eligibility).
        proposal = [n for n in cat if n in set(never)][:50]
        if len(proposal) < 50:
            stale_first = sorted(
                (n for n in cat if n in last_round), key=lambda n: last_round[n]
            )
            proposal += [n for n in stale_first if n not in proposal][
                : 50 - len(proposal)
            ]
        print("DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (")
        for n in proposal:
            tag = "first-proof" if n in set(never) else f"re-confirm (r{last_round[n]:02d})"
            print(f'    "{n}",  # {tag}')
        print(")")
        return 0
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
