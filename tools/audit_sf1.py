"""Full-oracle sf1.0 audit as a reconciled ARTIFACT (VERDICT r11 items 4+5).

r11 ran a catalog-wide sf1.0 full-oracle audit of every scalar-risk
oracle-backed query (the q1 ulp-drift class check) but left the
evidence as a NEXT.md paragraph — nothing a later reader can reconcile
the way the sf10 sweep logs reconcile. This tool re-emits that audit as
a resumable log file ending in a ``# audit RECONCILED`` summary block,
exactly the sweep's contract:

* ``--mode scalar`` (default): every oracle-backed query EXCEPT the
  heavy unrolled-oracle families — queries tagged ``ann``, ``graph``,
  ``dedup`` or ``iterative``, whose DuckDB twins unroll iterative
  algorithms (k-means epochs, BFS rounds, LSH band cross-joins) into
  multi-hour SQL at sf1.0. Those are NOT skipped forever — see heavy
  mode.
* ``--mode heavy --budget N`` (default 5): the rotating sf1.0
  value-parity sample over the heavy families (VERDICT r11 item 5).
  Picks the N heavy queries whose last full-oracle sf1.0 proof is
  OLDEST (never-proven first, then by recorded round) from the ledger
  ``HEAVY_SF1_LEDGER.json``, runs them full-oracle, and advances the
  ledger for the greens. The ledger is the second window_status: a
  per-family staleness rotation, bounded per round so a multi-hour
  DuckDB twin can't eat the session.

Execution is delegated to ``tools/check_oracle.py`` (full-oracle mode,
``--exact``, ``--resume-log``) with the sweep's retry loop: a fatal
query kills the JVM, the resume log lets the next attempt skip settled
rows; 2 strikes settles a failure.

Usage:
    python tools/audit_sf1.py --round 12                 # scalar set
    python tools/audit_sf1.py --round 12 --mode heavy    # 5 stalest heavy
    python tools/audit_sf1.py --round 12 --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAVY_TAGS = frozenset({"ann", "graph", "dedup", "iterative"})
LEDGER = os.path.join(REPO, "HEAVY_SF1_LEDGER.json")

sys.path.insert(0, REPO)

from tools.scale_sweep import parse_log, pending_queries  # noqa: E402


def split_catalog() -> tuple[dict, dict]:
    """(scalar-risk specs, heavy specs) — oracle-backed only."""
    from rag_application_with_vectordb_spark.plans.registry import load_all

    specs = {n: s for n, s in load_all().items() if s.oracle}
    heavy = {n: s for n, s in specs.items() if HEAVY_TAGS & set(s.tags or ())}
    scalar = {n: s for n, s in specs.items() if n not in heavy}
    return scalar, heavy


def load_ledger() -> dict[str, int]:
    if os.path.exists(LEDGER):
        return json.load(open(LEDGER))
    return {}


def pick_heavy(heavy: dict, budget: int) -> list[str]:
    """Never-proven first, then oldest recorded proof round, name-stable."""
    ledger = load_ledger()
    return sorted(heavy, key=lambda n: (ledger.get(n, -1), n))[:budget]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--mode", choices=("scalar", "heavy"), default="scalar")
    ap.add_argument("--budget", type=int, default=5, help="heavy-mode sample size")
    ap.add_argument("--sf-dir", default=os.path.join(REPO, "testdata_local", "sf1.0"))
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    if not os.path.isdir(args.sf_dir):
        raise SystemExit(f"{args.sf_dir} missing — python tools/gen_sf.py 1.0 first")

    scalar, heavy = split_catalog()
    if args.mode == "scalar":
        selected = sorted(scalar)
        log = args.log or os.path.join(REPO, f"AUDIT_SF1_r{args.round:02d}.log")
    else:
        selected = pick_heavy(heavy, args.budget)
        log = args.log or os.path.join(REPO, f"AUDIT_SF1_HEAVY_r{args.round:02d}.log")

    print(f"mode={args.mode} selected={len(selected)} log={log}")
    if args.dry_run:
        ledger = load_ledger()
        for n in selected:
            print(f"  {n}  (last sf1.0 proof: r{ledger.get(n, '--')})" if args.mode == "heavy" else f"  {n}")
        return 0

    sel = set(selected)
    for attempt in range(4):
        green, failed, fail_counts = parse_log(log, sel)
        pending = pending_queries(sel, green, failed, fail_counts)
        if not pending:
            break
        cmd = [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracle.py"),
            args.sf_dir,
            "--exact",
            "--timeout-per-query",
            str(args.timeout),
        ]
        if os.path.exists(log):
            cmd += ["--resume-log", log]
            print(f"attempt {attempt + 1}: resuming {log} ({len(pending)} pending)")
        cmd += sorted(pending)
        with open(log, "a") as fh:
            fh.write(
                f"# audit_sf1 round={args.round} mode={args.mode} "
                f"sf_dir={args.sf_dir} selected={len(selected)} attempt={attempt + 1}\n"
            )
            fh.flush()
            subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT, cwd=REPO)
        green2, failed2, fc2 = parse_log(log, sel)
        if len(pending_queries(sel, green2, failed2, fc2)) >= len(pending) and attempt:
            print("no progress this attempt — stopping retries")
            break

    green, failed, fail_counts = parse_log(log, sel)
    superseded = sum(n for q, n in fail_counts.items() if q in green)
    missing = sorted(sel - green - failed)
    if failed:
        verdict, rc = "RED", 1
    elif missing:
        verdict, rc = "INCOMPLETE", 2
    else:
        verdict, rc = "GREEN", 0
    summary = [
        f"# audit_sf1 RECONCILED round={args.round} mode={args.mode}: "
        f"gate={verdict} green={len(green)}/{len(selected)} "
        f"superseded-fail-rows={superseded}",
    ]
    if failed:
        summary.append(f"# FAILURES: {sorted(failed)}")
    if missing:
        summary.append(f"# never ran: {missing[:10]}")
    with open(log, "a") as fh:
        fh.write("\n".join(summary) + "\n")
    for line in summary:
        print(line.lstrip("# "))

    if args.mode == "heavy" and green:
        ledger = load_ledger()
        for q in green:
            ledger[q] = args.round
        with open(LEDGER, "w") as fh:
            json.dump(dict(sorted(ledger.items())), fh, indent=1)
        print(f"ledger advanced for {len(green)} queries -> {LEDGER}")
    print(f"AUDIT {verdict}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
