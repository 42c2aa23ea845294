"""Standing scale-up sweep gate (VERDICT r9 item 3).

The r9 sf10 sweep caught five real scale bugs that NO value gate or
plan-shape lint could see (the cache-defeat class: a plan that is
optimal and correct but silently re-materializes per invocation).  A
one-off sweep only protects the round it ran in — this wrapper makes it
a standing per-round gate over a bounded, deterministic slice:

(a) every query TOUCHED this round — a query is "touched" when the
    plans module that registers it changed since the last driver round
    boundary, or when that module references a changed engine module
    (operators/functions/sources/streaming) by dotted or relative
    import name; and
(b) a rotating third of the catalog — ``sorted(names)[round % 3 :: 3]``
    — so any plan regression is caught within <= 3 rounds even when its
    source didn't change (config drift, fixture regeneration, Spark
    upgrades).

Execution is delegated to ``tools/check_oracle.py`` with the sweep
posture: ``--spark-only`` (scale-up fixtures have no per-row oracle
budget; the gate is "completes, bounded, driver-canon-compatible"),
``--timeout-per-query 600`` (a wedged exact-anchor regime must not
stall the sweep), and ``--resume-log`` (a crashed sweep resumes instead
of restarting — the r9 sweep survived a py4j crash exactly this way).

Usage:
    python tools/scale_sweep.py --round 10                # default sf10
    python tools/scale_sweep.py --round 10 --sf-dir testdata_local/sf1.0
    python tools/scale_sweep.py --round 10 --dry-run      # list, don't run
    python tools/scale_sweep.py --round 10 --since <ref>  # explicit base

The round boundary default is the most recent driver commit
(``git log --grep '^round [0-9]*:' -1``); everything after it is "this
round".  The log lands at ``SF10_SWEEP_r{round}.log`` (or
``SCALE_SWEEP_*`` for non-default fixtures) and re-running resumes it.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "rag_application_with_vectordb_spark"
ENGINE_DIRS = ("operators", "functions", "sources", "streaming", "plans")

#: The documented exact inverted-index anchors: their candidate volume
#: is Σ df·(df−1)/2, which degenerates to all-pairs on the low-entropy
#: synthetic scale-up corpus — each refuses FAST via the candidate-
#: volume guard naming its scalable twin (operators/dedup.py).  A FAIL
#: row for one of these at sf10 is the documented contract, not a
#: regression; anything else failing flunks the gate.
EXPECTED_SCALE_REFUSALS = {
    "dedup_ngram_jaccard",
    "dedup_prefix_filter_pairs",
    "dedup_prefix_filter_pairs_keyed",
    "text_containment_pairs",
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _round_boundary() -> str:
    out = _git("log", "--grep", "^round [0-9]*:", "-1", "--format=%H")
    if not out:
        raise SystemExit("no driver round-boundary commit found; pass --since")
    return out


def _changed_modules(since: str) -> set[str]:
    """Dotted module suffixes changed since ``since`` (e.g.
    ``operators.prefix``, ``plans.dedup_queries``) — committed AND
    working-tree changes, so the gate covers the round in progress."""
    names = set()
    committed = _git("diff", "--name-only", f"{since}..HEAD").splitlines()
    working = _git("diff", "--name-only", "HEAD").splitlines()
    untracked = _git("ls-files", "--others", "--exclude-standard").splitlines()
    for path in [*committed, *working, *untracked]:
        if not path.startswith(PKG + "/") or not path.endswith(".py"):
            continue
        rel = path[len(PKG) + 1 : -3]
        parts = rel.split("/")
        if parts[0] in ENGINE_DIRS and len(parts) >= 2:
            names.add(".".join(parts))
    return names


def _touched_queries(specs: dict, changed: set[str]) -> set[str]:
    """Queries whose registering plans module changed, or whose FUNCTION
    source (plus its module's top-level import block — everything before
    the first ``def``) references a changed engine module by dotted or
    relative import name.  Per-function granularity: the catalog's plan
    modules import operators function-locally, so matching the whole
    module source would mark every query in a 4000-line module when one
    of them imports a changed operator."""
    import importlib
    import inspect

    changed_plans = {c for c in changed if c.startswith("plans.")}
    engine_changed = changed - changed_plans
    # reference patterns for each changed engine module: the dotted name
    # and the relative-import tail ("from ..operators.prefix import",
    # "from .prefix import" within operators/).
    pats = []
    for mod in engine_changed:
        tail = mod.rsplit(".", 1)[-1]
        pats.append(re.compile(rf"\b{re.escape(mod)}\b|from \.+\w*\.?{re.escape(tail)} import"))
    head_cache: dict[str, str] = {}
    touched = set()
    for name, spec in specs.items():
        mod = spec.fn.__module__  # e.g. rag_..._spark.plans.dedup_queries
        suffix = mod.split(f"{PKG}.", 1)[-1]
        if suffix in changed_plans:
            touched.add(name)
            continue
        if not pats:
            continue
        head = head_cache.get(mod)
        if head is None:
            src = open(importlib.import_module(mod).__file__).read()
            head = src.split("\ndef ", 1)[0]
            head_cache[mod] = head
        try:
            fn_src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            fn_src = ""
        blob = head + "\n" + fn_src
        if any(p.search(blob) for p in pats):
            touched.add(name)
    return touched


def parse_log(log: str, selected_set: set[str]) -> tuple[set[str], set[str], dict[str, int]]:
    """LAST state per query wins (a resumed green supersedes a FAIL
    row from a session that had already died); ``fail_counts``
    counts FAIL/TIMEOUT rows per query across all attempts — a
    query that failed twice is settled (re-running a fatal query
    forever would OOM-loop the retry budget away)."""
    state: dict[str, str] = {}
    fail_counts: dict[str, int] = {}
    if os.path.exists(log):
        for line in open(log):
            if line.startswith(("rows  ", "ok    ")):
                state[line.split()[1].rstrip(":")] = "green"
            elif line.startswith(("FAIL  ", "TIMEOUT  ")):
                q = line.split()[1].rstrip(":")
                state[q] = "failed"
                fail_counts[q] = fail_counts.get(q, 0) + 1
    green = {q for q, s in state.items() if s == "green"} & selected_set
    failed = {q for q, s in state.items() if s == "failed"} & selected_set
    return green, failed, fail_counts


def pending_queries(
    sel: set[str], green: set[str], failed: set[str], fail_counts: dict[str, int]
) -> set[str]:
    """Still owed a run: not green and not settled (2 strikes)."""
    settled = {q for q in failed if fail_counts.get(q, 0) >= 2}
    return sel - green - settled


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--round", type=int, required=True, help="round number (rotation phase + log name)")
    ap.add_argument("--sf-dir", default=os.path.join(REPO, "testdata_local", "sf10.0"))
    ap.add_argument("--since", default=None, help="git ref marking the round start (default: last 'round N:' driver commit)")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--dry-run", action="store_true", help="print the query set and exit")
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    if not os.path.isdir(args.sf_dir):
        raise SystemExit(
            f"{args.sf_dir} missing — generate it first: python tools/gen_sf.py"
        )

    sys.path.insert(0, REPO)
    from rag_application_with_vectordb_spark.plans.registry import load_all

    specs = load_all()
    names = sorted(specs)
    since = args.since or _round_boundary()
    changed = _changed_modules(since)
    touched = _touched_queries(specs, changed)
    rotation = set(names[args.round % 3 :: 3])
    selected = sorted(touched | rotation)

    print(f"round boundary: {since[:12]}  changed modules: {len(changed)}")
    for c in sorted(changed):
        print(f"  changed: {c}")
    print(
        f"touched queries: {len(touched)}  rotation third: {len(rotation)}"
        f"  selected (union): {len(selected)} / {len(names)}"
    )
    if args.dry_run:
        for n in selected:
            marks = ("T" if n in touched else "") + ("R" if n in rotation else "")
            print(f"  {marks:>2}  {n}")
        return 0

    tag = "SF10" if "sf10" in os.path.basename(os.path.normpath(args.sf_dir)) else "SCALE"
    log = args.log or os.path.join(REPO, f"{tag}_SWEEP_r{args.round:02d}.log")

    sel = set(selected)

    def parse(selected_set: set[str]) -> tuple[set[str], set[str], dict[str, int]]:
        return parse_log(log, selected_set)

    def pending_of(green: set[str], failed: set[str], fail_counts: dict[str, int]) -> set[str]:
        return pending_queries(sel, green, failed, fail_counts)
    print(f"logging to {log}")
    # Retry loop: one fatal error (heap OOM) kills the whole JVM;
    # check_oracle aborts at that point, so queries after the fatal one
    # never ran and must re-run in a fresh session. Every non-green
    # query gets retried until it has failed TWICE (so a FAIL row
    # sprayed by a dead session gets its fresh-session chance, while a
    # genuinely fatal query can't OOM-loop the retry budget away).
    for attempt in range(4):
        green, failed, fail_counts = parse(sel)
        pending = pending_of(green, failed, fail_counts)
        if not pending:
            break
        cmd = [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracle.py"),
            args.sf_dir,
            "--spark-only",
            "--exact",  # pending names are WHOLE names — a substring
            # match would re-run settled queries whose name extends a
            # pending one (..._pairs vs ..._pairs_keyed, ADVICE r10)
            "--timeout-per-query",
            str(args.timeout),
        ]
        if os.path.exists(log):
            cmd += ["--resume-log", log]
            print(f"attempt {attempt + 1}: resuming {log} ({len(pending)} pending)")
        # pass only the pending names: settled failures (2 strikes, e.g.
        # the documented anchor refusals) must not re-run every attempt
        cmd += sorted(pending)
        retrying = sorted(pending & failed)
        with open(log, "a") as fh:
            fh.write(
                f"# scale_sweep round={args.round} sf_dir={args.sf_dir} "
                f"since={since[:12]} selected={len(selected)} attempt={attempt + 1}\n"
            )
            if retrying:
                # mark re-runs at write time so a later reader knows any
                # earlier FAIL row for these names is under retry, not
                # a settled verdict
                fh.write(f"# RETRY (1-strike, fresh-session second chance): {retrying}\n")
            fh.flush()
            subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT, cwd=REPO)
        green2, failed2, fc2 = parse(sel)
        # progress = the PENDING set shrank (green+failed counts stay
        # constant on a failed→green conversion because last-state-wins
        # removes the query from failed — the old sum-based heuristic
        # read that as no progress and stopped retrying, ADVICE r10)
        if len(pending_of(green2, failed2, fc2)) >= len(pending) and attempt:
            print("no progress this attempt — stopping retries")
            break

    # Gate verdict: greens are resumable rows; the only acceptable
    # failures are the documented exact-anchor refusals.
    green, failed, fail_counts = parse(sel)
    unexpected = sorted(failed - EXPECTED_SCALE_REFUSALS)
    expected = sorted(failed & EXPECTED_SCALE_REFUSALS)
    # Superseded rows: FAIL/TIMEOUT lines for queries whose FINAL state
    # is green (dead-session poisoning, later re-run clean). The r10 log
    # carried 156 of these for 4 real refusals — a reader grepping FAIL
    # without this reconciliation gets 161 hits. Count them and close
    # the log with a summary block so its tail states the verdict.
    superseded = sum(n for q, n in fail_counts.items() if q in green)
    missing = sorted(sel - green - failed)
    if unexpected:
        verdict, rc = "RED", 1
    elif missing:
        verdict, rc = "INCOMPLETE", 2
    else:
        verdict, rc = "GREEN", 0
    summary = [
        f"# scale_sweep RECONCILED round={args.round}: gate={verdict} "
        f"green={len(green)}/{len(selected)} superseded-fail-rows={superseded}",
        f"# refused (documented anchors, ok): {expected}",
    ]
    if unexpected:
        summary.append(f"# UNEXPECTED failures: {unexpected}")
    if missing:
        summary.append(f"# never ran (crashed sweep? rerun to resume): {missing[:10]}")
    with open(log, "a") as fh:
        fh.write("\n".join(summary) + "\n")
    for line in summary:
        print(line.lstrip("# "))
    print(f"GATE {verdict}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
