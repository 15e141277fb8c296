"""End-to-end self-test for scratch/stale_green_guard.py (r11).

The guard is the round's proof-freshness linchpin, so its load-bearing
behaviors get executable checks against REAL git history, in a
throwaway worktree (scratch/selftest_wt, gitignored):

  1. MUTATION: edit one operator definition in the worktree and assert
     the guard exits 1 naming a query that reaches it -- i.e. a code
     edit to a green query's closure cannot land without a window slot.
  2. BACKLOG CODE-STALE (r12): edit a definition reaching a
     PENDING_WINDOW query and assert the guard exits 1 -- the backlog
     absorbs only conf-closure staleness, never a real code change.
  3. NO-BASELINE ACCOUNTING (r12): a query whose latest green round has
     no artifact commit yet must still seed the unreachable-WARN
     accounting (no false 'reachable from no registry query' WARNs).
  4. ROTATION DRY-RUN: write a synthetic CORRECTNESS_r99.json marking
     the current window green (and commit it, so the artifact commit
     exists), then assert next_window.py's proposed next window rotates
     the committed backlog in oldest-green-first and the new backlog
     SHRINKS -- the r12 procedure, validated before r12.

Run from the repo root: python scratch/guard_selftest.py
Exit 0 iff both checks hold.  The worktree is recreated fresh each run.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WT = os.path.join(REPO, "scratch", "selftest_wt")
PKG = "streamprocessing_with_kafka_spark"


def sh(cwd, *args, check=True):
    return subprocess.run(
        args, cwd=cwd, check=check, capture_output=True, text=True
    )


def fresh_worktree() -> None:
    if os.path.isdir(WT):
        sh(REPO, "git", "worktree", "remove", "--force", WT, check=False)
        shutil.rmtree(WT, ignore_errors=True)
    sh(REPO, "git", "worktree", "prune")
    sh(REPO, "git", "worktree", "add", "--detach", WT, "HEAD")


def run_guard(cwd) -> tuple[int, str]:
    # build-mode semantics on purpose: the self-test proves the guard's
    # hard failures fire, so the full-validation escape hatch (r12,
    # SPARK_GRAFT_FULL_VALIDATION) must not leak in from the caller
    env = {k: v for k, v in os.environ.items()
           if k != "SPARK_GRAFT_FULL_VALIDATION"}
    r = subprocess.run(
        [sys.executable, "scratch/stale_green_guard.py"],
        cwd=cwd, check=False, capture_output=True, text=True, env=env,
    )
    return r.returncode, r.stdout + r.stderr


def green_baseline(round_no: int = 98, names: list[str] | None = None) -> None:
    """Write + COMMIT a synthetic CORRECTNESS_r<no>.json greening EVERY
    registry query in the worktree, so the guard's staleness ledger is
    clean at the worktree's HEAD regardless of the real repo's
    transitional state (r12: an optimization round that edits a shared
    loader makes the whole registry code-stale until the driver's
    full-registry run lands -- without this baseline the 'pristine
    worktree passes' precondition of every check below is unmeetable)."""
    if names is None:
        r = sh(
            WT, sys.executable, "-c",
            "import json; from streamprocessing_with_kafka_spark.plans."
            "registry import registry; print(json.dumps(list(registry())))",
        )
        names = json.loads(r.stdout)
    green = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}
        for n in names
    }
    fname = f"CORRECTNESS_r{round_no}.json"
    with open(os.path.join(WT, fname), "w") as f:
        json.dump(green, f)
    sh(WT, "git", "add", fname)
    sh(WT, "git", "-c", "user.name=selftest", "-c",
       "user.email=selftest@localhost", "commit", "-q", "-m",
       f"selftest: synthetic r{round_no} full-registry green baseline")


def check_mutation() -> None:
    fresh_worktree()
    green_baseline()
    rc, out = run_guard(WT)
    assert rc == 0, f"pristine worktree should pass the guard:\n{out}"

    # mutate ONE definition a known query reaches: joins.SKEW_SALT
    # (join_salted_skew's closure; it holds a green driver row)
    path = os.path.join(WT, PKG, "operators", "joins.py")
    src = open(path).read()
    assert "SKEW_SALT = 8" in src
    open(path, "w").write(src.replace("SKEW_SALT = 8", "SKEW_SALT = 16"))

    rc, out = run_guard(WT)
    assert rc == 1, f"mutated worktree must FAIL the guard:\n{out}"
    assert "join_salted_skew" in out, (
        f"the stale listing must name the reaching query:\n{out}"
    )
    print("  PASS  mutation: SKEW_SALT edit -> exit 1 naming join_salted_skew")


def worktree_windows() -> tuple[list[str], list[str]]:
    """The worktree registry's (CORRECTNESS_WINDOW, PENDING_WINDOW), read
    in a subprocess so the parent's sys.path / module cache stay intact
    (r11 ADVICE item 4: the old in-process import permanently redirected
    the parent's registry to the worktree)."""
    r = sh(
        WT, sys.executable, "-c",
        "import json; from streamprocessing_with_kafka_spark.plans."
        "registry import CORRECTNESS_WINDOW, PENDING_WINDOW; "
        "print(json.dumps([CORRECTNESS_WINDOW, PENDING_WINDOW]))",
    )
    window, backlog = json.loads(r.stdout)
    return window, backlog


def check_rotation_dry_run() -> None:
    fresh_worktree()
    CORRECTNESS_WINDOW, PENDING_WINDOW = worktree_windows()
    # age-structured synthetic history: backlog greens strictly OLDEST
    # (r97), everything else r98, then the r99 window below -- the
    # rotation ranks by green age, and a flat all-one-round baseline
    # destroys the signal the check exists to exercise
    green_baseline(97)
    r = sh(
        WT, sys.executable, "-c",
        "import json; from streamprocessing_with_kafka_spark.plans."
        "registry import registry; print(json.dumps(list(registry())))",
    )
    all_names = json.loads(r.stdout)
    green_baseline(98, [n for n in all_names if n not in set(PENDING_WINDOW)])

    # synthetic r99: the driver greens the whole current window
    green = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}
        for n in CORRECTNESS_WINDOW
    }
    with open(os.path.join(WT, "CORRECTNESS_r99.json"), "w") as f:
        json.dump(green, f)
    sh(WT, "git", "add", "CORRECTNESS_r99.json")
    sh(WT, "git", "-c", "user.name=selftest", "-c",
       "user.email=selftest@localhost", "commit", "-q", "-m",
       "selftest: synthetic r99 driver artifacts")

    r = sh(WT, sys.executable, "scratch/next_window.py")
    m = re.search(r"CORRECTNESS_WINDOW = \[(.*?)\n\]", r.stdout, re.S)
    nxt = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    m2 = re.search(r"PENDING_WINDOW = \[(.*?)\]\s*$", r.stdout, re.S)
    nxt_backlog = re.findall(r'"([a-z0-9_]+)"', m2.group(1))

    rotation = [n for n in nxt[12:] if n in set(PENDING_WINDOW)]
    # every committed backlog entry that FITS (38 non-parity slots) must
    # rotate in; once the backlog is smaller than the window's free
    # slots, ALL of it rotates and the proposed backlog empties
    expected = min(len(PENDING_WINDOW), len(nxt) - 12)
    assert len(rotation) >= expected, (
        f"the proposed next window must rotate the committed backlog in; "
        f"only {len(rotation)} of {expected} came from it:\n{nxt[12:]}"
    )
    assert len(nxt_backlog) <= max(0, len(PENDING_WINDOW) - expected), (
        f"the backlog must SHRINK by the rotated count: "
        f"{len(PENDING_WINDOW)} -> {len(nxt_backlog)}"
    )
    assert not set(nxt_backlog) - set(PENDING_WINDOW), (
        "no NEW names may enter the backlog from a green-only round"
    )
    print(f"  PASS  rotation dry-run: {len(rotation)} backlog queries rotate "
          f"into the next window; backlog {len(PENDING_WINDOW)} -> "
          f"{len(nxt_backlog)}")


def check_backlog_code_stale() -> None:
    """r11 ADVICE item 1: a REAL operator edit reaching a PENDING_WINDOW
    query must FAIL the guard -- the backlog only absorbs conf-closure
    staleness, never a code change."""
    fresh_worktree()
    green_baseline()
    _window, backlog = worktree_windows()
    assert "agg_abc_parts" in backlog, (
        "this check mutates agg_abc_parts's closure; re-target it if the "
        f"query left the backlog: {backlog}"
    )
    path = os.path.join(WT, PKG, "operators", "analytics.py")
    src = open(path).read()
    assert "ABC_BUCKETS = 32" in src
    open(path, "w").write(src.replace("ABC_BUCKETS = 32", "ABC_BUCKETS = 64"))

    rc, out = run_guard(WT)
    assert rc == 1, f"code edit to a backlog query must FAIL the guard:\n{out}"
    assert "agg_abc_parts" in out and "BACKLOG CODE-STALE" in out, (
        f"the failure must name the backlog query as code-stale:\n{out}"
    )
    print("  PASS  backlog code-stale: ABC_BUCKETS edit -> exit 1 naming "
          "agg_abc_parts (backlog cannot absorb code changes)")


def check_no_baseline_false_warn() -> None:
    """r11 VERDICT item 5: a query whose latest green round has NO
    artifact commit yet (post-driver / pre-commit) must still seed the
    unreachable-WARN accounting -- the old guard skipped it, falsely
    reporting nodes only it reaches as 'reachable from no registry
    query' (seen live on text.VOCAB_GROWTH_SQL at r11 close)."""
    fresh_worktree()
    green_baseline()
    # change a node reached by join_salted_skew...
    path = os.path.join(WT, PKG, "operators", "joins.py")
    src = open(path).read()
    assert "SKEW_SALT = 8" in src
    open(path, "w").write(src.replace("SKEW_SALT = 8", "SKEW_SALT = 16"))
    # ...and make an UNCOMMITTED r99 green its latest green round
    with open(os.path.join(WT, "CORRECTNESS_r99.json"), "w") as f:
        json.dump({"join_salted_skew": {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}}, f)

    rc, out = run_guard(WT)
    # the query correctly needs a fresh trustworthy green (exit 1)...
    assert rc == 1 and "join_salted_skew" in out, (
        f"uncommitted-green query with changed closure must still fail:\n{out}"
    )
    # ...but its nodes must NOT be reported as reachable from no query
    false_warns = [
        ln for ln in out.splitlines()
        if "reachable from no registry query" in ln and "SKEW_SALT" in ln
    ]
    assert not false_warns, (
        f"never-green queries must still seed reached_latest:\n{false_warns}"
    )
    print("  PASS  no-baseline accounting: uncommitted r99 green -> no "
          "false unreachable-WARN for SKEW_SALT")


def main() -> None:
    print("guard self-test:")
    try:
        check_mutation()
        check_backlog_code_stale()
        check_no_baseline_false_warn()
        check_rotation_dry_run()
    finally:
        sh(REPO, "git", "worktree", "remove", "--force", WT, check=False)
        shutil.rmtree(WT, ignore_errors=True)
        sh(REPO, "git", "worktree", "prune")
    print("RESULT: ALL GREEN")


if __name__ == "__main__":
    main()
