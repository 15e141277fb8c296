"""End-to-end self-test for scratch/stale_green_guard.py (r11).

The guard is the round's proof-freshness linchpin, so its two
load-bearing behaviors get an executable check against REAL git
history, in a throwaway worktree (scratch/selftest_wt, gitignored):

  1. MUTATION: edit one operator definition in the worktree and assert
     the guard exits 1 naming a query that reaches it -- i.e. a code
     edit to a green query's closure cannot land without a window or
     backlog slot.
  2. ROTATION DRY-RUN: write a synthetic CORRECTNESS_r99.json marking
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
    r = sh(cwd, sys.executable, "scratch/stale_green_guard.py", check=False)
    return r.returncode, r.stdout + r.stderr


def check_mutation() -> None:
    fresh_worktree()
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


def check_rotation_dry_run() -> None:
    fresh_worktree()
    sys.path.insert(0, WT)
    for m in [k for k in sys.modules if k.startswith(PKG)]:
        del sys.modules[m]
    from streamprocessing_with_kafka_spark.plans.registry import (  # noqa: E402
        CORRECTNESS_WINDOW,
        PENDING_WINDOW,
    )

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
    assert len(rotation) >= 30, (
        f"the proposed next window must rotate the committed backlog in; "
        f"only {len(rotation)} of 38 slots came from it:\n{nxt[12:]}"
    )
    assert len(nxt_backlog) < len(PENDING_WINDOW), (
        f"the backlog must SHRINK: {len(PENDING_WINDOW)} -> {len(nxt_backlog)}"
    )
    assert not set(nxt_backlog) - set(PENDING_WINDOW), (
        "no NEW names may enter the backlog from a green-only round"
    )
    print(f"  PASS  rotation dry-run: {len(rotation)} backlog queries rotate "
          f"into the next window; backlog {len(PENDING_WINDOW)} -> "
          f"{len(nxt_backlog)}")


def main() -> None:
    print("guard self-test:")
    try:
        check_mutation()
        check_rotation_dry_run()
    finally:
        sh(REPO, "git", "worktree", "remove", "--force", WT, check=False)
        shutil.rmtree(WT, ignore_errors=True)
        sh(REPO, "git", "worktree", "prune")
    print("RESULT: ALL GREEN")


if __name__ == "__main__":
    main()
