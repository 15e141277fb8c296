"""Mechanical stale-green guard (VERDICT r8 item 3).

Twice (r7: graph/PQ/session, r8: the sketches KLL guard) a product-code
change landed AFTER the round's CORRECTNESS_WINDOW was pinned, leaving a
query whose driver green no longer matches its backing code -- and only
the judge's manual git archaeology caught it.  This script makes the
rule mechanical.  Run it at ROUND CLOSE (after the final product
commit, before handing the round to the driver):

    python scratch/stale_green_guard.py

Logic:
  1. BASELINE = the last commit that touched a CORRECTNESS_r*.json file
     (the previous round's driver artifacts -- the moment every green in
     that file was known-fresh).
  2. For every product module changed since BASELINE (committed or
     working tree), compute a BEHAVIOR fingerprint: the module AST with
     docstrings stripped (comments never reach the AST).  Docstring- or
     comment-only edits therefore do NOT mark queries stale.
  3. Every registry query whose fn is DEFINED in a behavior-changed
     module must be in the CURRENT CORRECTNESS_WINDOW -- else its next
     driver green would be produced by the round AFTER its code changed,
     i.e. a stale green.  Exit 1 listing the offenders.
  4. Changed modules that define no registry queries (streaming twins,
     shared infra like session.py / functions/) are reported as WARN:
     they back many queries indirectly; adjudicate with the full local
     parity suite (scratch/drive_driver.py) instead of window slots.
     registry.py itself is WARN-only too: the window pin lives there, so
     hard-failing on it would be circular.

Granularity note: "defined in" (fn.__module__) is the same granularity
the r7/r8 verdicts used to flag staleness.  It is deliberately coarser
than a transitive import closure (which reaches ~everything via
session.py) and finer than whole-repo.
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streamprocessing_with_kafka_spark.plans.registry import (  # noqa: E402
    CORRECTNESS_WINDOW,
    _REGISTRY,
)

PKG = "streamprocessing_with_kafka_spark"


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


#: module-level assignments that are round METADATA, not behavior: the
#: window pin is re-pinned every round inside registry.py, and without
#: this exclusion the pin edit itself would flag every registry-defined
#: query as stale every round (circular).
_METADATA_ASSIGNS = {"CORRECTNESS_WINDOW", "PENDING_WINDOW"}


def behavior_fingerprint(src: str) -> str:
    """AST dump with docstrings and window-pin metadata stripped: equal
    fingerprints mean the edit cannot have changed runtime behavior (or
    oracle SQL constants, which ARE AST string constants and so are
    fingerprinted)."""
    tree = ast.parse(src)
    tree.body = [
        s
        for s in tree.body
        if not (
            isinstance(s, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id in _METADATA_ASSIGNS
                for t in s.targets
            )
        )
    ]
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return ast.dump(tree)


def main() -> None:
    baseline = git(
        "log", "-1", "--format=%H", "--", "CORRECTNESS_r*.json"
    ).strip()
    if not baseline:
        print("no CORRECTNESS_r*.json history -- nothing to guard")
        return
    print(f"baseline (last driver-artifact commit): {baseline[:12]}")

    changed = set(
        git("diff", "--name-only", baseline, "--", f"{PKG}/").splitlines()
    )
    changed |= set(
        git(
            "ls-files", "--others", "--exclude-standard", "--", f"{PKG}/"
        ).splitlines()
    )
    changed = {f for f in changed if f.endswith(".py")}

    behavior_changed: set[str] = set()
    for f in sorted(changed):
        try:
            old = git("show", f"{baseline}:{f}")
        except subprocess.CalledProcessError:
            old = None  # new module
        path = os.path.join(REPO, f)
        new = open(path).read() if os.path.exists(path) else None
        if new is None:  # deleted module
            behavior_changed.add(f)
            continue
        if old is None or behavior_fingerprint(old) != behavior_fingerprint(new):
            behavior_changed.add(f)
        else:
            print(f"  doc-only  {f}")

    mod_of = {}  # "pkg.operators.foo" -> repo-relative file
    for f in behavior_changed:
        mod_of[f[: -len(".py")].replace("/", ".")] = f

    window = set(CORRECTNESS_WINDOW)
    stale, touched_any = [], set()
    for name, q in _REGISTRY.items():
        m = q.fn.__module__
        if m in mod_of:
            touched_any.add(mod_of[m])
            if q.sql is not None and name not in window:
                stale.append((name, mod_of[m]))

    for f in sorted(behavior_changed - touched_any):
        mod = f[: -len(".py")].replace("/", ".")
        if mod.endswith(".plans.registry"):
            n = sum(1 for q in _REGISTRY.values() if q.fn.__module__ == mod)
            print(
                f"  WARN      {f}: holds the window pin itself + {n} "
                "registry-defined queries -- adjudicate manually"
            )
        else:
            print(
                f"  WARN      {f}: behavior changed, defines no registry "
                "query (streaming twin / shared infra) -- cover via "
                "pytest + scratch/drive_driver.py"
            )

    if stale:
        print(f"\nSTALE GREENS ({len(stale)}): queries whose defining module "
              "changed since baseline but are NOT in CORRECTNESS_WINDOW:")
        for name, f in sorted(stale):
            print(f"  {name}  ({f})")
        sys.exit(1)
    print("\nOK: every behavior-touched registry query is in the window")


if __name__ == "__main__":
    main()
