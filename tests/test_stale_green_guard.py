"""Unit pins for scratch/stale_green_guard.py's name-level classifier.

The guard is round-close tooling, but its CLASSIFICATION rules are
contracts: a doc/comment-only edit must NOT mark queries stale, a
behavior edit to a helper must reach every query whose closure uses it
(including across modules), and the window-pin metadata edit must stay
excluded (else every re-pin would flag the whole registry). These pins
run the classifier on synthetic sources, no git required.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_GUARD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scratch",
    "stale_green_guard.py",
)
_spec = importlib.util.spec_from_file_location("stale_green_guard", _GUARD)
guard = importlib.util.module_from_spec(_spec)
sys.modules["stale_green_guard"] = guard
_spec.loader.exec_module(guard)

PKG = guard.PKG


def _defs(src: str, mod: str = f"{PKG}.operators.fake"):
    return guard.ModuleDefs(mod, src)


def _changed(old_src: str, new_src: str, mod: str = f"{PKG}.operators.fake"):
    return guard.changed_nodes({mod: _defs(old_src, mod)}, {mod: _defs(new_src, mod)})


def test_docstring_and_comment_edits_are_not_behavior():
    old = 'def q(spark, sf):\n    """old doc."""\n    return 1\nSQL = "SELECT 1"\n'
    new = (
        "# a new comment\n"
        'def q(spark, sf):\n    """totally rewritten doc."""\n    return 1\n'
        'SQL = "SELECT 1"\n'
    )
    assert _changed(old, new) == set()


def test_body_and_sql_constant_edits_are_behavior():
    old = 'def q(s, d):\n    return 1\nSQL = "SELECT 1"\n'
    assert _changed(old, 'def q(s, d):\n    return 2\nSQL = "SELECT 1"\n') == {
        (f"{PKG}.operators.fake", "q")
    }
    assert _changed(old, 'def q(s, d):\n    return 1\nSQL = "SELECT 2"\n') == {
        (f"{PKG}.operators.fake", "SQL")
    }


def test_window_pin_metadata_is_excluded():
    old = 'CORRECTNESS_WINDOW = ["a"]\ndef q(s, d):\n    return 1\n'
    new = 'CORRECTNESS_WINDOW = ["b"]\ndef q(s, d):\n    return 1\n'
    assert _changed(old, new, f"{PKG}.plans.registry") == set()


def test_closure_reaches_cross_module_helper():
    helper_mod = f"{PKG}.operators.helpers"
    query_mod = f"{PKG}.operators.queries"
    tree = {
        helper_mod: _defs(
            "def load_clean(s, d):\n    return d\n", helper_mod
        ),
        query_mod: _defs(
            f"from {helper_mod} import load_clean\n"
            "def my_query(s, d):\n    return load_clean(s, d)\n"
            "def other_query(s, d):\n    return 42\n",
            query_mod,
        ),
    }
    cl = guard.closure(tree, {(query_mod, "my_query")})
    assert (helper_mod, "load_clean") in cl
    cl2 = guard.closure(tree, {(query_mod, "other_query")})
    assert (helper_mod, "load_clean") not in cl2


def test_closure_expands_module_alias_imports():
    """`from pkg.operators import similarity` + `similarity.helper(...)`
    must not dead-end: the alias edge conservatively pulls in the
    aliased module's definitions, so a helper change behind a module
    alias still flags its consumers (r9 review finding)."""
    helper_mod = f"{PKG}.operators.simil"
    query_mod = f"{PKG}.operators.consumer"
    tree = {
        helper_mod: _defs("def helper(s, d):\n    return d\n", helper_mod),
        query_mod: _defs(
            f"from {PKG}.operators import simil\n"
            "def my_query(s, d):\n    return simil.helper(s, d)\n",
            query_mod,
        ),
    }
    cl = guard.closure(tree, {(query_mod, "my_query")})
    assert (helper_mod, "helper") in cl


def test_closure_follows_intra_module_sql_builders():
    mod = f"{PKG}.operators.m"
    tree = {
        mod: _defs(
            "def _builder():\n    return 'SELECT'\n"
            "SQL = _builder()\n"
            "def unrelated():\n    return 0\n",
            mod,
        )
    }
    cl = guard.closure(tree, {(mod, "SQL")})
    assert (mod, "_builder") in cl and (mod, "unrelated") not in cl


def test_guard_runs_green_on_the_real_repo_state():
    """End-to-end: at any committed round-close state the guard must
    exit cleanly (every behavior-changed query windowed). Run via its
    main() against the actual git baseline; tolerate a dirty working
    tree by only asserting it does not CRASH and that stale output, if
    any, lists registry names."""
    import subprocess

    r = subprocess.run(
        [sys.executable, _GUARD],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(_GUARD)),
    )
    # diagnostics (baselines, WARNs) go to STDERR since r12 so that
    # next_window.py's paste-ready stdout stays clean
    assert "baseline" in r.stderr or "nothing to guard" in r.stdout
    # a dead oracle-SQL seed would be a silent stale-green blind spot;
    # the guard prints it loudly and this pin keeps the repo clean of it
    assert "unresolvable seed" not in r.stdout + r.stderr, r.stdout + r.stderr
    if r.returncode != 0:
        # failed for one of the two right reasons
        assert "STALE GREENS" in r.stdout or "BACKLOG CODE-STALE" in r.stdout
