"""Unit pins for scratch/stale_green_guard.py's AST machinery.

The guard decides which driver greens are trustworthy, so its three
moving parts get crafted-source pins: definition fingerprinting
(docstrings/comments must NOT count as behavior), changed-node
detection, and the transitive reference closure across the import
styles the package actually uses.  Pure AST -- no git, no Spark.
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
sys.modules.setdefault("stale_green_guard", guard)
_spec.loader.exec_module(guard)

PKG = guard.PKG


def _mod(name, src):
    return guard.ModuleDefs(name, src)


def test_docstring_and_comment_edits_are_not_behavior():
    a = _mod("m", 'def f(x):\n    """old doc"""\n    return x + 1\n')
    b = _mod("m", 'def f(x):\n    """NEW doc"""\n    # a comment\n    return x + 1\n')
    assert a.defs["f"] == b.defs["f"]


def test_body_edit_changes_fingerprint():
    a = _mod("m", "def f(x):\n    return x + 1\n")
    b = _mod("m", "def f(x):\n    return x + 2\n")
    assert a.defs["f"] != b.defs["f"]


def test_constant_and_class_defs_fingerprinted():
    a = _mod("m", "K_SQL = 'SELECT 1'\nclass C:\n    y = 1\n")
    b = _mod("m", "K_SQL = 'SELECT 2'\nclass C:\n    y = 1\n")
    assert a.defs["K_SQL"] != b.defs["K_SQL"]
    assert a.defs["C"] == b.defs["C"]


def test_metadata_assignments_excluded():
    a = _mod("m", "CORRECTNESS_WINDOW = ['x']\nPENDING_WINDOW = []\nREAL = 1\n")
    assert "CORRECTNESS_WINDOW" not in a.defs
    assert "PENDING_WINDOW" not in a.defs
    assert "REAL" in a.defs


def test_changed_nodes_added_removed_and_edited():
    old = {"m": _mod("m", "A = 1\nB = 2\n")}
    new = {"m": _mod("m", "A = 1\nB = 3\nC = 4\n")}
    assert guard.changed_nodes(old, new) == {("m", "B"), ("m", "C")}


def test_closure_follows_from_import_definition_edge():
    tree = {
        f"{PKG}.operators.a": _mod(
            f"{PKG}.operators.a",
            f"from {PKG}.operators.b import helper\n"
            "def query(spark):\n    return helper(spark)\n",
        ),
        f"{PKG}.operators.b": _mod(
            f"{PKG}.operators.b",
            "LIMIT = 5\ndef helper(spark):\n    return LIMIT\n",
        ),
    }
    cl = guard.closure(tree, {(f"{PKG}.operators.a", "query")})
    # the helper AND the constant it references are both in the closure
    assert (f"{PKG}.operators.b", "helper") in cl
    assert (f"{PKG}.operators.b", "LIMIT") in cl


def test_closure_follows_module_alias_attribute():
    # `from pkg.operators import b` then `b.helper(...)`: the alias is a
    # MODULE, so the guard conservatively takes the whole module
    tree = {
        f"{PKG}.operators.a": _mod(
            f"{PKG}.operators.a",
            f"from {PKG}.operators import b\n"
            "def query(spark):\n    return b.helper(spark)\n",
        ),
        f"{PKG}.operators.b": _mod(
            f"{PKG}.operators.b", "def helper(spark):\n    return 1\n"
        ),
    }
    cl = guard.closure(tree, {(f"{PKG}.operators.a", "query")})
    assert (f"{PKG}.operators.b", "helper") in cl


def test_closure_ignores_external_imports():
    tree = {
        f"{PKG}.operators.a": _mod(
            f"{PKG}.operators.a",
            "from pyspark.sql import functions as F\n"
            "def query(spark):\n    return F.lit(1)\n",
        ),
    }
    cl = guard.closure(tree, {(f"{PKG}.operators.a", "query")})
    assert cl == {(f"{PKG}.operators.a", "query")}
