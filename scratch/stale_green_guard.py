"""Mechanical stale-green guard (VERDICT r8 item 3; r9: name-level;
r11: per-query multi-round baselines).

Twice (r7: graph/PQ/session, r8: the sketches KLL guard) a product-code
change landed AFTER the round's CORRECTNESS_WINDOW was pinned, leaving a
query whose driver green no longer matches its backing code -- and only
the judge's manual git archaeology caught it.  This script makes the
rule mechanical.  Run it at ROUND CLOSE (after the final product
commit, before handing the round to the driver):

    python scratch/stale_green_guard.py

Logic (r9 rewrite -- the r8 version was module-granular, which both
over-flagged [any edit to analytics.py marked all ~50 of its queries
stale, more than a 50-slot window can hold] and under-flagged [a query
defined in dedup.py whose behavior lives in a similarity.py helper was
never flagged when only similarity.py changed]):

  1. BASELINE is PER QUERY (r11 -- VERDICT r10 item 2): the artifact
     commit of the round in which that query was most recently GREEN
     (the last commit touching that round's CORRECTNESS_r*.json -- the
     moment the green was known to match the code).  The r9-r10 guard
     used one global baseline (the latest artifact commit), which
     structurally missed queries whose code changed in an EARLIER round
     after their last green but before the guard existed -- the judge
     found 5 such r6-r8-era cases by hand in r10.  A query with no
     green row yet baselines against nothing: it must simply be in the
     window.
  2. Parse every package module at each baseline and at HEAD (working
     tree) and fingerprint each TOP-LEVEL DEFINITION (function / class
     / constant) with docstrings stripped.  The changed-node set is the
     names whose fingerprints differ (or that were added/removed).
  3. Build the static reference graph between top-level definitions
     (intra-module name references + `from pkg.x import y` edges) and
     take each registry query's transitive closure from BOTH its fn and
     its oracle-SQL constant (recovered from registry.py's register()
     calls).  A query is STALE iff its closure touches a node changed
     since ITS OWN baseline and it is not in the CURRENT
     CORRECTNESS_WINDOW.  Exit 1 listing the offenders.  PENDING_WINDOW
     (the committed conf-staleness burn-down backlog) excuses only
     CONF-closure staleness: a backlog query with a REAL operator or
     oracle change since its own green also exits 1 (r12).
  4. Changed definitions reachable from NO registry query (streaming
     twins, shared infra) are reported as WARN against the most recent
     baseline: cover via pytest + scratch/drive_driver.py, not window
     slots.

Comments never reach the AST and docstrings are stripped, so doc-only
edits do not mark queries stale.  The closure is static (Name/Attribute
references), so dynamic dispatch would be invisible to it -- the package
has none on query paths.
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys
from collections import deque

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streamprocessing_with_kafka_spark.plans.registry import (  # noqa: E402
    CORRECTNESS_WINDOW,
    PENDING_WINDOW,
    _REGISTRY,
)

PKG = "streamprocessing_with_kafka_spark"

#: module-level assignments that are round METADATA, not behavior: the
#: window pin is re-pinned every round inside registry.py, and without
#: this exclusion the pin edit itself would flag every query as stale
#: every round (circular).
_METADATA_ASSIGNS = {"CORRECTNESS_WINDOW", "PENDING_WINDOW"}


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def _strip_docstrings(node: ast.AST) -> None:
    for n in ast.walk(node):
        if isinstance(
            n, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
        ):
            body = n.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                n.body = body[1:] or [ast.Pass()]


class ModuleDefs:
    """Top-level definitions of one module: per-name behavior
    fingerprints, per-name referenced names, and the import alias map."""

    def __init__(self, modname: str, src: str):
        self.modname = modname
        self.defs: dict[str, str] = {}
        self.refs: dict[str, set[str]] = {}
        self.imports: dict[str, tuple[str, str | None]] = {}
        tree = ast.parse(src)
        _strip_docstrings(tree)
        for stmt in tree.body:
            if isinstance(stmt, ast.ImportFrom) and stmt.module:
                for a in stmt.names:
                    self.imports[a.asname or a.name] = (stmt.module, a.name)
            elif isinstance(stmt, ast.Import):
                for a in stmt.names:
                    self.imports[a.asname or a.name.split(".")[0]] = (
                        a.name,
                        None,
                    )
            elif isinstance(
                stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                self._add(stmt.name, stmt)
            elif isinstance(stmt, (ast.Assign, ast.AnnAssign, ast.AugAssign)):
                targets = (
                    stmt.targets
                    if isinstance(stmt, ast.Assign)
                    else [stmt.target]
                )
                for t in targets:
                    if isinstance(t, ast.Name) and t.id not in _METADATA_ASSIGNS:
                        self._add(t.id, stmt)

    def _add(self, name: str, stmt: ast.stmt) -> None:
        fp = ast.dump(stmt)
        # a name assigned more than once (e.g. conditional fallback)
        # concatenates -- any change in any assignment changes it
        self.defs[name] = self.defs.get(name, "") + fp
        names = {
            n.id for n in ast.walk(stmt) if isinstance(n, ast.Name)
        }
        # attribute roots: `sketches.BLOOM_SQL` refers via root name
        self.refs[name] = self.refs.get(name, set()) | names


def load_tree(ref: str | None) -> dict[str, ModuleDefs]:
    """All package modules at a git ref (None = working tree)."""
    out: dict[str, ModuleDefs] = {}
    if ref is None:
        files = []
        for root, _dirs, fns in os.walk(os.path.join(REPO, PKG)):
            for fn in fns:
                if fn.endswith(".py"):
                    files.append(
                        os.path.relpath(os.path.join(root, fn), REPO)
                    )
        srcs = {f: open(os.path.join(REPO, f)).read() for f in files}
    else:
        files = [
            f
            for f in git("ls-tree", "-r", "--name-only", ref, PKG).splitlines()
            if f.endswith(".py")
        ]
        srcs = {f: git("show", f"{ref}:{f}") for f in files}
    for f, src in srcs.items():
        mod = f[: -len(".py")].replace("/", ".")
        out[mod] = ModuleDefs(mod, src)
    return out


def changed_nodes(
    old: dict[str, ModuleDefs], new: dict[str, ModuleDefs]
) -> set[tuple[str, str]]:
    ch: set[tuple[str, str]] = set()
    for mod in set(old) | set(new):
        od = old.get(mod).defs if mod in old else {}
        nd = new.get(mod).defs if mod in new else {}
        for name in set(od) | set(nd):
            if od.get(name) != nd.get(name):
                ch.add((mod, name))
    return ch


def closure(
    tree: dict[str, ModuleDefs], seeds: set[tuple[str, str]]
) -> set[tuple[str, str]]:
    """Transitive in-package reference closure from seed definitions."""
    seen: set[tuple[str, str]] = set()
    dq = deque(seeds)
    while dq:
        mod, name = dq.popleft()
        if (mod, name) in seen or mod not in tree:
            continue
        seen.add((mod, name))
        md = tree[mod]
        for r in md.refs.get(name, ()):
            if r in md.defs:
                dq.append((mod, r))
            elif r in md.imports:
                tgt_mod, tgt_name = md.imports[r]
                if not tgt_mod.startswith(PKG):
                    continue
                # `from pkg.a import b`: b may be a DEFINITION in pkg.a
                # or a MODULE pkg.a.b (module alias) -- if the latter,
                # conservatively take the whole module, else the edge
                # would silently dead-end and a helper change behind
                # the alias would never flag its consumers (r9 review).
                as_module = (
                    f"{tgt_mod}.{tgt_name}" if tgt_name is not None else tgt_mod
                )
                if as_module in tree:
                    for n in tree[as_module].defs:
                        dq.append((as_module, n))
                elif tgt_name is not None:
                    dq.append((tgt_mod, tgt_name))
    return seen


def sql_seeds(
    mod_tree: dict[str, ModuleDefs],
) -> dict[str, set[tuple[str, str]]]:
    """query name -> definition nodes its oracle SQL expression
    references, recovered from registry.py's register() call ASTs.

    Resolution is against `mod_tree` so that every import alias lands
    on a REAL node: `sketches.BLOOM_SQL` (module alias + attribute)
    seeds (pkg.operators.sketches, BLOOM_SQL); `X_SQL.format(...)` or
    `SomeClass.SQL` (attribute on a from-imported DEFINITION) seeds the
    definition itself. An attribute whose root resolves to neither is
    reported loudly rather than silently dropped -- a dead seed is
    exactly the stale-green blind spot this guard exists to close."""
    regfile = os.path.join(REPO, PKG, "plans", "registry.py")
    md = ModuleDefs(f"{PKG}.plans.registry", open(regfile).read())
    tree = ast.parse(open(regfile).read())
    out: dict[str, set[tuple[str, str]]] = {}
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "register"
            and node.args
            and isinstance(node.args[0], ast.Constant)
        ):
            continue
        qname = node.args[0].value
        seeds: set[tuple[str, str]] = set()

        def resolve(name: str) -> tuple[str, str] | None:
            """import alias -> (module, definition) or None (module
            alias / external / unresolvable)."""
            if name not in md.imports:
                return None
            tgt_mod, tgt_name = md.imports[name]
            if not tgt_mod.startswith(PKG) or tgt_name is None:
                return None
            if f"{tgt_mod}.{tgt_name}" in mod_tree:
                return None  # module alias: handled per-attribute
            return (tgt_mod, tgt_name)

        for sub in ast.walk(node):
            if isinstance(sub, ast.Name):
                hit = resolve(sub.id)
                if hit:
                    seeds.add(hit)
            elif isinstance(sub, ast.Attribute) and isinstance(
                sub.value, ast.Name
            ):
                root = sub.value.id
                if root not in md.imports:
                    continue
                tgt_mod, tgt_name = md.imports[root]
                full = f"{tgt_mod}.{tgt_name}" if tgt_name else tgt_mod
                if full in mod_tree:
                    seeds.add((full, sub.attr))  # module alias attr
                else:
                    hit = resolve(root)
                    if hit:
                        seeds.add(hit)  # attr ON a definition: seed it
                    elif full.startswith(PKG):
                        print(
                            f"  WARN  {qname}: unresolvable seed "
                            f"{root}.{sub.attr} ({full}) -- fix the "
                            "guard before trusting this round's output",
                            file=sys.stderr,
                        )
        out[qname] = seeds
    return out


def last_green_rounds() -> dict[str, int]:
    """query name -> most recent round with a green driver row."""
    import glob
    import json
    import re

    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") or (
                row.get("rows_match") and row.get("err") in (None, "no_oracle")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def artifact_commit(rnd: int) -> str | None:
    """The commit where round `rnd`'s driver artifacts landed: the last
    commit touching that round's CORRECTNESS file (globbed so both
    r9/r09-style zero paddings match)."""
    for pat in (f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json"):
        sha = git("log", "-1", "--format=%H", "--", pat).strip()
        if sha:
            return sha
    return None


def compute_staleness() -> dict:
    """The guard's full accounting, importable by scratch/next_window.py
    so window pinning is DRIVEN by this output (VERDICT r10 item 2).

    Returns {
      greens:        query -> last green round,
      fresh_needed:  query -> sorted list of (mod, name) changed nodes
                     in its closure since its OWN baseline ([] for a
                     never-green query),
      code_stale:    subset of fresh_needed whose hits include a
                     non-session node (a REAL operator/oracle change,
                     not just the runtime-conf closure),
      unreachable:   changed-since-latest-baseline nodes reachable from
                     no registry query (streaming twins, shared infra),
    }"""
    greens = last_green_rounds()
    out = {"greens": greens, "fresh_needed": {}, "code_stale": set(),
           "unreachable": set()}
    if not greens:
        return out

    base_ref: dict[int, str] = {}
    for rnd in sorted({r for r in greens.values()}):
        sha = artifact_commit(rnd)
        if sha is None:
            print(f"  WARN  round {rnd} has green rows but no artifact "
                  "commit found -- treating its queries as never-green",
                  file=sys.stderr)
            continue
        base_ref[rnd] = sha
    if not base_ref:
        print("  WARN  no green round has a committed artifact -- every "
              "query needs its FIRST trustworthy driver row", file=sys.stderr)
        out["fresh_needed"] = {n: [] for n in _REGISTRY}
        out["code_stale"] = set(_REGISTRY)
        return out
    print("per-round baselines: " + ", ".join(
        f"r{r}={base_ref[r][:10]}" for r in sorted(base_ref)),
        file=sys.stderr)

    new = load_tree(None)
    trees: dict[int, dict[str, ModuleDefs]] = {}
    changed: dict[int, set[tuple[str, str]]] = {}
    for rnd, sha in base_ref.items():
        trees[rnd] = load_tree(sha)
        changed[rnd] = changed_nodes(trees[rnd], new)

    reg_seeds = sql_seeds(new)
    latest = max(base_ref)
    reached_latest: set[tuple[str, str]] = set()
    for name, q in _REGISTRY.items():
        seeds = {(q.fn.__module__, q.fn.__name__)} | reg_seeds.get(name, set())
        # the unreachable-WARN accounting uses the LATEST baseline so it
        # mirrors the old one-round guard's report. Accumulated for EVERY
        # query -- including never-green ones (r11 verdict item 5: a query
        # whose green round has no artifact commit yet, e.g. post-driver /
        # pre-artifact-commit, still REACHES its nodes; skipping it here
        # falsely reported those nodes as reachable from no registry query)
        reached_latest |= (closure(new, seeds) | closure(trees[latest], seeds)
                           ) & changed[latest]
        rnd = greens.get(name)
        if rnd is None or rnd not in base_ref:
            out["fresh_needed"][name] = []  # needs its FIRST driver row
            out["code_stale"].add(name)
            continue
        old = trees[rnd]
        cl = closure(new, seeds) | closure(old, seeds)
        hit = cl & changed[rnd]
        if hit:
            out["fresh_needed"][name] = sorted(hit)
            if any(not mod.endswith(".session") for mod, _ in hit):
                out["code_stale"].add(name)
    out["unreachable"] = changed[latest] - reached_latest
    out["latest_round"] = latest
    return out


def main() -> None:
    st = compute_staleness()
    if not st["greens"]:
        print("no CORRECTNESS_r*.json history -- nothing to guard")
        return

    for mod, nm in sorted(st["unreachable"]):
        print(f"  WARN  changed since r{st['latest_round']} but reachable "
              f"from no registry query: {mod}.{nm} -- cover via pytest + "
              "scratch/drive_driver.py")

    window = set(CORRECTNESS_WINDOW)
    backlog = set(PENDING_WINDOW)
    fresh = st["fresh_needed"]
    print(f"\nqueries needing a fresh green: {len(fresh)}; in window: "
          f"{len(set(fresh) & window)}; in committed backlog: "
          f"{len(set(fresh) & backlog)}")

    # a backlog entry that is NOT actually stale is dead weight: the
    # backlog must stay the minimal committed burn-down list
    dead = backlog - set(fresh)
    for name in sorted(dead):
        print(f"  WARN  PENDING_WINDOW entry not stale -- remove: {name}")

    # the committed backlog may only absorb CONF-closure staleness (the
    # r7 runtime-conf debt being burned down); a REAL operator/oracle
    # edit to a backlog query's closure must take a window slot like any
    # other code change (r11 ADVICE item 1 -- without this, a code edit
    # to a backlog query would be silently accepted until rotation)
    backlog_code_stale = {
        n: fresh[n] for n in (st["code_stale"] & backlog) - window
        if _REGISTRY[n].sql is not None
    }
    # Optimization rounds (r12): the driver re-validates EVERY declared
    # query against the oracle, not just the 50-slot window, and an
    # optimization pass legitimately edits shared loaders whose closure
    # reaches the whole registry -- the build-round invariant "every
    # stale query holds a window or backlog slot" cannot be satisfied by
    # any 50-name list. SPARK_GRAFT_FULL_VALIDATION=1 downgrades the two
    # hard failures below to loud warnings for exactly that situation;
    # the counts still print so the round close records the exposure.
    full_validation = os.environ.get("SPARK_GRAFT_FULL_VALIDATION") == "1"
    if full_validation:
        # r13 (r12 ADVICE item 1): the waiver must be backed by EVIDENCE,
        # not the env var alone -- the var could leak into a later round's
        # close and silently accept real staleness. Require the artifact
        # the waiver claims exists: scratch/full_validation.json, written
        # by scratch/drive_driver.py after a full-registry oracle pass,
        # with an "ok" for EVERY currently-registered query. Missing,
        # unparseable, or incomplete coverage keeps the failures hard.
        ev_path = os.path.join(REPO, "scratch", "full_validation.json")
        try:
            import json as _json

            with open(ev_path) as f:
                ev = _json.load(f)
            uncovered = sorted(
                n for n in _REGISTRY if ev.get("results", {}).get(n) != "ok"
            )
        except Exception:
            uncovered = sorted(_REGISTRY)
        if uncovered:
            print(
                f"\nSPARK_GRAFT_FULL_VALIDATION=1 REFUSED: {ev_path} is "
                f"missing, unreadable, or does not record an 'ok' for "
                f"every registered query ({len(uncovered)} uncovered, "
                f"e.g. {uncovered[:3]}) -- run scratch/drive_driver.py "
                "on the final tree first; hard failures stay hard."
            )
            full_validation = False

    if backlog_code_stale:
        print(f"\nBACKLOG CODE-STALE ({len(backlog_code_stale)}): queries "
              "in PENDING_WINDOW whose closure has a REAL operator/oracle "
              "change (not just the conf closure) since their own last "
              "green -- the backlog cannot absorb these; give them a "
              "window slot:")
        for name, hits in sorted(backlog_code_stale.items()):
            # name the node that makes it CODE-stale (non-session), not
            # whichever hit sorts first
            real = [h for h in hits if not h[0].endswith(".session")]
            via = (f"{real[0][0]}.{real[0][1]}" if real
                   else "<no green row yet>")
            print(f"  {name}  (via {via})")
        if not full_validation:
            sys.exit(1)
        print("  (accepted: SPARK_GRAFT_FULL_VALIDATION=1 -- the driver "
              "re-validates the full registry this round)")

    stale = {
        n: hits for n, hits in fresh.items()
        if _REGISTRY[n].sql is not None and n not in window and n not in backlog
    }
    if stale:
        print(f"\nSTALE GREENS ({len(stale)}): queries whose behavior "
              "closure changed since their OWN last green round but are "
              "in neither CORRECTNESS_WINDOW nor the committed "
              "PENDING_WINDOW backlog:")
        for name, hits in sorted(stale.items()):
            via = f"{hits[0][0]}.{hits[0][1]}" if hits else "<no green row yet>"
            print(f"  {name}  (via {via})")
        if not full_validation:
            sys.exit(1)
        print("  (accepted: SPARK_GRAFT_FULL_VALIDATION=1 -- the driver "
              "re-validates the full registry this round)")
    if backlog & set(fresh):
        print(f"\nBACKLOG ({len(backlog & set(fresh))}): stale queries "
              "committed to future windows (burn-down: the pin rotates "
              "them in oldest-green-first; this list may only shrink):")
        for name in sorted(backlog & set(fresh)):
            print(f"  {name}  (last green r{st['greens'].get(name, 0)})")
    if full_validation:
        print("\nOK (full-validation mode): staleness recorded above; the "
              "driver's full-registry oracle run is the green this round")
    else:
        print("\nOK: every behavior-touched registry query is in the window "
              "or the committed backlog")


if __name__ == "__main__":
    main()
