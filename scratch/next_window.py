"""Generate the next round's CORRECTNESS_WINDOW (r7+ regression-watch
rotation, per the plan pinned in plans/registry.py): with the
never-checked backlog at zero, the 50-slot window becomes

  - the 12-row reference-parity block (SURVEY §2 contract, every round), then
  - 38 slots cycling through the rest of the registry OLDEST-GREEN-FIRST
    (the query whose most recent green driver row is furthest in the past
    rotates in first).  As of r7 every registry entry carries oracle SQL,
    so the old sql=None ineligibility rule (r1/r4 no_oracle) is vacuous --
    the filter stays as a guard should a rows-only query ever reappear.
    When code changed AFTER a query's last green (check git against the
    round boundary), move those names to the front (r6 verdict item 1).

Run from the repo root AFTER the driver writes the round's
CORRECTNESS_r*.json: python scratch/next_window.py
Prints the new 50-name list as Python source to paste over
CORRECTNESS_WINDOW (it does NOT edit registry.py -- the window is a
reviewed, committed artifact).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamprocessing_with_kafka_spark.plans.registry import _REGISTRY  # noqa: E402

PARITY_BLOCK = [
    # the reference's own surface: flagship + routing + envelope +
    # counters + date fixup + SQL front end + the CRUD/upsert family
    "flagship_pipeline",
    "route_enriched",
    "route_invalid",
    "schema_envelope",
    "stream_counters",
    "date_normalize",
    "sql_enriched_orders",
    "crud_scan",
    "crud_filter",
    "crud_append",
    "crud_delete",
    "crud_upsert",
]


def main() -> None:
    # most recent round each query was GREEN (hash or rows match)
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") or (
                row.get("rows_match") and row.get("err") in (None, "no_oracle")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)

    eligible = [
        n
        for n, q in _REGISTRY.items()
        if q.sql is not None and n not in PARITY_BLOCK
    ]
    never = sorted(n for n in eligible if n not in last_green)
    if never:
        print(f"# WARNING: {len(never)} oracle-backed queries have no green "
              f"row yet -- they go first: {never}", file=sys.stderr)
    # oldest green first; ties broken by registry order for determinism
    order = {n: i for i, n in enumerate(_REGISTRY)}
    rotation = never + sorted(
        (n for n in eligible if n in last_green),
        key=lambda n: (last_green[n], order[n]),
    )
    window = PARITY_BLOCK + rotation[: 50 - len(PARITY_BLOCK)]
    assert len(window) == 50 and len(set(window)) == 50

    print("CORRECTNESS_WINDOW = [")
    print("    # 1-12: reference parity block (SURVEY §2 contract)")
    for n in window[:12]:
        print(f'    "{n}",')
    print("    # 13-50: regression watch, oldest-green-first")
    for n in window[12:]:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
