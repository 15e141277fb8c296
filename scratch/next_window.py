"""Generate the next round's CORRECTNESS_WINDOW + PENDING_WINDOW,
DRIVEN by scratch/stale_green_guard.py's staleness accounting
(VERDICT r10 item 2: "window pinning driven by that output").

The 50-slot window becomes:

  - the 12-row reference-parity block (SURVEY §2 contract, every round),
  - then every CODE-STALE query (a real operator/oracle definition in
    its closure changed since its OWN last green round -- the class the
    judge hand-found 5 of in r10), oldest-green-first,
  - then everything else oldest-green-first, whether conf-closure-stale
    (e.g. the r7-era session._RUNTIME_CONFS edit touching every pre-r7
    green) or merely old: an r2-era non-stale green is staler evidence
    than an r6 conf-stale one, so age ranks them together.

Stale queries that do not fit become PENDING_WINDOW -- the committed
burn-down backlog the guard accepts (and re-checks) until they rotate
in.  Ties everywhere break by registry order for determinism.

Run from the repo root AFTER the driver writes the round's
CORRECTNESS_r*.json: python scratch/next_window.py
Prints the new lists as Python source to paste over CORRECTNESS_WINDOW
and PENDING_WINDOW (it does NOT edit registry.py -- the window is a
reviewed, committed artifact).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stale_green_guard import compute_staleness  # noqa: E402

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

WINDOW_SIZE = 50


def main() -> None:
    st = compute_staleness()
    greens, order = st["greens"], {n: i for i, n in enumerate(_REGISTRY)}
    eligible = [
        n for n, q in _REGISTRY.items()
        if q.sql is not None and n not in PARITY_BLOCK
    ]

    def oldest_first(names):
        return sorted(names, key=lambda n: (greens.get(n, 0), order[n]))

    code_stale = oldest_first(n for n in eligible if n in st["code_stale"])
    rest = oldest_first(n for n in eligible if n not in st["code_stale"])
    rotation = code_stale + rest
    window = PARITY_BLOCK + rotation[: WINDOW_SIZE - len(PARITY_BLOCK)]
    backlog = [
        n for n in rotation
        if n in st["fresh_needed"] and n not in set(window)
    ]
    assert len(window) == WINDOW_SIZE and len(set(window)) == WINDOW_SIZE

    print("CORRECTNESS_WINDOW = [")
    print("    # 1-12: reference parity block (SURVEY §2 contract)")
    for n in window[:12]:
        print(f'    "{n}",')
    k = 13
    if code_stale:
        print(f"    # {k}-{k + min(len(code_stale), len(window) - 12) - 1}: "
              "code-stale (operator/oracle changed since own green), "
              "oldest-green-first")
        for n in window[12:12 + len(code_stale)]:
            print(f'    "{n}",')
        k += len([n for n in window[12:] if n in set(code_stale)])
    if len(window) > 12 + len(code_stale):
        print(f"    # {k}-{len(window)}: stale burn-down + regression "
              "watch, oldest-green-first")
        for n in window[12 + len(code_stale):]:
            print(f'    "{n}",')
    print("]")
    print()
    print("PENDING_WINDOW = [")
    if backlog:
        print("    # committed stale burn-down backlog: rotates in "
              "oldest-green-first")
    for n in backlog:
        print(f'    "{n}",  # last green r{greens.get(n, 0)}')
    print("]")


if __name__ == "__main__":
    main()
