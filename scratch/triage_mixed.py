"""Triage one query's mixed-nulls divergence: print full spark-only /
duckdb-only row multisets (first N of each) so the divergent rows can be
read side by side.  Usage: python scratch/triage_mixed.py <query> [N]
"""
from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamprocessing_with_kafka_spark.plans.registry import registry  # noqa: E402
from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402
from scratch.empty_sweep import build_mixed_dir  # noqa: E402
from tests.oracle_harness import _canon, duckdb_conn  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    n_show = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    sf_dir = build_mixed_dir()
    q = registry()[name]
    spark = get_spark("triage-mixed")
    df = q.fn(spark, sf_dir)
    cols = sorted(df.columns)
    s_rows = Counter(tuple(_canon(r[c]) for c in cols) for r in df.collect())
    con = duckdb_conn(sf_dir)
    cur = con.sql(q.sql)
    d_cols = sorted(cur.columns)
    idx = [cur.columns.index(c) for c in d_cols]
    d_rows = Counter(
        tuple(_canon(r[i]) for i in idx) for r in cur.fetchall()
    )
    print("columns:", cols)
    only_s = list((s_rows - d_rows).elements())
    only_d = list((d_rows - s_rows).elements())
    print(f"spark rows={sum(s_rows.values())} duckdb rows={sum(d_rows.values())}")
    print(f"spark-only={len(only_s)} duckdb-only={len(only_d)}")
    for r in sorted(only_s)[:n_show]:
        print("  S", r)
    for r in sorted(only_d)[:n_show]:
        print("  D", r)
    spark.stop()


if __name__ == "__main__":
    main()
