"""Degenerate-input audit: run every oracle-backed registered query over
0-ROW copies of all tables and diff engine vs DuckDB with the exact
driver compare.

Why: the one latent divergence the r5 advisor found (mad_outlier_summary
emitting NULL where the oracle emits 0 on an all-null partition) is a
member of a whole class -- aggregates, windows, and joins disagreeing
between engines only when a group/partition/input is empty. Generated
testdata never exercises that class, so sweep it explicitly.

The empty tables carry the EXACT arrow schema of the real sf0.001 files
(pyarrow schema copy, 0 rows), so nanos timestamps, decimals, and
nullability match what both engines see in production.

Run from the repo root: python scratch/empty_sweep.py [--only name,...]
Prints one line per divergence; exit 0 iff none.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from streamprocessing_with_kafka_spark.plans.registry import registry  # noqa: E402
from streamprocessing_with_kafka_spark.session import get_spark  # noqa: E402
from streamprocessing_with_kafka_spark.sources.tables import TABLES  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"
EMPTY_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scratch",
    "sf_empty",
)


def build_empty_dir() -> str:
    os.makedirs(EMPTY_DIR, exist_ok=True)
    for t in TABLES:
        dst = f"{EMPTY_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            schema = pq.read_schema(f"{SRC_SF}/{t}.parquet")
            pq.write_table(schema.empty_table(), dst)
    return EMPTY_DIR


def build_single_dir() -> str:
    """One-row tables (the first row of sf0.001): every per-group
    statistic runs on a group of size 1 -- the n-1 = 0 regime where
    sample-variance-family functions diverge across engines (Spark
    stddev_samp -> NaN vs DuckDB -> NULL and friends)."""
    d = EMPTY_DIR.replace("sf_empty", "sf_single")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        dst = f"{d}/{t}.parquet"
        if not os.path.exists(dst):
            tab = pq.read_table(f"{SRC_SF}/{t}.parquet").slice(0, 1)
            pq.write_table(tab, dst)
    return d


def build_constant_dir() -> str:
    """The first row of every table replicated 4x: zero-variance value
    distributions (stddev/OLS/correlation denominators hit 0), duplicate
    primary keys, and a single distinct group everywhere."""
    d = EMPTY_DIR.replace("sf_empty", "sf_constant")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        dst = f"{d}/{t}.parquet"
        if not os.path.exists(dst):
            one = pq.read_table(f"{SRC_SF}/{t}.parquet").slice(0, 1)
            pq.write_table(pa.concat_tables([one] * 4), dst)
    return d


def build_nulls_dir() -> str:
    """Three real rows per table with every NULLABLE column nulled out:
    the all-null-partition regime (the r5 mad_outlier advisory class)."""
    d = EMPTY_DIR.replace("sf_empty", "sf_nulls")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        dst = f"{d}/{t}.parquet"
        if os.path.exists(dst):
            continue
        tab = pq.read_table(f"{SRC_SF}/{t}.parquet").slice(0, 3)
        cols = []
        for field in tab.schema:
            if field.nullable:
                cols.append(pa.nulls(tab.num_rows, type=field.type))
            else:
                cols.append(tab.column(field.name))
        pq.write_table(pa.table(cols, schema=tab.schema), dst)
    return d


#: Columns that stay NULL-free in the mixed-nulls variant: join /
#: identity keys and events.ts. Since r10 these two classes are no
#: longer merely documented -- the `mixed_keys` variant below NULLs
#: exactly this set (and nothing else) at ~5%. In `mixed`, everything
#: else nullable gets ~10% NULLs.
MIXED_KEEP = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "event_id", "user_id", "ts", "doc_id", "vec_id",
}


def build_mixed_dir() -> str:
    """Full sf0.001 tables with ~10% NULLs sprinkled deterministically
    into every nullable VALUE column (keys and event-times preserved --
    see MIXED_KEEP). This is the regime the r8 gapfill near-miss proved
    the harness was blind to: ignore-nulls LOCF, NULL-skipping
    aggregates, NULL-propagating arithmetic on PARTIALLY-null columns.
    The all-null `nulls` variant cannot catch those (every group is
    degenerate there); generated testdata has zero NULLs (TESTDATA.md).

    embeddings.embedding additionally gets whole-array NULLs (~10%) and
    single-element NULLs inside a further ~3% of arrays.

    Selection is a pure function of (table, column, row index) -- crc32
    keyed -- so the fixture is bit-stable across runs and machines.
    """
    import zlib

    d = EMPTY_DIR.replace("sf_empty", "sf_mixed")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        dst = f"{d}/{t}.parquet"
        if os.path.exists(dst):
            continue
        tab = pq.read_table(f"{SRC_SF}/{t}.parquet")
        n = tab.num_rows
        cols = []
        for field in tab.schema:
            col = tab.column(field.name).combine_chunks()
            if not field.nullable or field.name in MIXED_KEEP:
                cols.append(col)
                continue
            seed = zlib.crc32(f"{t}.{field.name}".encode())
            if pa.types.is_list(field.type):
                vals = col.to_pylist()
                out = []
                for i, v in enumerate(vals):
                    h = (seed + 2654435761 * i) % 100
                    if h < 10:
                        out.append(None)
                    elif h < 13 and v:
                        v = list(v)
                        v[(seed + i) % len(v)] = None
                        out.append(v)
                    else:
                        out.append(v)
                cols.append(pa.array(out, type=field.type))
            else:
                mask = pa.array(
                    [(seed + 2654435761 * i) % 100 < 10 for i in range(n)]
                )
                cols.append(
                    pa.compute.if_else(mask, pa.nulls(n, type=field.type), col)
                )
        pq.write_table(pa.table(cols, schema=tab.schema), dst)
    return d


#: Engine-defined divergences on ZERO-ROW input only (verified identical
#: on any non-empty input): Spark evaluates the () grouping set of
#: ROLLUP/CUBE/GROUPING SETS as a grouped aggregate (0 rows over an empty
#: table, both DataFrame and SQL paths), while the standard -- and DuckDB
#: -- emit the grand-total row. Not worth a second aggregate pass + union
#: in the engine plan to chase a degenerate case.
GROUPING_SETS_SEMANTICS = {"agg_grouping_sets", "agg_order_cube", "agg_order_rollup"}

#: nulls-variant allowlist (r6 audit of ALL-NULL nullable columns). Two
#: documented classes; everything NOT listed here was fixed in r6
#: (try_divide crashes, UDF null guards, element_at codegen workaround,
#: oracle count_if/COALESCE/ln(0) bugs -- see the r6 commits).
#: r9 shrank this list from 14 to 5: the clean-embeddings scan policy
#: (similarity.load_clean_embeddings) removed the whole DuckDB
#: list_inner_product class, and the mad-outliers oracle's joins are now
#: IS NOT DISTINCT FROM -- all verified back to real coverage by
#: re-running this variant.
NULLS_ALLOWED = GROUPING_SETS_SEMANTICS | {
    # NULL-group/window semantics, defensible and documented:
    # agg_abc_parts' NULL-bucket window diverges from DuckDB's
    # time_bucket NULL group. events_session/sliding/tumbling were
    # RETIRED from this list in r10: their oracles now state Spark's
    # documented NULL-event-time drop explicitly (WHERE ts IS NOT
    # NULL), so both variants verify them instead of excusing them.
    "agg_abc_parts",
}

#: constant-variant allowlist: the 4x-replicated rows DUPLICATE every
#: primary key, which the table contract forbids -- the divergences are
#: row-wise vs collapse-per-key treatments of duplicate vec_ids/doc_ids
#: (engine emits one row per physical row; the oracle's per-key window
#: collapses), both internally consistent. The variant's real target --
#: zero-variance denominators (z-score, OLS, correlation) -- swept clean
#: with NO crashes and NO value divergences.
CONSTANT_ALLOWED = GROUPING_SETS_SEMANTICS | {
    "ann_kmeans_train",
    "ann_pq_train",
    "ann_ivf_assignments",
    "dedup_semantic",
    # mm_feature_extract / mm_phash_index were de-allowlisted in r9: the
    # oracle CTEs are now keyed on a synthetic row id (ADVICE r8), so
    # replicated doc_ids no longer merge centering sums and the variant
    # exercises them for real.
}

#: mixed-nulls allowlist: starts EMPTY by design -- every divergence the
#: first mixed sweep surfaces gets fixed (engine or oracle) or earns an
#: entry here with a citation, exactly like the other variants did.
MIXED_ALLOWED: set = set()


def build_mixed_keys_dir() -> str:
    """The complement of `mixed`: full sf0.001 tables with ~5% NULLs in
    exactly the columns MIXED_KEEP protects -- join/identity keys and
    events.ts -- and every VALUE column left intact. This is the class
    the r9 events_dedup bug lived in (engine join-rewrites dropping
    NULL keys that a SQL GROUP BY retains) plus the NULL-event-time
    class the r9 ADVICE flagged three latent members of (Spark ASC
    windows sort NULLS FIRST into LOCF/as-of scans; DuckDB sorts them
    NULLS LAST and its ASOF/time_bucket never match a NULL instant).
    Same crc32 (table, column, row) keying as `mixed`: bit-stable.
    """
    import zlib

    d = EMPTY_DIR.replace("sf_empty", "sf_mixed_keys")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        dst = f"{d}/{t}.parquet"
        if os.path.exists(dst):
            continue
        tab = pq.read_table(f"{SRC_SF}/{t}.parquet")
        n = tab.num_rows
        cols = []
        for field in tab.schema:
            col = tab.column(field.name).combine_chunks()
            if not field.nullable or field.name not in MIXED_KEEP:
                cols.append(col)
                continue
            seed = zlib.crc32(f"keys.{t}.{field.name}".encode())
            mask = pa.array(
                [(seed + 2654435761 * i) % 100 < 5 for i in range(n)]
            )
            cols.append(
                pa.compute.if_else(mask, pa.nulls(n, type=field.type), col)
            )
        pq.write_table(pa.table(cols, schema=tab.schema), dst)
    return d


#: mixed_keys allowlist -- same contract as MIXED_ALLOWED: starts empty,
#: every first-sweep divergence is fixed or earns a cited entry.
MIXED_KEYS_ALLOWED: set = set()


def build_mixed_both_dir() -> str:
    """The INTERACTION variant (r10): the `mixed` value-NULL rules and
    the `mixed_keys` key/ts-NULL rules applied to the SAME tables, with
    the same crc32 keying each variant uses alone.  A row can now carry
    a NULL value under a NULL key at a NULL instant -- the combinations
    the two single-axis variants never co-exercise (e.g. an as-of match
    whose carried view has BOTH view_ts NULL-gated and value NULL, or a
    dedup group that is simultaneously the NULL-hour bucket and
    all-NULL-valued)."""
    import zlib

    d = EMPTY_DIR.replace("sf_empty", "sf_mixed_both")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        dst = f"{d}/{t}.parquet"
        if os.path.exists(dst):
            continue
        tab = pq.read_table(f"{SRC_SF}/{t}.parquet")
        n = tab.num_rows
        cols = []
        for field in tab.schema:
            col = tab.column(field.name).combine_chunks()
            if not field.nullable:
                cols.append(col)
                continue
            if field.name in MIXED_KEEP:  # the mixed_keys rule, 5%
                seed = zlib.crc32(f"keys.{t}.{field.name}".encode())
                mask = pa.array(
                    [(seed + 2654435761 * i) % 100 < 5 for i in range(n)]
                )
                cols.append(
                    pa.compute.if_else(mask, pa.nulls(n, type=field.type), col)
                )
                continue
            # the mixed rule, 10% (+ in-array nulls for list columns)
            seed = zlib.crc32(f"{t}.{field.name}".encode())
            if pa.types.is_list(field.type):
                vals = col.to_pylist()
                out = []
                for i, v in enumerate(vals):
                    h = (seed + 2654435761 * i) % 100
                    if h < 10:
                        out.append(None)
                    elif h < 13 and v:
                        v = list(v)
                        v[(seed + i) % len(v)] = None
                        out.append(v)
                    else:
                        out.append(v)
                cols.append(pa.array(out, type=field.type))
            else:
                mask = pa.array(
                    [(seed + 2654435761 * i) % 100 < 10 for i in range(n)]
                )
                cols.append(
                    pa.compute.if_else(mask, pa.nulls(n, type=field.type), col)
                )
        pq.write_table(pa.table(cols, schema=tab.schema), dst)
    return d


#: mixed_both allowlist -- same contract: starts empty.
MIXED_BOTH_ALLOWED: set = set()

ALLOWED = GROUPING_SETS_SEMANTICS  # empty + single variants


def main() -> None:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    variant = "empty"
    if "--variant" in sys.argv:
        variant = sys.argv[sys.argv.index("--variant") + 1]
    sf_dir = {
        "empty": build_empty_dir,
        "single": build_single_dir,
        "nulls": build_nulls_dir,
        "constant": build_constant_dir,
        "mixed": build_mixed_dir,
        "mixed_keys": build_mixed_keys_dir,
        "mixed_both": build_mixed_both_dir,
    }[variant]()
    allowed = {
        "nulls": NULLS_ALLOWED,
        "constant": CONSTANT_ALLOWED,
        "mixed": MIXED_ALLOWED,
        "mixed_keys": MIXED_KEYS_ALLOWED,
        "mixed_both": MIXED_BOTH_ALLOWED,
    }.get(variant, ALLOWED)
    spark = get_spark("empty-sweep")
    con = duckdb_conn(sf_dir)
    bad: list[str] = []
    n = 0
    for name, q in sorted(registry().items()):
        if q.sql is None or name in allowed or (only and name not in only):
            continue
        n += 1
        try:
            errs = compare(q.fn(spark, sf_dir), con, q.sql, name)
        except Exception as e:  # engine or oracle crashed on empty input
            errs = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        if errs:
            bad.extend(errs)
            print("DIVERGES", errs[0][:300], flush=True)
        else:
            print(f"  ok  {name}", flush=True)
    print(f"\n{n} swept, {len(bad)} divergences")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
