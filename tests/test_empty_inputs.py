"""Degenerate-input guard: every oracle-backed query must agree with its
oracle over ZERO-ROW tables (exact production arrow schemas, no rows).

This is the failure class the r5 advisor flagged on mad_outlier_summary
(NULL-vs-0 on an all-null partition) generalized: aggregates, windows,
and ratios disagree between engines -- or crash under ANSI division --
only when a group/partition/input is empty, and generated testdata never
exercises that. The r6 sweep caught three ANSI divide-by-zero CRASHES
(quality_report, pipeline_quality_gate, events_funnel_timing: at 100 TB
an empty gate slice would abort the job), a phantom all-NULL merge row
in text_bpe_train, and a count_if NULL-vs-0 oracle bug in events_funnel.

Kept as one test over the full registry so a new operator cannot
reintroduce the class.
"""

import pytest

from streamprocessing_with_kafka_spark.plans.registry import registry
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_conn

#: Engine-defined divergences on zero-row input ONLY (identical on any
#: non-empty input): Spark evaluates the () grouping set of ROLLUP /
#: CUBE / GROUPING SETS as a grouped aggregate -- 0 rows over an empty
#: table, on both the DataFrame and SQL paths -- while the standard (and
#: DuckDB) emit the grand-total row. Chasing the degenerate case would
#: cost a second aggregate pass + union in the real plan.
SPARK_GROUPING_SETS_SEMANTICS = {
    "agg_grouping_sets",
    "agg_order_cube",
    "agg_order_rollup",
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    from streamprocessing_with_kafka_spark.sources.tables import TABLES

    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def single_row_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    from streamprocessing_with_kafka_spark.sources.tables import TABLES

    d = tmp_path_factory.mktemp("sf_single")
    for t in TABLES:
        tab = pq.read_table(f"{SF_DIR}/{t}.parquet").slice(0, 1)
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


def _sweep(spark, sf_dir: str) -> list[str]:
    con = duckdb_conn(sf_dir)
    bad: list[str] = []
    for name, q in sorted(registry().items()):
        if q.sql is None or name in SPARK_GROUPING_SETS_SEMANTICS:
            continue
        try:
            errs = compare(q.fn(spark, sf_dir), con, q.sql, name)
        except Exception as e:
            errs = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        bad.extend(errs)
    return bad


def test_every_query_matches_oracle_on_empty_tables(spark, empty_dir):
    bad = _sweep(spark, empty_dir)
    assert not bad, "\n".join(bad)


def test_every_query_matches_oracle_on_single_row_tables(spark, single_row_dir):
    """One-row tables put every per-group statistic in the n-1 = 0
    regime (sample variance, covariance, OLS denominators) -- the class
    that crashed embedding_pca_power under ANSI division in r6."""
    bad = _sweep(spark, single_row_dir)
    assert not bad, "\n".join(bad)
