"""Crafted-frame regression pins for the r9 mixed-nulls sweep fixes.

The generated sf data contains no NULL values (TESTDATA.md), so the
partially-NULL regime -- the one the r8 gapfill near-miss proved the
oracle gate was blind to -- is exercised end-to-end only by
`scratch/empty_sweep.py --variant mixed` and, per-operator, by the pins
here. Each test freezes the SEMANTIC decision the fix made, on a frame
small enough to verify by hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, tmp_path, rows):
    d = str(tmp_path / "t")
    spark.createDataFrame(rows, EVENTS_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(d + "/events.parquet")
    return d


def test_asof_match_with_null_value_carries_the_null(spark, tmp_path):
    """The as-of MATCH is a row, not a value: a purchase whose most
    recent preceding view has value NULL must report (view_ts, NULL) --
    not skip back to an older view's value. Pre-fix, two separate
    last-ignore-nulls columns conflated structural NULL (left rows in
    the union window) with a genuine NULL payload (the r8 gapfill
    class)."""
    from streamprocessing_with_kafka_spark.operators.joins import (
        asof_join_events,
    )

    d = _events(
        spark,
        tmp_path,
        [
            (0, "2024-01-01 00:00:00", 1, "view", 10.0, "{}"),
            (1, "2024-01-01 01:00:00", 1, "view", None, "{}"),
            (2, "2024-01-01 02:00:00", 1, "purchase", 99.0, "{}"),
            # user 2: no view at all -> NULL match columns
            (3, "2024-01-01 02:00:00", 2, "purchase", 5.0, "{}"),
        ],
    )
    got = {r.event_id: r for r in asof_join_events(spark, d).collect()}
    m = got[2]
    assert m.view_ts.hour == 1  # matched the NEWEST preceding view...
    assert m.view_value is None  # ...and carried ITS value, which is NULL
    assert got[3].view_ts is None and got[3].view_value is None


def test_dedup_keeps_null_event_type_as_a_group(spark, tmp_path):
    """NULL event_type dedups WITHIN the NULL group (SQL PARTITION BY
    semantics). Pre-fix the groupBy + re-join shape dropped every
    NULL-type row outright (NULL never equi-joins)."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        dedup_events,
    )

    d = _events(
        spark,
        tmp_path,
        [
            # two NULL-type dups in one hour -> keep min event_id
            (7, "2024-01-01 00:10:00", 1, None, 1.0, "{}"),
            (3, "2024-01-01 00:20:00", 1, None, 2.0, "{}"),
            # distinct typed row unaffected
            (5, "2024-01-01 00:30:00", 1, "click", 3.0, "{}"),
        ],
    )
    got = sorted(r.event_id for r in dedup_events(spark, d).collect())
    assert got == [3, 5]


def test_top_paths_null_step_breaks_the_run(spark, tmp_path):
    """A window crossing a NULL event type is NOT a path (concat
    NULL-propagates, then filtered); windows on either side of the NULL
    still count. Pre-fix concat_ws silently collapsed a>NULL>b into the
    2-step a>b, inflating shorter paths."""
    from streamprocessing_with_kafka_spark.operators.windows import (
        events_top_paths,
    )

    rows, eid = [], 0
    # a a a NULL b b b  -> only 'a>a>a' and 'b>b>b' are complete runs
    for t in ["a", "a", "a", None, "b", "b", "b"]:
        rows.append((eid, f"2024-01-01 00:{eid:02d}:00", 1, t, 1.0, "{}"))
        eid += 1
    d = _events(spark, tmp_path, rows)
    got = {r.path: r.n for r in events_top_paths(spark, d).collect()}
    assert got == {"a>a>a": 1, "b>b>b": 1}


def test_scd2_null_timestamp_observation_leaves_the_timeline(spark):
    """An observation with a NULL ts cannot be versioned; NULL-valued
    ATTRIBUTES still open versions (eqNullSafe change detection)."""
    from streamprocessing_with_kafka_spark.operators.history import (
        scd2_versions,
    )

    obs = spark.createDataFrame(
        [
            (1, None, 0, "A"),  # excluded: no place on the timeline
            (1, "2024-01-02", 1, "B"),
            (1, "2024-01-03", 2, None),  # B -> NULL opens a version
            (1, "2024-01-04", 3, None),  # NULL -> NULL folds away
            (1, "2024-01-05", 4, "B"),  # NULL -> B opens a version
        ],
        "k long, ts string, tb long, attr string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        scd2_versions(obs, key="k", attr="attr", ts="ts", tiebreak="tb")
        .collect(),
        key=lambda r: r.version,
    )
    assert [(r.version, r.attr, r.is_current) for r in got] == [
        (1, "B", False),
        (2, None, False),
        (3, "B", True),
    ]
    assert got[0].valid_from.day == 2


def test_clean_embeddings_scan_excludes_corrupt_vectors(spark, tmp_path):
    """ANN/dedup/training read load_clean_embeddings: NULL vectors and
    vectors containing a NULL component are not index members."""
    from streamprocessing_with_kafka_spark.operators.similarity import (
        load_clean_embeddings,
    )

    d = str(tmp_path / "emb")
    spark.createDataFrame(
        [
            (0, [1.0, 2.0], 0),
            (1, None, 0),
            (2, [1.0, None], 0),
            (3, [3.0, 4.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(d + "/embeddings.parquet")
    got = sorted(
        r.vec_id for r in load_clean_embeddings(spark, d).collect()
    )
    assert got == [0, 3]


def test_quantize_degrades_corrupt_vector_rows_whole(spark, tmp_path):
    """embedding_quantize keeps every row (audit pass) but a vector with
    a NULL component yields NULL scale/codes/norm -- never a silently
    SHORTENED code string (concat_ws and array_to_string both skip null
    elements, which would corrupt a serving index)."""
    from streamprocessing_with_kafka_spark.operators.similarity import (
        embedding_quantize,
    )

    d = str(tmp_path / "emb")
    spark.createDataFrame(
        [(0, [1.0, -2.0], 0), (1, [1.0, None], 0), (2, None, 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(d + "/embeddings.parquet")
    got = {r.vec_id: r for r in embedding_quantize(spark, d).collect()}
    ok = got[0]
    assert ok.q_codes.count(",") == 1 and ok.q_norm2 is not None
    for vid in (1, 2):
        r = got[vid]
        assert r.scale is None and r.q_codes is None and r.q_norm2 is None


def test_csv_null_fields_serialize_as_empty_not_dropped(spark, tmp_path):
    """A NULL source field becomes an EMPTY CSV field (parsed back to
    NULL); the line keeps all 5 columns. Pre-fix concat_ws skipped the
    field entirely, shifting every later column by one."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from streamprocessing_with_kafka_spark.sources.csv_source import (
        csv_parse_orders,
    )

    d = str(tmp_path / "csv")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], type=pa.int64()),
                "o_custkey": pa.array([1, 1], type=pa.int64()),
                "o_orderstatus": pa.array(["O", "O"]),
                "o_totalprice": pa.array([10.0, 20.0]),
                # key 1: NULL date; key 2: NULL priority
                "o_orderdate": pa.array(
                    [None, 1577836800000000], type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT", None]),
            }
        ),
        d + "/orders.parquet",
    )
    got = {r.raw_key: r for r in csv_parse_orders(spark, d).collect()}
    r1 = got[1]
    assert not r1.is_corrupt
    assert r1.product_name == "Product 1-URGENT"
    assert r1.order_date is None  # empty field -> NULL, not a short row
    assert r1.price is not None  # later columns NOT shifted
    r2 = got[2]
    assert not r2.is_corrupt
    assert r2.product_name is None
    assert r2.order_date == "2020-01-01"


def test_mode_tie_breaks_to_real_segment_over_null(spark, tmp_path):
    """On a count tie between the NULL segment group and a real one the
    mode is the real segment (asc_nulls_last, matching the oracle's
    NULLS LAST)."""
    from streamprocessing_with_kafka_spark.operators.analytics import (
        mode_segment_by_nation,
    )

    d = str(tmp_path / "cust")
    spark.createDataFrame(
        [
            (1, "a", 7, 0.0, None),
            (2, "b", 7, 0.0, None),
            (3, "c", 7, 0.0, "BUILDING"),
            (4, "d", 7, 0.0, "BUILDING"),
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(d + "/customer.parquet")
    got = mode_segment_by_nation(spark, d).collect()
    assert len(got) == 1
    assert got[0].modal_segment == "BUILDING" and got[0].n_customers == 2
