"""K2/K3 against a REAL SQL engine: the DBAPI sink's auto-DDL,
ON CONFLICT upserts, tombstone deletes, and replay idempotency, driven
through DuckDB (same ON CONFLICT dialect as Postgres; live Postgres needs
only a psycopg2 conn_factory + placeholder='%s')."""

import duckdb
import pytest

from streamprocessing_with_kafka_spark.streaming.sinks import (
    create_table_sql,
    dbapi_upsert_sink,
    upsert_sql,
)

SCHEMA = (
    "order_id string, product_name string, quantity double, price double, "
    "order_date string, total_price double"
)


@pytest.fixture
def db(tmp_path):
    return str(tmp_path / "sink.duckdb")


def _rows(db):
    with duckdb.connect(db) as con:
        return {
            r[0]: r[5]
            for r in con.sql("SELECT * FROM enriched_orders ORDER BY order_id").fetchall()
        }


def test_dbapi_sink_upsert_tombstone_replay(spark, db):
    # single partition: a file-backed DuckDB admits one writer process,
    # which is the coalesce-to-db-headroom guidance from the docstring
    sink = dbapi_upsert_sink(lambda: duckdb.connect(db), "enriched_orders", "order_id")
    b1 = spark.createDataFrame(
        [
            ("o1", "WASP", 2.0, 200.0, "2025-11-09", 400.0),
            ("o2", "gadget", 1.0, 5.0, "2025-11-09", 5.0),
        ],
        SCHEMA,
    ).coalesce(1)
    sink(b1, 0)
    assert _rows(db) == {"o1": 400.0, "o2": 5.0}
    # at-least-once replay of the same batch converges (idempotent)
    sink(b1, 0)
    assert _rows(db) == {"o1": 400.0, "o2": 5.0}
    # update one key, tombstone the other (null payload -> PK DELETE)
    b2 = spark.createDataFrame(
        [
            ("o1", "WASP", 4.0, 200.0, "2025-11-09", 800.0),
            ("o2", None, None, None, None, None),
        ],
        SCHEMA,
    ).coalesce(1)
    sink(b2, 1)
    assert _rows(db) == {"o1": 800.0}
    sink(b2, 1)  # tombstone replay is absorbing too
    assert _rows(db) == {"o1": 800.0}


def test_dbapi_sink_intra_batch_order_last_record_wins(spark, db):
    """Per-key arrival order within a batch must decide the final state
    (the record-at-a-time Connect sink contract): delete-then-recreate
    ends recreated, upsert-then-delete ends deleted -- statement batching
    may not reorder a key's own history."""
    sink = dbapi_upsert_sink(lambda: duckdb.connect(db), "enriched_orders", "order_id")
    batch = spark.createDataFrame(
        [
            # o3: upsert -> tombstone -> recreate  => must survive at 99.0
            ("o3", "a", 1.0, 1.0, "2025-11-09", 1.0),
            ("o3", None, None, None, None, None),
            ("o3", "a", 9.0, 11.0, "2025-11-09", 99.0),
            # o4: upsert -> tombstone              => must be deleted
            ("o4", "b", 1.0, 2.0, "2025-11-09", 2.0),
            ("o4", None, None, None, None, None),
        ],
        SCHEMA,
    ).coalesce(1)
    sink(batch, 0)
    assert _rows(db) == {"o3": 99.0}
    sink(batch, 0)  # replay converges
    assert _rows(db) == {"o3": 99.0}


def test_auto_ddl_declares_pk_and_types(spark):
    df = spark.createDataFrame([], SCHEMA)
    ddl = create_table_sql("t", df.schema, "order_id")
    assert "order_id VARCHAR PRIMARY KEY" in ddl
    assert "total_price DOUBLE PRECISION" in ddl and ddl.startswith(
        "CREATE TABLE IF NOT EXISTS t ("
    )
    ins = upsert_sql("t", [f.name for f in df.schema.fields], "order_id")
    assert "ON CONFLICT (order_id) DO UPDATE SET" in ins
    assert "order_id = excluded.order_id" not in ins
