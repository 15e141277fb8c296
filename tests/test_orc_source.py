"""ORC round-trip contract: rows written to ORC read back bit-identically
(types preserved), and re-running the query overwrites instead of
appending -- the idempotence driver retries rely on."""

from streamprocessing_with_kafka_spark.sources.orc_source import (
    orc_roundtrip_orders,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.sources.orc_source import ORC_KEY_MOD


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip_identity_and_idempotence(spark, sf_dir):
    expected = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % ORC_KEY_MOD == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )
    got = orc_roundtrip_orders(spark, sf_dir)
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in expected.schema.fields
    ]
    assert _canon(got) == _canon(expected)
    # overwrite-mode idempotence: a second run must not append duplicates
    again = orc_roundtrip_orders(spark, sf_dir)
    assert again.count() == expected.count()
