"""Declared schemas for the order-message surface.

Ingest is schemaless in the reference (SURVEY.md §1.3); our engine reads
with a declared permissive schema instead: all strings at the edge
(validation owns typing -- operators/validate.py), plus `_corrupt_record`
so unparseable lines are counted-and-dropped rather than killing the job
(the reference's safe_deserializer semantics, order_validator.py:57-69).
"""

from pyspark.sql import types as T

ORDER_RAW_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("quantity", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("order_date", T.StringType()),
        T.StructField("id", T.StringType()),  # json-server ride-along id
        T.StructField("_corrupt_record", T.StringType()),
    ]
)
