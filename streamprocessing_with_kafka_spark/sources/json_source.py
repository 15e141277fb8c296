"""JSON ingestion surface (SURVEY.md §2.1 S3/S4).

S3 -- safe JSON deserialize: the reference's `safe_deserializer`
(order_validator.py:57-69) returns None instead of raising on corrupt
bytes. Spark's `get_json_object` / PERMISSIVE `from_json` have exactly
those semantics: corrupt input yields NULL, the pipeline routes it instead
of dying -- at 100 TB one poison record must never kill a job.

S4 -- JSON file/collection source: the reference serves `{"orders":
[...]}` from a file via json-server (src/Dockerfile.datasource:38); here
that collection shape is read with multiLine JSON + explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.sources.tables import load_table


def json_parse_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: build a deterministic JSON-lines stream from `orders` (with a
    corrupt-record class) and parse it back null-safely."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    json_str = F.when(k % 31 == 0, F.lit('{"broken')).otherwise(
        F.concat(
            F.lit('{"order_id":"'),
            k.cast("string"),
            F.lit('","quantity":"'),
            (k % 50 + 1).cast("string"),
            F.lit('","price":"'),
            (k % 1900 + 100).cast("string"),
            F.lit('"}'),
        )
    )
    parsed = o.select(k.alias("raw_key"), json_str.alias("js"))
    return parsed.select(
        "raw_key",
        F.get_json_object("js", "$.order_id").alias("order_id"),
        F.get_json_object("js", "$.quantity").try_cast("double").alias("quantity"),
        F.get_json_object("js", "$.price").try_cast("double").alias("price"),
        F.get_json_object("js", "$.order_id").isNull().alias("is_corrupt"),
    )


JSON_PARSE_ORDERS_SQL = """
WITH j AS (
  SELECT o_orderkey AS raw_key,
    CASE WHEN o_orderkey % 31 = 0 THEN '{"broken'
         ELSE '{"order_id":"' || CAST(o_orderkey AS VARCHAR)
           || '","quantity":"' || CAST(o_orderkey % 50 + 1 AS VARCHAR)
           || '","price":"' || CAST(o_orderkey % 1900 + 100 AS VARCHAR) || '"}'
    END AS js
  FROM orders
)
SELECT raw_key,
  CASE WHEN json_valid(js) THEN json_extract_string(js, '$.order_id') END AS order_id,
  TRY_CAST(CASE WHEN json_valid(js) THEN json_extract_string(js, '$.quantity') END AS DOUBLE) AS quantity,
  TRY_CAST(CASE WHEN json_valid(js) THEN json_extract_string(js, '$.price') END AS DOUBLE) AS price,
  (CASE WHEN json_valid(js) THEN json_extract_string(js, '$.order_id') END) IS NULL AS is_corrupt
FROM j
"""

FIXTURE_PATH = "/root/repo/fixtures/raw_orders.json"


def read_order_collection(spark: SparkSession, path: str = FIXTURE_PATH) -> DataFrame:
    """S4: read a json-server-style {"orders": [...]} collection file."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(F.explode("orders").alias("o")).select("o.*")


def order_collection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf_dir unused: the collection fixture is scale-independent (100 rows),
    # mirroring the reference's static raw_orders.json.
    return read_order_collection(spark).select(
        "order_id", "product_name", "quantity", "price", "order_date"
    )


# order_date cast: DuckDB's read_json infers ISO date strings as DATE;
# Spark's JSON reader keeps them as string -- normalize to string.
ORDER_COLLECTION_SQL = f"""
SELECT o.order_id, o.product_name, o.quantity, o.price,
       CAST(o.order_date AS VARCHAR) AS order_date
FROM (
  SELECT unnest(orders) AS o FROM read_json('{FIXTURE_PATH}')
)
"""


def write_order_collection(df: DataFrame, path: str) -> None:
    """K4: JSON collection file sink -- the generator's `{"orders":
    [...]}` envelope (src/data/random_orders_generator.py:65-66).

    The envelope is a single JSON document, so this is inherently a
    single-file write: collect_list into one row, one task writes it.
    Deliberately NOT for big data (a 100 TB result does not belong in one
    JSON document) -- the distributed path is `df.write.json(dir)`; this
    sink exists for reference-shape interchange with json-server."""
    doc = df.agg(
        F.to_json(
            F.struct(F.collect_list(F.struct(*df.columns)).alias("orders"))
        ).alias("doc")
    )
    row = doc.collect()[0]["doc"]
    with open(path, "w") as f:
        f.write(row)
