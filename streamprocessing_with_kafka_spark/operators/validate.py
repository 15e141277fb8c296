"""Row-level validation + enrichment: the reference's core transform set
(SURVEY.md §2.2 T1-T8), re-expressed as one declarative `select` of built-in
column expressions -- no Python UDFs, so at 100 TB the whole pipeline stays
inside whole-stage codegen and is embarrassingly parallel (narrow, no
shuffle).

Reference semantics reproduced (src/app/order_validator.py):
  T1 missing required fields short-circuits with
     'Missing required fields: a, b'                  (:39-45, :186-188)
  T2/T3 numeric validity via cast -- try_cast(double) IS NULL is exactly the
     reference's float() try/except                   (:146-163, :195, :205)
  T4 non-negativity                                   (:196-198, :206-208)
  T5 per-field error messages joined with '; '        (:182-212)
  T6 total_price = round(quantity * price, 2)         (:215)
  T7 epoch-days digit-string dates normalized to 'YYYY-MM-DD' (:225-239)
  T8 (is_valid, status_message) tagging               (:165-221)

Documented divergences from the reference (intentional fixes, see SURVEY.md
§2.4 ST4 and §2.2 T5): (1) the reference's price error message interpolates
the quantity value (a bug) -- ours interpolates the price; (2) the reference
KeyErrors (and then livelocks) on an invalid order missing `order_date` --
ours guards the date fixup on presence and routes the row to the dead
letter branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import round_sql

REQUIRED_FIELDS = ["order_id", "product_name", "quantity", "price", "order_date"]

VALID_STATUS = "Validated and enriched successfully"


def validate_and_enrich(df: DataFrame) -> DataFrame:
    """orders_raw(string columns) -> typed, tagged, enriched frame.

    Input columns : order_id, product_name, quantity, price, order_date (str)
    Output columns: order_id, product_name, quantity(double), price(double),
                    order_date(normalized str), total_price(double),
                    is_valid(bool), status_message(str)
    """
    missing = F.concat_ws(
        ", ", *[F.when(F.col(f).isNull(), F.lit(f)) for f in REQUIRED_FIELDS]
    )
    price_d = F.col("price").try_cast("double")
    quantity_d = F.col("quantity").try_cast("double")

    price_err = F.when(
        price_d.isNull(), F.concat(F.lit("Invalid price: "), F.col("price"))
    ).when(price_d < 0, F.concat(F.lit("Negative price: "), F.col("price")))
    quantity_err = F.when(
        quantity_d.isNull(), F.concat(F.lit("Invalid quantity: "), F.col("quantity"))
    ).when(quantity_d < 0, F.concat(F.lit("Negative quantity: "), F.col("quantity")))
    errors = F.concat_ws("; ", price_err, quantity_err)

    is_valid = (missing == "") & (errors == "")
    status = (
        F.when(missing != "", F.concat(F.lit("Missing required fields: "), missing))
        .when(errors != "", errors)
        .otherwise(F.lit(VALID_STATUS))
    )
    # T7, null-guarded (ST4 fix): only all-digit strings are epoch days.
    date_norm = F.when(
        F.col("order_date").isNotNull() & F.col("order_date").rlike("^[0-9]+$"),
        F.date_format(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                F.col("order_date").try_cast("int"),
            ),
            "yyyy-MM-dd",
        ),
    ).otherwise(F.col("order_date"))

    return df.select(
        "order_id",
        "product_name",
        quantity_d.alias("quantity"),
        price_d.alias("price"),
        date_norm.alias("order_date"),
        F.when(is_valid, F.round(quantity_d * price_d, 2))
        .otherwise(F.lit(None).cast("double"))
        .alias("total_price"),
        is_valid.alias("is_valid"),
        status.alias("status_message"),
    )


# ANSI-SQL twin for the DuckDB oracle; expects a relation named `raw` with
# the orders_raw columns, produces the same output columns.
VALIDATE_ENRICH_SQL = f"""
SELECT
  order_id,
  product_name,
  quantity_d AS quantity,
  price_d AS price,
  CASE WHEN order_date IS NOT NULL AND regexp_matches(order_date, '^[0-9]+$')
       THEN strftime(DATE '1970-01-01' + TRY_CAST(order_date AS INTEGER), '%Y-%m-%d')
       ELSE order_date END AS order_date,
  CASE WHEN missing = '' AND errors = ''
       THEN {round_sql('quantity_d * price_d', 2)} END AS total_price,
  (missing = '' AND errors = '') AS is_valid,
  CASE WHEN missing <> '' THEN 'Missing required fields: ' || missing
       WHEN errors <> '' THEN errors
       ELSE 'Validated and enriched successfully' END AS status_message
FROM (
  SELECT *,
    concat_ws('; ',
      CASE WHEN price_d IS NULL THEN 'Invalid price: ' || price
           WHEN price_d < 0 THEN 'Negative price: ' || price END,
      CASE WHEN quantity_d IS NULL THEN 'Invalid quantity: ' || quantity
           WHEN quantity_d < 0 THEN 'Negative quantity: ' || quantity END
    ) AS errors
  FROM (
    SELECT *,
      concat_ws(', ',
        CASE WHEN order_id IS NULL THEN 'order_id' END,
        CASE WHEN product_name IS NULL THEN 'product_name' END,
        CASE WHEN quantity IS NULL THEN 'quantity' END,
        CASE WHEN price IS NULL THEN 'price' END,
        CASE WHEN order_date IS NULL THEN 'order_date' END) AS missing,
      TRY_CAST(price AS DOUBLE) AS price_d,
      TRY_CAST(quantity AS DOUBLE) AS quantity_d
    FROM raw
  )
)
"""
