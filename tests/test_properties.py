"""Property-based invariants for the validate/enrich/route core
(SURVEY.md §5 item 4): for ANY input row mix, every row lands in exactly
one branch, enrichment matches the reference formula, and the pipeline is
deterministic."""

import decimal
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from streamprocessing_with_kafka_spark.operators.route import route
from streamprocessing_with_kafka_spark.operators.validate import (
    REQUIRED_FIELDS,
    validate_and_enrich,
)

RAW_SCHEMA = StructType([StructField(f, StringType()) for f in REQUIRED_FIELDS])

number_like = st.one_of(
    st.integers(-1000, 1000).map(str),
    st.floats(
        min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False
    ).map(lambda v: f"{v:.4f}"),
    st.sampled_from(["abc", "", "1e3", "  7 ", "NaN", "-0"]),
)
date_like = st.one_of(
    st.dates().map(lambda d: d.isoformat()),
    st.integers(0, 40000).map(str),  # epoch days
    st.sampled_from(["not-a-date", "2024-13-45", ""]),
)
order = st.fixed_dictionaries(
    {
        "order_id": st.one_of(st.none(), st.integers(0, 10**6).map(str)),
        "product_name": st.one_of(st.none(), st.text(max_size=20)),
        "quantity": st.one_of(st.none(), number_like),
        "price": st.one_of(st.none(), number_like),
        "order_date": st.one_of(st.none(), date_like),
    }
)


def _run(spark, rows):
    df = spark.createDataFrame(
        [tuple(r[f] for f in REQUIRED_FIELDS) for r in rows], RAW_SCHEMA
    )
    return route(validate_and_enrich(df)).collect()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(order, min_size=1, max_size=12))
def test_pipeline_invariants(spark, rows):
    out = _run(spark, rows)

    # conservation: every input row exits exactly once, in exactly one branch
    assert len(out) == len(rows)
    assert all(r["target"] in ("enriched_orders", "invalid_orders") for r in out)

    for r in out:
        if r["is_valid"]:
            assert r["target"] == "enriched_orders"
            # reference formula: total_price = round(q * p, 2). NB 'NaN'
            # parses as a float in BOTH the reference (float('NaN')) and
            # try_cast, and NaN < 0 is false -- so NaN rows are "valid",
            # faithfully mirroring order_validator.py:146-163.
            assert r["quantity"] is not None and r["price"] is not None
            if math.isnan(r["quantity"]) or math.isnan(r["price"]):
                assert math.isnan(r["total_price"])
            else:
                assert r["quantity"] >= 0 and r["price"] >= 0
                # Spark's round() is HALF_UP on the shortest decimal repr
                # of the double (BigDecimal.valueOf), matching the DuckDB
                # oracle. Python's round() is banker's on the binary value
                # and disagrees on exact .xx5 products (e.g. 3 * 1.375),
                # so the expectation must model HALF_UP explicitly.
                expect = float(
                    decimal.Decimal(repr(r["quantity"] * r["price"])).quantize(
                        decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
                    )
                )
                assert math.isclose(
                    r["total_price"], expect, rel_tol=0, abs_tol=1e-9
                )
            assert r["status_message"] == "Validated and enriched successfully"
        else:
            assert r["target"] == "invalid_orders"
            assert r["total_price"] is None
            assert r["status_message"]  # non-empty reject reason
        # T9: the kafka key is never null
        assert r["kafka_key"] is not None

    # determinism: identical input -> identical output (string-canonical
    # comparison: NaN != NaN would fail a plain Row equality)
    again = _run(spark, rows)
    canon = lambda rs: sorted(tuple(str(v) for v in r) for r in rs)
    assert canon(out) == canon(again)


# ---------------------- round-3 primitive properties (pure Python, fast)


@settings(deadline=None)  # first call pays the module import
@given(st.text(min_size=1, max_size=40), st.integers(6, 20))
def test_bloom_positions_properties(fp, log2_bits):
    """k positions: in range, deterministic, and the double-hashing step
    is odd (full period) so positions are not all identical."""
    from streamprocessing_with_kafka_spark.streaming.bloom_dedup import (
        BLOOM_K,
        bloom_positions,
    )

    n_bits = 1 << log2_bits
    pos = bloom_positions(fp, n_bits)
    assert len(pos) == BLOOM_K
    assert all(0 <= p < n_bits for p in pos)
    assert pos == bloom_positions(fp, n_bits)


@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    )
)
def test_int8_quantizer_reference_properties(vec):
    """The floor(x*127/scale + 0.5) formula: codes in [-127, 127] and
    per-component reconstruction error <= scale/127 (half a step each
    way, plus the scale floor for all-zero vectors)."""
    scale = max(max(abs(x) for x in vec), 1e-30)
    codes = [math.floor(x * 127 / scale + 0.5) for x in vec]
    assert all(-127 <= c <= 127 for c in codes)
    for x, c in zip(vec, codes):
        assert abs(c * scale / 127 - x) <= scale / 127 + 1e-12
