"""Streaming joins: stream-static enrichment and watermarked
stream-stream joins -- the two join modes Structured Streaming supports
that the reference (a single-topic consumer) has no analog for.

  - stream-static: each micro-batch probes a batch-side table; with a
    small dimension the join is a broadcast hash probe per batch (no
    state, no shuffle of the stream side). The static side re-resolves
    per batch, so slowly-changing dims pick up updates on file sources.

  - stream-stream: both sides buffer in the state store; the watermarks
    bound how long an unmatched row waits (= state size), and the join
    time-range condition tells Spark exactly when buffered rows are
    provably unmatchable and can be evicted. Without BOTH constraints
    state grows forever -- the eviction math is the whole operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_with_catalog(stream: DataFrame, catalog: DataFrame) -> DataFrame:
    """Stream-static LEFT join: attach catalog attributes (per-product
    category/cost) to the order stream; unmatched products keep nulls
    (enrichment must not drop rows)."""
    return stream.join(F.broadcast(catalog), "product_name", "left")


def join_orders_payments(
    orders: DataFrame, payments: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream INNER join: payment must arrive within
    `within` AFTER its order (event time). Both sides carry watermarks;
    the range condition bounds the buffered state on each."""
    o = orders.withWatermark("order_ts", within)
    p = payments.withWatermark("pay_ts", within)
    return o.join(
        p,
        (o.order_id == p.pay_order_id)
        & (p.pay_ts >= o.order_ts)
        & (p.pay_ts <= o.order_ts + F.expr(f"INTERVAL {within}")),
    ).select(
        "order_id", "order_ts", "total_price", "pay_ts", "amount"
    )


def join_orders_payments_left_outer(
    orders: DataFrame, payments: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: matched (order, payment)
    pairs emit as they meet; an UNPAID order emits null-extended only when
    the watermark has passed order_ts + within -- i.e. when the state
    store can PROVE no qualifying payment can still arrive. That proof is
    the difference from batch outer joins: the null side is a deferred,
    watermark-triggered emission, not an immediate one, which is why the
    global watermark (min across both sources) must advance past the
    join window before unmatched rows surface."""
    o = orders.withWatermark("order_ts", within)
    p = payments.withWatermark("pay_ts", within)
    return o.join(
        p,
        (o.order_id == p.pay_order_id)
        & (p.pay_ts >= o.order_ts)
        & (p.pay_ts <= o.order_ts + F.expr(f"INTERVAL {within}")),
        "left_outer",
    ).select("order_id", "order_ts", "total_price", "pay_ts", "amount")
