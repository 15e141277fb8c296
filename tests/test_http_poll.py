"""S1 HTTP poll source: SIMPLE_INCREMENTING offsets + end-to-end into the
streaming pipeline (fake fetcher -- no network)."""

from streamprocessing_with_kafka_spark.sources.http_poll import HttpPollSource
from streamprocessing_with_kafka_spark.streaming.pipeline import start_file_pipeline


def _order(i):
    return {
        "order_id": str(i),
        "product_name": f"p{i}",
        "quantity": "2",
        "price": "10",
        "order_date": "2024-01-01",
    }


def test_simple_incrementing_offsets(tmp_path):
    collection = [_order(1), _order(2)]
    src = HttpPollSource(lambda: list(collection), str(tmp_path / "land"))

    assert src.poll_once() == 2
    assert src.offset == 2
    # unchanged collection -> nothing re-landed (the connector's
    # don't-re-ingest behavior, without the 24h-poll-interval hack)
    assert src.poll_once() == 0

    collection.append(_order(3))
    assert src.poll_once() == 1
    assert src.offset == 3


def test_poll_to_pipeline_end_to_end(spark, tmp_path):
    land, out, ckpt = tmp_path / "land", tmp_path / "out", tmp_path / "ckpt"
    src = HttpPollSource(lambda: [_order(1), _order(2)], str(land))
    assert src.run(interval_s=0, max_polls=3) == 2  # idempotent re-polls

    q = start_file_pipeline(spark, str(land), str(out), str(ckpt))
    q.awaitTermination(120)
    got = spark.read.parquet(str(out / "enriched_orders"))
    assert sorted(r["order_id"] for r in got.collect()) == ["1", "2"]
    assert all(r["total_price"] == 20.0 for r in got.collect())
