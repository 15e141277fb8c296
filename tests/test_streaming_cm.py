"""Streaming count-min: the continuously maintained cells must equal
the batch sketch over the same rows after every prefix of batches, the
state is structurally bounded, and estimates served from live cells
match the batch operator's estimates."""

import json

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.sketches import (
    CM_DEPTH,
    CM_WIDTH,
    count_min_estimates,
)
from streamprocessing_with_kafka_spark.operators.text import EN_STOPWORDS
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.count_min import (
    estimate_from_cells,
    streaming_cm_cells,
    token_cells,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING"


def _batch_cells(spark, docs):
    tokens = docs.select(F.explode(F.split("text", " ")).alias("term"))
    return (
        token_cells(tokens)
        .groupBy("d", "idx")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def test_streaming_cells_converge_and_bound_state(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = docs.collect()
    inp, ckpt = tmp_path / "docs", tmp_path / "ck"
    inp.mkdir()
    per = max(1, len(rows) // 3)
    for b in range(3):
        chunk = rows[b * per :] if b == 2 else rows[b * per : (b + 1) * per]
        with open(inp / f"b{b}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(inp))
    q = (
        streaming_cm_cells(stream)
        .writeStream.format("memory")
        .queryName("cm_cells")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("complete")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        (r.d, r.idx): r.counter
        for r in spark.sql("SELECT * FROM cm_cells").collect()
    }
    batch = {
        (r.d, r.idx): r.counter for r in _batch_cells(spark, docs).collect()
    }
    assert streamed == batch and streamed
    assert len(streamed) <= CM_DEPTH * CM_WIDTH  # structural state bound

    # serving from the live cells == the batch operator's estimates
    cells_df = spark.createDataFrame(
        [(d, i, c) for (d, i), c in streamed.items()], "d int, idx long, counter long"
    )
    probes = spark.createDataFrame(
        [(t,) for t in EN_STOPWORDS], "term string"
    )
    served = {
        r.term: r.cm_estimate
        for r in estimate_from_cells(cells_df, probes).collect()
    }
    batch_est = {
        r.term: r.cm_estimate for r in count_min_estimates(spark, sf_dir).collect()
    }
    for term, est in batch_est.items():
        assert served[term] == est, term
