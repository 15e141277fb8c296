"""Streaming decontamination twin: scoring the corpus through the
broadcast-dictionary mapInPandas gate must reproduce the batch operator
row-for-row, across micro-batches, with zero streaming state."""

import json
import math

from streamprocessing_with_kafka_spark.operators.decontaminate import (
    decontaminate,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.curation import (
    file_document_stream,
)
from streamprocessing_with_kafka_spark.streaming.decontaminate import (
    eval_gram_hashes,
    streaming_decontaminate,
)


def test_streaming_decontam_converges_to_batch(spark, sf_dir, tmp_path):
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    ]
    inp, ckpt = tmp_path / "docs", tmp_path / "ckpt"
    inp.mkdir()
    per = math.ceil(len(rows) / 3)
    for b in range(3):
        with open(inp / f"b{b}.json", "w") as f:
            for r in rows[b * per : (b + 1) * per]:
                f.write(json.dumps(r) + "\n")
    ev = spark.sparkContext.broadcast(eval_gram_hashes(spark, sf_dir))
    q = (
        streaming_decontaminate(file_document_stream(spark, str(inp)), ev)
        .writeStream.format("memory")
        .queryName("decontam_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        r.doc_id: (r.n_ngrams, r.n_hits, r.contamination_frac, r.is_contaminated)
        for r in spark.sql("SELECT * FROM decontam_stream").collect()
    }
    batch = {
        r.doc_id: (r.n_ngrams, r.n_hits, r.contamination_frac, r.is_contaminated)
        for r in decontaminate(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_decontam_is_stateless_plan(spark, sf_dir):
    """The gate must stay a narrow mapInPandas over the stream -- no
    aggregation, no stateful operator, no shuffle (batch-mode plan of the
    same transformation shows the shape)."""
    ev = eval_gram_hashes(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    plan = (
        streaming_decontaminate(d, ev)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan
