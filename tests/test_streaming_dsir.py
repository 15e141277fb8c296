"""Streaming DSIR gate: scoring the fit corpus through the frozen-model
pure-expression gate must reproduce the batch operator row-for-row, with
zero streaming state and zero Python on the scoring path."""

import json
import math

from streamprocessing_with_kafka_spark.operators.sampling import dsir_sample
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.curation import (
    file_document_stream,
)
from streamprocessing_with_kafka_spark.streaming.dsir_gate import (
    dsir_model,
    streaming_dsir_gate,
)


def test_streaming_dsir_converges_to_batch(spark, sf_dir, tmp_path):
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
    model = dsir_model(spark, sf_dir).localCheckpoint()
    q = (
        streaming_dsir_gate(file_document_stream(spark, str(inp)), model)
        .writeStream.format("memory")
        .queryName("dsir_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        r.doc_id: (r.n_tokens, r.avg_logratio, r.keep_prob, r.is_kept)
        for r in spark.sql("SELECT * FROM dsir_stream").collect()
    }
    batch = {
        r.doc_id: (r.n_tokens, r.avg_logratio, r.keep_prob, r.is_kept)
        for r in dsir_sample(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_dsir_gate_is_pure_expression(spark, sf_dir):
    """The scoring path must stay inside whole-stage codegen: no Python
    evaluation node, no shuffle of the scored stream, no streaming state
    (batch-mode plan of the same transformation shows the shape; the only
    exchanges allowed are inside the one-row model subtree)."""
    model = dsir_model(spark, sf_dir).localCheckpoint()
    d = load_table(spark, sf_dir, "documents")
    plan = (
        streaming_dsir_gate(d, model)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan
    assert "Exchange hash" not in plan, plan
