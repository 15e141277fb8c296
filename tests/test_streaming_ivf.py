"""Streaming IVF ingest: the per-row fold argmax must reproduce the
batch crossJoin+rank assignment exactly, including ties, with zero
Python/shuffle/state on the scoring path."""

import json
import math

from streamprocessing_with_kafka_spark.operators.similarity import (
    ivf_assignments,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.ivf_ingest import (
    ivf_centroid_model,
    streaming_ivf_assign,
)

VEC_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


def test_streaming_ivf_converges_to_batch(spark, sf_dir, tmp_path):
    rows = [
        {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding],
         "label": r.label}
        for r in load_table(spark, sf_dir, "embeddings").collect()
    ]
    inp, ckpt = tmp_path / "vecs", tmp_path / "ckpt"
    inp.mkdir()
    per = math.ceil(len(rows) / 3)
    for b in range(3):
        with open(inp / f"b{b}.json", "w") as f:
            for r in rows[b * per : (b + 1) * per]:
                f.write(json.dumps(r) + "\n")
    model = ivf_centroid_model(spark, sf_dir).localCheckpoint()
    stream = spark.readStream.schema(VEC_SCHEMA).json(str(inp))
    q = (
        streaming_ivf_assign(stream, model)
        .writeStream.format("memory")
        .queryName("ivf_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        r.vec_id: r.cell for r in spark.sql("SELECT * FROM ivf_stream").collect()
    }
    batch = {r.vec_id: r.cell for r in ivf_assignments(spark, sf_dir).collect()}
    assert streamed == batch and batch


def test_streaming_ivf_is_pure_expression(spark, sf_dir):
    model = ivf_centroid_model(spark, sf_dir).localCheckpoint()
    vecs = load_table(spark, sf_dir, "embeddings")
    plan = (
        streaming_ivf_assign(vecs, model)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan
    assert "Exchange hash" not in plan, plan


def test_streaming_ivf_ingest_gate_drops_corrupt_vectors(spark, sf_dir):
    """The ingest gate is the streaming twin of the batch clean scan
    (r9 policy): NULL vectors and vectors carrying a NULL component
    never enter the index, so stream and batch indexes agree on
    membership."""
    model = ivf_centroid_model(spark, sf_dir).localCheckpoint()
    vecs = spark.createDataFrame(
        [
            (0, [0.1] * 64, 0),
            (1, None, 0),
            (2, [0.1] * 63 + [None], 0),
        ],
        VEC_SCHEMA,
    )
    got = streaming_ivf_assign(vecs, model).collect()
    assert [r.vec_id for r in got] == [0]
    assert got[0].cell is not None
