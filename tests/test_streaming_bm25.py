"""Streaming BM25 search: query docs streamed against the frozen index
must reproduce the batch ranker's rows bit-for-bit."""

import json

from streamprocessing_with_kafka_spark.operators.text import (
    BM25_N_QUERIES,
    text_bm25_topk,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.bm25_search import (
    bm25_search_sink,
    frozen_index,
)
from streamprocessing_with_kafka_spark.streaming.curation import (
    file_document_stream,
)


def test_streaming_bm25_converges_to_batch(spark, sf_dir, tmp_path):
    probes = (
        load_table(spark, sf_dir, "documents")
        .filter(f"doc_id < {BM25_N_QUERIES}")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )
    inp, ckpt, audit = tmp_path / "q", tmp_path / "ckpt", tmp_path / "audit"
    inp.mkdir()
    # one probe per micro-batch: three separate ranking triggers
    for i, r in enumerate(probes):
        with open(inp / f"b{i}.json", "w") as f:
            f.write(json.dumps(r.asDict()) + "\n")
    index = frozen_index(spark, sf_dir)
    q = (
        file_document_stream(spark, str(inp))
        .writeStream.foreachBatch(bm25_search_sink(index, str(audit)))
        .option("checkpointLocation", str(ckpt))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    streamed = {
        (r.q_id, r.n_id): (r.bm25, r.rank)
        for r in spark.read.parquet(str(audit)).collect()
    }
    batch = {
        (r.q_id, r.n_id): (r.bm25, r.rank)
        for r in text_bm25_topk(spark, sf_dir).collect()
    }
    assert streamed == batch and batch
