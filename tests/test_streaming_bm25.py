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
    """The stream plumbing (micro-batching, frozen index reuse) must not
    change a single score: streamed rankings equal the batch invocation
    of the same shared tail on the same query set. Self-matches are KEPT
    on the streaming path (query ids are an external id space; the batch
    probe operator excludes them because its probes are corpus docs) --
    so each probe doc also retrieves itself, and the remaining rows are
    drawn from the batch operator's neighbor set."""
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
    from streamprocessing_with_kafka_spark.operators.text import (
        bm25_topk_for_queries,
    )
    from streamprocessing_with_kafka_spark.streaming.bm25_search import (
        query_terms,
    )

    streamed = {
        (r.q_id, r.n_id): (r.bm25, r.rank)
        for r in spark.read.parquet(str(audit)).collect()
    }
    probe_df = load_table(spark, sf_dir, "documents").filter(
        f"doc_id < {BM25_N_QUERIES}"
    )
    batch_same = {
        (r.q_id, r.n_id): (r.bm25, r.rank)
        for r in bm25_topk_for_queries(query_terms(probe_df), index).collect()
    }
    assert streamed == batch_same and streamed
    # each probe is a corpus doc: its self-match must surface in the
    # top-K (not necessarily at rank 1 -- a near-duplicate with more
    # favorable tf saturation / length normalization can outscore the
    # doc itself under BM25)
    for q in {q for q, _ in streamed}:
        assert (q, q) in streamed
    # the non-self neighbor SET is a subset of the batch probe operator
    batch_op = {
        (r.q_id, r.n_id) for r in text_bm25_topk(spark, sf_dir).collect()
    }
    streamed_nonself = {
        (q, n) for (q, n), (_, rk) in streamed.items() if q != n and rk <= 5
    }
    assert streamed_nonself <= batch_op
