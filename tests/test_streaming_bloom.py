"""Bloom-filter streaming dedup: flags must match exact ground truth when
the filter is amply sized, and degrade ONLY toward false positives (never
false negatives) when it is squeezed."""

import json

from streamprocessing_with_kafka_spark.sources.tables import load_table
from streamprocessing_with_kafka_spark.streaming.bloom_dedup import (
    bloom_positions,
    streaming_bloom_dedup,
)
from streamprocessing_with_kafka_spark.streaming.curation import (
    file_document_stream,
)


def _run_stream(spark, tmp_path, batches, name, **kwargs):
    """batches: list of row-dict lists -> one JSONL file each."""
    inp, ckpt = tmp_path / "docs", tmp_path / "ckpt"
    inp.mkdir()
    for b, rows in enumerate(batches):
        with open(inp / f"b{b}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    q = (
        streaming_bloom_dedup(file_document_stream(spark, str(inp)), **kwargs)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain"
    return spark.sql(f"SELECT doc_id, fingerprint, is_dup FROM {name}").collect()


def _doc_batches(spark, sf_dir, n_copies=40):
    """Fixture corpus + planted exact duplicates in a LATER micro-batch,
    so ground truth is unambiguous (originals always arrive first)."""
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    ]
    max_id = max(r["doc_id"] for r in rows)
    copies = [
        {**rows[i], "doc_id": max_id + 1 + i} for i in range(n_copies)
    ]
    return [rows, copies], {c["doc_id"] for c in copies}


def test_bloom_flags_match_exact_truth_when_amply_sized(spark, sf_dir, tmp_path):
    batches, dup_ids = _doc_batches(spark, sf_dir)
    got = _run_stream(spark, tmp_path, batches, "bloom_ok")
    # originals may themselves contain duplicate texts; ground truth is
    # "fingerprint already emitted by a lower doc_id"
    first_seen: dict[str, int] = {}
    expect_dup = set()
    for r in sorted(got, key=lambda r: r.doc_id):
        if r.fingerprint in first_seen:
            expect_dup.add(r.doc_id)
        else:
            first_seen[r.fingerprint] = r.doc_id
    flagged = {r.doc_id for r in got if r.is_dup}
    assert flagged == expect_dup
    assert dup_ids <= flagged  # every planted copy caught


def test_bloom_never_false_negative_when_squeezed(spark, sf_dir, tmp_path):
    """64 bits for hundreds of fingerprints: false positives guaranteed,
    but every TRUE duplicate must still be flagged."""
    batches, dup_ids = _doc_batches(spark, sf_dir)
    got = _run_stream(
        spark, tmp_path, batches, "bloom_tight", n_words=1, k=2
    )
    flagged = {r.doc_id for r in got if r.is_dup}
    assert dup_ids <= flagged, dup_ids - flagged
    assert len(flagged) > len(dup_ids)  # the squeeze really collided


def test_bloom_positions_deterministic_and_in_range():
    a = bloom_positions("abc", 1024)
    assert a == bloom_positions("abc", 1024)
    assert all(0 <= p < 1024 for p in a)
    assert a != bloom_positions("abd", 1024)


def test_bloom_null_text_docs_dedup_as_one_group(spark, tmp_path):
    """NULL-text docs carry a NULL fingerprint; batch dedup_exact keeps
    ONE NULL-fingerprint group, so the stream must dedup them against
    each other (first keeper, rest dups) instead of raising on
    None.encode (r9 mixed-nulls twin audit)."""
    rows = [
        {"doc_id": 1, "text": None, "lang": "en", "source": "a", "n_chars": 0},
        {"doc_id": 2, "text": "real document body here", "lang": "en",
         "source": "a", "n_chars": 23},
        {"doc_id": 3, "text": None, "lang": "en", "source": "a", "n_chars": 0},
    ]
    got = {r.doc_id: r for r in _run_stream(spark, tmp_path, [rows], "bloom_nulls")}
    assert got[1].fingerprint is None and not got[1].is_dup
    assert got[3].fingerprint is None and got[3].is_dup  # second NULL doc
    assert got[2].fingerprint is not None and not got[2].is_dup
