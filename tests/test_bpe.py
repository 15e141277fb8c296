"""Semantic tests for distributed BPE merge training: hand-traced
merges on a planted corpus, greedy non-overlapping application, and
determinism of the tie-break."""

from streamprocessing_with_kafka_spark.operators.bpe import bpe_train


def _docs(spark, tmp_path, texts):
    d = str(tmp_path / "bpe")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(d + "/documents.parquet")
    return d


def test_bpe_learns_hand_traced_merges(spark, tmp_path):
    """Corpus 'ab ab ab' + 'abc': round 1 merges (a,b) [count 4],
    round 2 (ab, </w>) [count 3], round 3 the (ab, c) / (c, </w>) tie
    breaks lexicographically to (ab, c)."""
    d = _docs(spark, tmp_path, ["ab ab ab", "abc"])
    rows = {r.round: r for r in bpe_train(spark, d).collect()}
    assert (rows[1].pair_a, rows[1].pair_b, rows[1].pair_count) == ("a", "b", 4)
    assert rows[1].merged == "ab"
    assert (rows[2].pair_a, rows[2].pair_b, rows[2].pair_count) == ("ab", "</w>", 3)
    assert (rows[3].pair_a, rows[3].pair_b, rows[3].pair_count) == ("ab", "c", 1)
    assert rows[3].merged == "abc"


def test_bpe_counts_overlaps_but_merges_greedily(spark, tmp_path):
    """'aaaa': the (a,a) pair count is 3 (overlapping occurrences all
    count, per Sennrich), but the application fold is non-overlapping
    left-to-right, so round 2 sees [aa, aa, </w>] -- proving the fold
    produced two 'aa' units, not a re-merged triple.  The round-2
    (aa,aa)/(aa,</w>) tie breaks lexicographically to (aa, </w>)
    ('<' < 'a'), and round 3 merges the remaining (aa, aa</w>)."""
    d = _docs(spark, tmp_path, ["aaaa"])
    rows = {r.round: r for r in bpe_train(spark, d).collect()}
    assert (rows[1].pair_a, rows[1].pair_b, rows[1].pair_count) == ("a", "a", 3)
    assert (rows[2].pair_a, rows[2].pair_b) == ("aa", "</w>")
    assert (rows[3].pair_a, rows[3].pair_b) == ("aa", "aa</w>")
    assert rows[3].merged == "aaaa</w>"


def test_bpe_encode_uses_trained_segmentation(spark, tmp_path):
    """After the 3 traced merges (ab, ab</w>, abc): 'ab' encodes to the
    single unit [ab</w>], 'abc' to [abc, </w>]."""
    from streamprocessing_with_kafka_spark.operators.bpe import bpe_encode

    d = _docs(spark, tmp_path, ["ab ab ab", "abc"])
    out = {r.doc_id: r for r in bpe_encode(spark, d).collect()}
    r0 = out[0]  # "ab ab ab": 8 chars, 3 words, 3 tokens
    assert (r0.n_words, r0.n_bpe_tokens) == (3, 3)
    assert r0.chars_per_token == round(8 / 3, 6)
    r1 = out[1]  # "abc": 3 chars, 1 word, 2 tokens
    assert (r1.n_words, r1.n_bpe_tokens) == (1, 2)
    assert r1.chars_per_token == 1.5
