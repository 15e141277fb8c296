"""Semantic tests for the corpus-level text operators: PMI collocation
mining and the Heaps'-law vocabulary growth curve (registered queries
`text_collocations` / `text_vocab_growth`; engine parity is covered by
test_oracle_parity -- these pin the MATH on planted fixtures)."""

import math

from streamprocessing_with_kafka_spark.operators.text import (
    COLLOC_MIN_COUNT,
    VOCAB_BUCKET,
    collocations,
    vocab_growth,
)


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).selectExpr(
        "doc_id", "'test' AS source", "'en' AS lang", "text",
        "CAST('2024-01-01' AS TIMESTAMP) AS crawl_ts",
    ).write.mode("overwrite").parquet(path + "/documents.parquet")


def test_collocations_rank_bound_pair_over_frequent_pair(spark, tmp_path):
    """'new york' always co-occurs (perfect collocation, npmi == 1 when
    both words only appear in the pair); 'of the' is frequent but
    independent, so it ranks below."""
    d = str(tmp_path / "coll")
    texts = [("new york " + "of x the y " * 3).strip()] * COLLOC_MIN_COUNT
    _write_docs(spark, d, texts)
    rows = collocations(spark, d).collect()
    got = {(r.w_prev, r.w): r for r in rows}
    assert ("new", "york") in got
    ny = got[("new", "york")]
    # both 'new' and 'york' occur ONLY inside the pair -> npmi = 1
    assert ny.npmi == 1.0
    # 'of the' never occurs adjacently here; 'of x' does, but x also
    # pairs with 'the', diluting its association below the perfect pair
    assert rows[0].w_prev == "new" and rows[0].w == "york"
    for r in rows:
        assert r.c_ab >= COLLOC_MIN_COUNT
        assert r.npmi <= 1.0


def test_collocations_pmi_hand_computed(spark, tmp_path):
    """One doc 'a b a b a b a c': c(a,b)=3, c(b,a)=3, c1(a)=4, c1(b)=3,
    T=8; (a,c) falls below COLLOC_MIN_COUNT and must be absent."""
    d = str(tmp_path / "pmi")
    _write_docs(spark, d, ["a b a b a b a c"])
    got = {(r.w_prev, r.w): r for r in collocations(spark, d).collect()}
    assert set(got) == {("a", "b"), ("b", "a")}
    pmi = math.log((3 / 8) / ((4 / 8) * (3 / 8)))
    npmi = pmi / -math.log(3 / 8)
    for pair in [("a", "b"), ("b", "a")]:
        assert abs(got[pair].pmi - pmi) < 1e-6
        assert abs(got[pair].npmi - npmi) < 1e-6


def test_vocab_growth_hand_computed_two_docs(spark, tmp_path):
    d = str(tmp_path / "vg2")
    _write_docs(spark, d, ["a b", "a c"])
    rows = {r.doc_id: r for r in vocab_growth(spark, d).collect()}
    assert (rows[0].cum_tokens, rows[0].cum_vocab) == (2, 2)
    assert (rows[1].cum_tokens, rows[1].cum_vocab) == (4, 3)
    # log-log OLS through (ln2, ln2), (ln4, ln3)
    beta = (math.log(3) - math.log(2)) / (math.log(4) - math.log(2))
    assert abs(rows[0].heaps_beta - beta) < 1e-6
    k = math.exp(
        (math.log(2) + math.log(3)) / 2 - beta * (math.log(2) + math.log(4)) / 2
    )
    assert abs(rows[0].heaps_k - k) < 1e-5


def test_vocab_growth_bucket_decomposition_matches_global_cumsum(
    spark, tmp_path
):
    """> 2*VOCAB_BUCKET docs so the two-phase prefix sum crosses range
    boundaries; compare against a brute-force Python cumsum."""
    d = str(tmp_path / "vgb")
    n = 2 * VOCAB_BUCKET + 7
    texts = [f"w{i % 17} w{(i * 3) % 31} common" for i in range(n)]
    _write_docs(spark, d, texts)
    rows = sorted(vocab_growth(spark, d).collect(), key=lambda r: r.doc_id)
    seen, cum_v, cum_t = set(), [], 0
    for i, t in enumerate(texts):
        words = t.split(" ")
        cum_t += len(words)
        seen.update(words)
        cum_v.append((cum_t, len(seen)))
    assert [(r.cum_tokens, r.cum_vocab) for r in rows] == cum_v


def test_zipf_fit_hand_computed(spark, tmp_path):
    """Frequencies 8/4/2/1 over ranks 1-4: OLS on (ln r, ln c) computed
    independently; top-rank share = 8/15."""
    from streamprocessing_with_kafka_spark.operators.text import zipf_fit

    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    d = str(tmp_path / "zipf")
    _write_docs(spark, d, [text])
    r = zipf_fit(spark, d).collect()[0]
    xs = [math.log(i) for i in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r.n_terms_fit == 4
    assert abs(r.zipf_slope - slope) < 1e-6
    assert abs(r.zipf_c - math.exp((sy - slope * sx) / n)) < 1e-5
    assert r.top_rank_share == round(8 / 15, 6)


def test_collocations_and_bigram_survive_one_token_docs(spark, tmp_path):
    """sequence(2, n) runs DESCENDING for n < 2 and would index
    element_at(w, 0) -- 1-token and empty docs must yield no pairs,
    not a runtime error (the code-review crash finding)."""
    from streamprocessing_with_kafka_spark.operators.text import (
        bigram_logprob,
        collocations,
    )

    d = str(tmp_path / "short")
    _write_docs(spark, d, ["solo", "", "a b a b a b"])
    assert collocations(spark, d).count() >= 1  # (a,b)/(b,a) only
    rows = {r.doc_id: r.n_bigrams for r in bigram_logprob(spark, d).collect()}
    assert 0 not in rows and 1 not in rows  # no pairs -> no row
    assert rows[2] == 5


def test_source_jsd_identical_zero_disjoint_ln2(spark, tmp_path):
    """Identical distributions -> JSD 0; disjoint vocabularies -> the
    ln 2 maximum (jsd_norm 1)."""
    d = str(tmp_path / "jsd")
    rows = [
        (0, "A", "x y x"), (1, "A", "y x"),
        (2, "B", "x y x"), (3, "B", "y x"),   # B identical to A
        (4, "C", "q r q r q"),                # C disjoint from both
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).selectExpr(
        "doc_id", "source", "'en' AS lang", "text",
        "CAST('2024-01-01' AS TIMESTAMP) AS crawl_ts",
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    from streamprocessing_with_kafka_spark.operators.text import source_jsd

    got = {
        (r.source_a, r.source_b): r for r in source_jsd(spark, d).collect()
    }
    assert got[("A", "B")].jsd == 0.0
    assert got[("A", "C")].jsd_norm == 1.0
    assert got[("B", "C")].jsd_norm == 1.0


def test_char_entropy_known_distributions(spark, tmp_path):
    """'aaaa' -> 0 bits; 'ab' -> 1 bit; 'abcd' -> 2 bits; empty -> 0;
    plus the zero-shuffle plan pin."""
    from streamprocessing_with_kafka_spark.operators.text import char_entropy

    d = str(tmp_path / "ce")
    _write_docs(spark, d, ["aaaa", "ab", "abcd", ""])
    df = char_entropy(spark, d)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in plan, plan
    got = {r.doc_id: r for r in df.collect()}
    assert got[0].char_entropy_bits == 0.0
    assert got[1].char_entropy_bits == 1.0
    assert got[2].char_entropy_bits == 2.0
    assert got[3].char_entropy_bits == 0.0 and got[3].n_chars == 0
