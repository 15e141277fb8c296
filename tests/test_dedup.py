"""Dedup invariants the oracle hash cannot express: the hot-shingle
DF-cap's subset/recall contract on a synthetic blowup fixture, and the
SimHash pigeonhole banding's recall-1 guarantee vs brute force."""

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.dedup import (
    HAMMING_MAX,
    jaccard_pairs_from_shingles,
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_signatures,
    split_leakage_safe,
)


def _shingle_fixture(spark):
    """4 docs: (1,2) true near-dups via 5 distinctive shared shingles;
    (5,6) overlap ONLY on the hot boilerplate shingle 0 (df=4) -- the pair
    class whose candidate count explodes quadratically with the hot
    shingle's document frequency."""
    rows = []
    for doc in (1, 2):
        for h in (0, 10, 11, 12, 13, 14):
            rows.append((doc, h, 6))
    for doc in (5, 6):
        rows.append((doc, 0, 1))
    return spark.createDataFrame(rows, "doc_id long, _h long, n long")


def test_shingle_df_cap_is_subset_with_boilerplate_pairs_dropped(spark):
    sh = _shingle_fixture(spark)
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs_from_shingles(sh, threshold=0.7).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs_from_shingles(sh, threshold=0.7, max_shingle_df=3).collect()
    }
    # uncapped finds both the true near-dup and the boilerplate-only pair
    assert set(uncapped) == {(1, 2), (5, 6)}
    # capped: subset, true near-dups survive, boilerplate-only pair gone
    assert set(capped) == {(1, 2)}
    # capped jaccard UNDERestimates (denominator keeps the uncapped n)
    assert capped[(1, 2)] == round(5 / 7, 6) < uncapped[(1, 2)] == 1.0
    # every capped jaccard is a lower bound of its uncapped value
    for pair, j in capped.items():
        assert j <= uncapped[pair]


def test_simhash_banding_recall_is_one(spark, sf_dir):
    """The blocked equi-join must find EXACTLY the pairs the O(N^2)
    signature cross-pairing finds (pigeonhole: <= HAMMING_MAX flipped bits
    cannot touch all HAMMING_MAX+1 blocks)."""
    sig = simhash_signatures(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .collect()
    }
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(spark, sf_dir).collect()
    }
    assert banded == brute


def test_leakage_safe_split_never_straddles_near_dup_pairs(spark, sf_dir):
    """THE invariant: any two documents connected by a near-dup edge must
    land in the same split (they share a cluster keeper, and the split is
    a function of the keeper alone). Also: all docs assigned, exactly
    once, to a valid split."""
    splits = split_leakage_safe(spark, sf_dir)
    rows = splits.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert {r.split for r in rows} <= {"train", "val", "test"}
    by_doc = {r.doc_id: r.split for r in rows}
    pairs = minhash_lsh_pairs(spark, sf_dir, 0.7).collect()
    assert pairs, "fixture has no near-dup pairs"
    for p in pairs:
        assert by_doc[p.doc_a] == by_doc[p.doc_b], (p.doc_a, p.doc_b)


def test_dup_span_stats_planted_fixture(spark):
    """A doc sharing one 8-word span with another must count exactly the
    shared spans; a unique doc must count zero; a doc shorter than the
    span length gets n_spans = 0 and keep = True."""
    from streamprocessing_with_kafka_spark.operators.dedup import (
        DUP_SPAN_N,
        dup_span_stats_frame,
    )

    shared = " ".join(f"s{i}" for i in range(DUP_SPAN_N))  # exactly one span
    docs = spark.createDataFrame(
        [
            (0, shared + " tail0 tail1"),          # 3 spans, 1 shared
            (1, "head0 head1 " + shared),          # 3 spans, 1 shared
            (2, " ".join(f"u{i}" for i in range(12))),  # unique, 5 spans
            (3, "too short"),                      # < DUP_SPAN_N tokens
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dup_span_stats_frame(docs).collect()}
    assert got[0].n_spans == 3 and got[0].n_dup_spans == 1
    assert got[1].n_spans == 3 and got[1].n_dup_spans == 1
    assert got[2].n_spans == 5 and got[2].n_dup_spans == 0
    assert got[3].n_spans == 0 and got[3].n_dup_spans == 0 and got[3].keep
    assert got[0].dup_frac == round(1 / 3, 6)


def test_dedup_incremental_statuses_match_pairwise_truth(spark, sf_dir):
    """One row per batch doc; a batch doc is near_dup iff some banded
    near-dup pair (the same LSH family) connects it to a HISTORY doc;
    exact_dup iff its canonical fingerprint exists in history."""
    from streamprocessing_with_kafka_spark.operators.dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_THRESHOLD,
        dedup_incremental,
    )
    from streamprocessing_with_kafka_spark.operators.text import canonical_text

    got = {r.doc_id: r.status for r in dedup_incremental(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_ids = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0).collect()
    }
    assert set(got) == batch_ids

    fps = {
        r.doc_id: r.f
        for r in docs.select("doc_id", F.md5(canonical_text()).alias("f")).collect()
    }
    hist_fps = {f for d, f in fps.items() if d % INCREMENTAL_BATCH_MOD != 0}
    exact = {d for d in batch_ids if fps[d] in hist_fps}

    near = set()
    for p in minhash_lsh_pairs(spark, sf_dir, INCREMENTAL_THRESHOLD).collect():
        for d, other in ((p.doc_a, p.doc_b), (p.doc_b, p.doc_a)):
            if d % INCREMENTAL_BATCH_MOD == 0 and other % INCREMENTAL_BATCH_MOD != 0:
                near.add(d)

    for d in batch_ids:
        want = (
            "exact_dup" if d in exact else "near_dup" if d in near else "kept"
        )
        assert got[d] == want, (d, got[d], want)
    assert near - exact, "fixture has no cross-snapshot near-dups (vacuous)"


def test_dup_span_scrub_matches_python_reference(spark):
    """The scrub's exact semantics, recomputed independently in plain
    Python over a planted fixture: rank every 8-gram occurrence by
    (doc_id, pos), drop tokens covered by any rn>=2 occurrence, keep the
    corpus-first occurrence verbatim. The fixture plants one syndicated
    paragraph in three docs (once early, once mid-text, once twice in the
    SAME doc) so cross-doc removal, offset-shifted removal, and intra-doc
    removal are all exercised."""
    from streamprocessing_with_kafka_spark.operators.dedup import (
        DUP_SPAN_N,
        dup_span_scrub_frame,
    )

    boiler = " ".join(f"b{i}" for i in range(10))  # 10-token shared paragraph
    docs = [
        (1, boiler + " " + " ".join(f"x{i}" for i in range(6))),
        (2, " ".join(f"y{i}" for i in range(5)) + " " + boiler),
        (3, boiler + " mid " + boiler),
        (4, " ".join(f"z{i}" for i in range(12))),  # untouched
        (5, "short text"),  # < N tokens
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")

    # ---- python reference
    occ = []  # (doc_id, pos, span)
    for doc_id, text in docs:
        t = text.split(" ")
        for p in range(len(t) - DUP_SPAN_N + 1):
            occ.append((doc_id, p + 1, " ".join(t[p : p + DUP_SPAN_N])))
    first = {}
    for doc_id, pos, span in sorted(occ):
        first.setdefault(span, (doc_id, pos))
    covered = {}
    for doc_id, pos, span in occ:
        if first[span] != (doc_id, pos):
            for j in range(DUP_SPAN_N):
                covered.setdefault(doc_id, set()).add(pos + j)
    expect = {}
    for doc_id, text in docs:
        t = text.split(" ")
        kept = [tok for i, tok in enumerate(t) if i + 1 not in covered.get(doc_id, set())]
        expect[doc_id] = (len(t), len(kept), " ".join(kept))

    got = {
        r.doc_id: (r.n_tokens, r.n_tokens_kept, r.scrubbed_text)
        for r in dup_span_scrub_frame(d).collect()
    }
    assert got == expect
    # the fixture must be non-trivial: some doc loses tokens, doc 4 doesn't,
    # and the first occurrence of the boilerplate survives somewhere
    assert got[4][2] == docs[3][1]
    assert any(g[1] < g[0] for g in got.values())
    assert boiler in got[1][2]


def test_export_packed_excludes_eval_and_keeps_one_per_cluster(spark, sf_dir):
    """The v3 export's two pinned hygiene properties: (1) no eval-slice
    doc ever reaches the training manifest; (2) every near-dup cluster
    with at least one gated survivor exports EXACTLY one representative
    (its smallest surviving member), rather than zero when the corpus-
    wide keeper was itself sampled out or contaminated."""
    from streamprocessing_with_kafka_spark.operators.compose import (
        export_packed_pipeline,
    )
    from streamprocessing_with_kafka_spark.operators.decontaminate import (
        EVAL_MOD,
        decontaminate_fuzzy,
    )
    from streamprocessing_with_kafka_spark.operators.dedup import (
        dedup_cluster_keepers,
    )
    from streamprocessing_with_kafka_spark.operators.sampling import dsir_sample

    exported = {r.doc_id for r in export_packed_pipeline(spark, sf_dir).collect()}
    assert exported and not {d for d in exported if d % EVAL_MOD == 0}

    kept = {
        r.doc_id
        for r in dsir_sample(spark, sf_dir).filter("is_kept").collect()
        if r.doc_id % EVAL_MOD != 0
    }
    contaminated = {r.doc_id for r in decontaminate_fuzzy(spark, sf_dir).collect()}
    gated = kept - contaminated
    cluster_of = {
        r.doc_id: r.keeper_doc_id
        for r in dedup_cluster_keepers(spark, sf_dir).collect()
    }
    from collections import defaultdict

    by_cluster = defaultdict(set)
    for d in gated:
        by_cluster[cluster_of.get(d, d)].add(d)
    expected = {min(m) for m in by_cluster.values()}
    assert exported == expected
