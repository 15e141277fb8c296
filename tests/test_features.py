"""Hashed TF-IDF invariants: fixed dimensionality, duplicate documents map
to identical vectors (the property that makes hashed vectors usable by the
embedding near-dup path), and the featurizer is vocabulary-stateless."""

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.features import (
    HASH_DIM,
    HASHED_TFIDF_SQL,
    hashed_tfidf,
    hashed_tfidf_frame,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table
from tests.oracle_harness import duckdb_conn


def test_hashed_tfidf_dim_and_duplicate_invariance(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant an exact duplicate of doc 0 under a fresh doc_id
    dup = d.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    vecs = {
        r.doc_id: r.feature
        for r in hashed_tfidf_frame(d.unionByName(dup)).collect()
    }
    assert vecs and all(len(v) == HASH_DIM for v in vecs.values())
    assert vecs[10_000_000] == vecs[0]
    # and distinct documents do differ somewhere (hashing is not collapsing)
    assert any(vecs[i] != vecs[0] for i in vecs if i not in (0, 10_000_000))


def test_hashed_tfidf_dense_oracle(spark, sf_dir):
    """Keep the UNREGISTERED dense-array oracle (HASHED_TFIDF_SQL) alive:
    it is driver-ineligible (array cells), so this local comparison is the
    only thing exercising it -- without it the string would silently rot
    against the shared _SLOTS_CTE prefix (r5 advice)."""
    eng = {
        r.doc_id: tuple(r.feature) for r in hashed_tfidf(spark, sf_dir).collect()
    }
    con = duckdb_conn(sf_dir)
    orc = {
        doc_id: tuple(feature)
        for doc_id, feature in con.sql(HASHED_TFIDF_SQL).fetchall()
    }
    assert eng == orc


def test_bm25_rewards_rare_terms_and_penalizes_length(spark):
    """BM25 semantics on a constructed corpus: for a probe containing a
    rare term, a short doc with the rare term outranks a long doc with
    the same single occurrence (length normalization), and both outrank
    a doc sharing only a ubiquitous term (idf)."""
    from streamprocessing_with_kafka_spark.operators.text import (
        text_bm25_topk_frame,
    )

    common = "x " * 5
    rows = [
        (0, "rare " + common.strip()),          # probe
        (10, "rare " + common.strip()),         # short, has rare term
        (11, "rare " + ("pad " * 40) + common.strip()),  # long, has rare term
        (12, common.strip()),                   # only the common term
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.n_id: r for r in text_bm25_topk_frame(d).filter("q_id = 0").collect()}

    assert set(out) == {10, 11, 12}
    assert out[10].bm25 > out[11].bm25 > out[12].bm25
    assert out[10].rank == 1


def test_slot_weights_plan_shape_invariant_in_hash_dim(spark, sf_dir, monkeypatch):
    """The HASH_DIM=32 default is demo-scale; the docstring claims
    production sizes (2^18-2^22) leave the plan unchanged. Pin it:
    HASH_DIM only enters the sparse featurizer as a modulo constant, so
    the compiled plan at 2^20 must have the identical operator skeleton
    (exchanges, aggregates, joins) as at 32 -- no explode, sequence fill,
    or anything else that scales with the dimension."""
    import re

    from streamprocessing_with_kafka_spark.operators import features

    def skeleton(plan: str) -> list[str]:
        ops = re.findall(
            r"(Exchange hashpartitioning|HashAggregate|SortAggregate|"
            r"BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoopJoin|"
            r"Generate|Expand)",
            plan,
        )
        return ops

    def plan_at(dim: int) -> list[str]:
        monkeypatch.setattr(features, "HASH_DIM", dim)
        df = features.slot_weights(spark, sf_dir)
        return skeleton(df._jdf.queryExecution().executedPlan().toString())

    assert plan_at(1 << 20) == plan_at(32)
