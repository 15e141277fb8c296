"""Right-to-be-forgotten cascade: the kept frames must agree with the
audit counts, and no forgotten key may survive on ANY surface (the
orphaned-derivative bug the cascade exists to prevent)."""

from pyspark.sql import functions as F

from streamprocessing_with_kafka_spark.operators.crud import (
    FORGET_KEY_MOD,
    forget_audit,
    forget_cascade,
)


def test_forget_cascade_consistent_with_audit(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    forget = docs.filter(F.col("doc_id") % FORGET_KEY_MOD == 0).select("doc_id")

    kept_docs, kept_emb = forget_cascade(docs, emb, forget)
    audit = {r.surface: r for r in forget_audit(docs, emb, forget).collect()}

    assert audit["documents"].rows_removed > 0, "vacuous forget set"
    assert kept_docs.count() == audit["documents"].rows_after
    assert kept_emb.count() == audit["embeddings"].rows_after
    for a in audit.values():
        assert a.rows_before == a.rows_removed + a.rows_after

    keys = {r.doc_id for r in forget.collect()}
    assert not [r for r in kept_docs.select("doc_id").collect() if r.doc_id in keys]
    assert not [r for r in kept_emb.select("vec_id").collect() if r.vec_id in keys]
