"""CRUD query surface over materialized state (SURVEY.md §2.5 Q1-Q5) and
the JDBC-sink upsert/tombstone semantics (§2.3 K2).

The reference exposes scan / filter-by-key / append / delete-by-key via
json-server REST and PK-upsert+tombstone-delete via the Kafka Connect JDBC
sink. Here each is a relational operator:

  scan        -> select (column pruning reaches the parquet scan)
  filter      -> predicate (pushed down to the scan)
  append      -> union
  delete      -> left_anti join (broadcast: the key set is tiny)
  upsert (K2) -> merge: last-writer-wins by key, null payload == tombstone

At 100 TB the merge is the interesting one: we express it as a left join of
base against a *broadcast* update set plus a union of inserts, which is the
same physical shape Delta's MERGE takes when the source is small. For a
large update set it degrades gracefully to a shuffle join on the key --
still one shuffle, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def filter_by_key(df: DataFrame, key_col: str, value) -> DataFrame:
    return df.filter(F.col(key_col) == F.lit(value))


def append_rows(df: DataFrame, rows: DataFrame) -> DataFrame:
    return df.unionByName(rows)


def delete_by_keys(df: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Q5: anti-join delete; the key set is broadcast (tiny dimension)."""
    return df.join(F.broadcast(keys), on=key_col, how="left_anti")


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    tombstone_col: str = "is_tombstone",
) -> DataFrame:
    """K2 semantics: per key, an update row replaces the base row; an update
    with `tombstone_col` true deletes it; unmatched updates insert.

    Column sets of base and updates (minus the tombstone flag) must match.
    """
    cols = base.columns
    upd = updates
    tomb_keys = upd.filter(F.col(tombstone_col)).select(key)
    live_upd = upd.filter(~F.col(tombstone_col)).select(*cols)
    survivors = base.join(
        F.broadcast(upd.select(key)), on=key, how="left_anti"
    )  # base rows not touched by any update/tombstone
    return survivors.unionByName(live_upd).join(
        F.broadcast(tomb_keys), on=key, how="left_anti"
    )


# ------------------------------------------- right-to-be-forgotten cascade

#: deterministic forget-request set for the registered query: every 97th
#: doc. Production swaps this for the real request table (user-submitted
#: deletion keys) -- always tiny relative to the corpus, hence broadcast.
FORGET_KEY_MOD = 97


def forget_cascade(
    docs: DataFrame, emb: DataFrame, forget: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """GDPR/right-to-be-forgotten: delete one key set consistently across
    every derived surface (raw documents AND their embedding rows), so no
    orphaned derivative survives the request.

    Scale design: the forget set is broadcast (requests are thousands;
    corpora are billions), so each surface is ONE scan + broadcast
    anti-join -- zero shuffles, and surfaces purge in parallel. At 100 TB
    the same broadcast plan rewrites each partition in place (Delta
    MERGE DELETE shape)."""
    f = F.broadcast(forget.select("doc_id"))
    kept_docs = docs.join(f, on="doc_id", how="left_anti")
    kept_emb = emb.join(
        f, on=emb["vec_id"] == f["doc_id"], how="left_anti"
    )
    return kept_docs, kept_emb


def forget_audit(docs: DataFrame, emb: DataFrame, forget: DataFrame) -> DataFrame:
    """The audit record a deletion request must produce: per surface,
    rows before / removed / after. One scan per surface (broadcast mark +
    single aggregate), no shuffle."""
    f = F.broadcast(forget.select(F.col("doc_id").alias("_fk")))

    def _summary(df: DataFrame, key: str, surface: str) -> DataFrame:
        marked = df.join(f, on=df[key] == f["_fk"], how="left")
        return marked.agg(
            F.lit(surface).alias("surface"),
            F.count(F.lit(1)).alias("rows_before"),
            F.count("_fk").alias("rows_removed"),
            (F.count(F.lit(1)) - F.count("_fk")).alias("rows_after"),
        )

    return _summary(docs, "doc_id", "documents").unionByName(
        _summary(emb, "vec_id", "embeddings")
    )


FORGET_AUDIT_SQL = f"""
WITH f AS (SELECT doc_id FROM documents WHERE doc_id % {FORGET_KEY_MOD} = 0)
SELECT 'documents' AS surface,
       COUNT(*) AS rows_before,
       COUNT(f.doc_id) AS rows_removed,
       COUNT(*) - COUNT(f.doc_id) AS rows_after
FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id
UNION ALL
SELECT 'embeddings',
       COUNT(*),
       COUNT(f.doc_id),
       COUNT(*) - COUNT(f.doc_id)
FROM embeddings e LEFT JOIN f ON e.vec_id = f.doc_id
"""
