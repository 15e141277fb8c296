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
