"""Lineage helpers for iterative operators built on localCheckpoint.

`localCheckpoint` truncates lineage (without it an unrolled iteration's
plan replays every earlier round -- see dedup.dedup_cluster_keepers'
5000-exchange anecdote), but the checkpointed RDD blocks stay pinned in
executor storage until the driver's GC-driven ContextCleaner notices.
Iterative operators should free superseded rounds EAGERLY so repeated
invocations in one session (bench loops, test sessions) don't
accumulate dead blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame) -> None:
    """Eagerly drop a localCheckpoint's storage blocks (the LogicalRDD
    holds the cached RDD; unpersist is a no-op for anything else)."""
    try:
        df._jdf.logicalPlan().rdd().unpersist(False)
    except Exception:
        pass  # best effort -- ContextCleaner reclaims on GC anyway
