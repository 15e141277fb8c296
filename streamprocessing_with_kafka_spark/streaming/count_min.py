"""Streaming count-min sketch maintenance: the additive-counter
property that makes CM sketches mergeable also makes them trivially
INCREMENTAL -- each arriving token adds 1 to CM_DEPTH cells, so the
sketch is a native streaming aggregation with state bounded by
construction at CM_DEPTH x CM_WIDTH rows (4096 cells here), no matter
how unbounded the vocabulary or the stream.

Contrast with `streaming/heavy_hitters.py` (SpaceSaving): that twin
bounds state by EVICTING, trading accuracy; the CM twin never evicts
-- the bound is structural -- and pays with collision overcounts
instead.  Together they cover both classic bounded-state frequency
designs.

The cell hash is the SAME Carter-Wegman md5 family as the batch
operator (`operators/sketches.count_min_estimates`), evaluated as pure
column expressions on the stream -- so after any prefix of batches the
maintained cells equal the batch sketch built over the same rows
exactly (pinned in tests/test_streaming_cm.py), and estimates served
from the live cells match batch estimates served from a rebuild."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamprocessing_with_kafka_spark.operators.sketches import (
    CM_DEPTH,
    CM_WIDTH,
    cm_cell_structs,
)


def token_cells(tokens: DataFrame) -> DataFrame:
    """(d, idx) cell rows for a (term) frame -- one row per depth per
    token occurrence, via the batch builder's OWN cell-addressing
    definition (`sketches.cm_cell_structs`): one expression, every
    consumer."""
    return tokens.select(
        F.explode(cm_cell_structs(F.col("term"))).alias("cell")
    ).select("cell.d", "cell.idx")


def streaming_cm_cells(doc_stream: DataFrame) -> DataFrame:
    """Continuously maintained sketch cells over a streaming
    (doc_id, text) frame: groupBy (d, idx) running counts -- state is
    structurally <= CM_DEPTH x CM_WIDTH rows.  Use outputMode
    'update'/'complete' (counters revise; they are never append-final
    while the stream lives)."""
    tokens = doc_stream.select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return (
        token_cells(tokens)
        .groupBy("d", "idx")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def estimate_from_cells(cells: DataFrame, probes: DataFrame) -> DataFrame:
    """(term, cm_estimate) for a (term) probe frame against any cells
    frame (live streaming snapshot or batch rebuild): min over the
    probed depth cells -- the serving-side half of the sketch."""
    probe_cells = probes.select("term").distinct()
    keyed = probe_cells.select(
        "term", F.explode(cm_cell_structs(F.col("term"))).alias("cell")
    ).select("term", "cell.d", "cell.idx")
    return (
        keyed.join(cells, ["d", "idx"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cm_estimate")
        )
    )
