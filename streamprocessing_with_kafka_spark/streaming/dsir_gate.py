"""Streaming DSIR gate: score an INGEST stream of documents against a
FROZEN importance-resampling model -- the incremental twin of
operators/sampling.dsir_sample.

Production shape: the bucket LM (target-vs-raw log-likelihood ratios)
and the normalizer are statistics of the historical corpus, re-fit
offline on whatever cadence the mixture drifts; between refits they are
CONSTANTS, so they ship to executors once as a 1-row static frame
(map<bucket, decimal log-ratio> + two scalars) stream-static
cross-joined onto the arrival stream. Each arriving document is then
scored by PURE COLUMN EXPRESSIONS -- tokenize, bucket via the same md5
family, look the bucket up in the map, left-fold the decimal log-ratios
in row order -- no Python anywhere, no join of the stream, no shuffle,
no streaming state: the gate runs at scan speed inside whole-stage
codegen, which is the cheapest legal shape for a per-row decision whose
reference data is static. (The batch operator can't use this shape for
FITTING -- the LM aggregate needs the corpus -- but scoring is per-row.)

A bucket never seen at fit time falls back to the model's own unseen-
bucket log-ratio ln((Nr+B)/(Nt+B)) (both Laplace counts at zero), a
constant folded into the plan.

Convergence contract: buckets, quantization, fold arithmetic, the
keep-probability formula, and the md5 uniform are definitionally
identical to the batch operator, so scoring the corpus the model was
fit on reproduces `dsir_sample` row-for-row
(tests/test_streaming_dsir.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.functions.hashing import md5_long
from streamprocessing_with_kafka_spark.operators.sampling import (
    DSIR_BUCKETS,
    DSIR_SAMPLE_FRAC,
    DSIR_TARGET_SOURCE,
    _TWO60,
)
from streamprocessing_with_kafka_spark.sources.tables import load_table

_DEC = "decimal(38,10)"


def dsir_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen model as ONE static row:
    (lm map<bigint, decimal>, default_lr, n_raw, s, k).

    The LM is operators/sampling.dsir_bucket_lm -- the batch operator's
    own model stage, shared verbatim, so the per-bucket decimals are
    bit-identical by construction; the normalizer s and the raw-corpus
    count feed the same keep-probability formula."""
    from streamprocessing_with_kafka_spark.operators.sampling import (
        dsir_bucket_lm,
        dsir_tokens,
    )

    toks = dsir_tokens(load_table(spark, sf_dir, "documents"))
    lmf = dsir_bucket_lm(toks)  # (b, lr, nt, nr)
    default_lr = (
        F.log(F.lit(1) / (F.col("nt") + DSIR_BUCKETS).cast("double"))
        - F.log(F.lit(1) / (F.col("nr") + DSIR_BUCKETS).cast("double"))
    ).cast("decimal(28,10)")
    lm_row = lmf.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("b"), F.col("lr")))
        ).alias("lm"),
        F.first(default_lr).alias("default_lr"),
    )
    # normalizer over the raw corpus, via the batch operator's own
    # scoring aggregate (fit-time only; the stream never pays this)
    w = F.sum("lr").cast("double") / F.count(F.lit(1)).cast("double")
    scored = (
        toks.filter(~F.col("is_t"))
        .join(F.broadcast(lmf.select("b", "lr")), "b")
        .groupBy("doc_id")
        .agg(F.exp(w).cast("decimal(28,6)").alias("_imp"))
    )
    norm = scored.agg(
        F.sum("_imp").cast("double").alias("s"),
        F.floor(F.lit(DSIR_SAMPLE_FRAC) * F.count(F.lit(1)))
        .cast("double")
        .alias("k"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    return lm_row.crossJoin(F.broadcast(norm))


def streaming_dsir_gate(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Score a document stream against the frozen model frame.

    `docs` is any (streaming or batch) frame with (doc_id, source, text);
    `model` is dsir_model's 1-row frame. Target-source rows pass through
    unscored-and-dropped exactly like the batch operator. Output schema ==
    dsir_sample's."""
    toks = F.split("text", " ")
    lr_of = lambda t: F.coalesce(  # noqa: E731
        F.element_at("lm", F.pmod(md5_long(t), F.lit(DSIR_BUCKETS))),
        F.col("default_lr"),
    )
    total = F.aggregate(
        toks,
        F.lit(0).cast(_DEC),
        lambda acc, t: (acc + lr_of(t)).cast(_DEC),
    )
    w = total.cast("double") / F.size(toks).cast("double")
    imp = F.exp(F.col("_w")).cast("decimal(28,6)").cast("double")
    keep_p = F.round(F.least(F.lit(1.0), F.col("k") * imp / F.col("s")), 9)
    u = md5_long(F.concat(F.lit("dsir|"), F.col("doc_id").cast("string"))) / F.lit(
        _TWO60
    )
    return (
        docs.filter(F.col("source") != DSIR_TARGET_SOURCE)
        .crossJoin(model)
        .withColumn("_w", w)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.round("_w", 6).alias("avg_logratio"),
            keep_p.alias("keep_prob"),
            (u < keep_p).alias("is_kept"),
        )
    )
