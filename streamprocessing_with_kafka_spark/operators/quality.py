"""Data-quality constraint auditing and fuzzy entity matching -- the
Deequ-shaped verification layer a 100 TB curation pipeline runs as a
gate before training data ships.

The reference validates records one at a time inside its consumer loop
(`/root/reference/src/app/order_validator.py:152-230`: required-field /
numeric / non-negativity checks per message); this module is the
SET-LEVEL complement: constraints that are only decidable over the
whole table (uniqueness, referential containment, distribution bounds)
plus a similarity join no per-record validator can express.

Scale design:

- `quality_report`: every single-table constraint on a table computes
  in ONE map-side-combinable aggregate over ONE scan (conditional
  counts + one countDistinct); the referential-containment check is the
  only join and it joins the FK projection against the PK projection
  (32-byte keys shuffle, never rows).  The per-table 1-row aggregates
  union into the report frame -- |constraints| rows total, so
  everything after the scans is driver-trivial but stays in-plan.
- `fuzzy_name_pairs`: edit-distance<=1 similarity self-join WITHOUT the
  O(N^2) cross join: FastSS deletion-neighborhood blocking (Bocek et
  al. 2007, "Fast Similarity Search in Large Dictionaries") -- each
  name emits its <=L single-deletion variants plus itself; two strings
  within edit distance 1 MUST share a variant, so an equi-join on the
  variant finds every candidate pair (recall exactly 1), and a cheap
  levenshtein verify removes false candidates.  The blowup is bounded
  by string length (x19 here), vs xN for the naive join.  The DuckDB
  oracle runs the brute-force quadratic join, so the driver's parity
  check IS the recall-1 proof at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.functions.numeric import round_sql
from streamprocessing_with_kafka_spark.sources.tables import load_table

# -------------------------------------------------- constraint report

DOC_MIN_CHARS = 100  # curation gate: docs shorter than this are flagged
ORDER_PRICE_MIN = 0.0
ORDER_PRICE_MAX = 600_000.0


def _ratio(num, den):
    # exact-int division; IEEE double division is bit-identical across
    # engines, and 6dp rounding makes the rendered repr match too.
    # try_divide: on an EMPTY audited table n = 0 and ANSI `/` would
    # abort the whole audit job; NULL metric (= oracle's x/0) is the
    # honest answer for "ratio over nothing".
    return F.round(F.try_divide(num.cast("double"), den.cast("double")), 6)


def _audit_row(table, constraint, metric, threshold):
    return F.struct(
        F.lit(table).alias("table_name"),
        F.lit(constraint).alias("check_name"),
        metric.alias("metric"),
        (metric >= threshold).alias("passed"),
    )


def orders_audit_frame(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The five orders-side constraint rows over an arbitrary orders
    frame -- shared verbatim by the batch report and the per-batch
    streaming audit (streaming/quality.py), so the two can never
    drift apart."""
    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("custkey_nn"),
        F.countDistinct("o_orderkey").alias("pk_distinct"),
        F.count(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("status_in_domain"),
        F.count(
            F.when(
                (F.col("o_totalprice") > ORDER_PRICE_MIN)
                & (F.col("o_totalprice") <= ORDER_PRICE_MAX),
                1,
            )
        ).alias("price_in_bounds"),
    )
    # FK containment: join key projections only -- at 100 TB this is a
    # keys-vs-keys shuffle (or a runtime bloom semi-join); rows never move
    fk = (
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("fk_matched"))
    )
    return o.crossJoin(F.broadcast(fk)).select(
        F.explode(
            F.array(
                _audit_row("orders", "completeness_o_custkey",
                           _ratio(F.col("custkey_nn"), F.col("n")), F.lit(1.0)),
                _audit_row("orders", "unique_o_orderkey",
                           _ratio(F.col("pk_distinct"), F.col("n")), F.lit(1.0)),
                _audit_row("orders", "domain_o_orderstatus",
                           _ratio(F.col("status_in_domain"), F.col("n")), F.lit(1.0)),
                _audit_row("orders", "bounds_o_totalprice",
                           _ratio(F.col("price_in_bounds"), F.col("n")), F.lit(1.0)),
                _audit_row("orders", "fk_o_custkey_in_customer",
                           _ratio(F.col("fk_matched"), F.col("n")), F.lit(1.0)),
            )
        ).alias("r")
    ).select("r.*")


def documents_audit_frame(docs: DataFrame) -> DataFrame:
    """The three documents-side constraint rows."""
    d = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("pk_distinct"),
        F.count(
            F.when(F.col("n_chars") == F.length("text"), 1)
        ).alias("len_consistent"),
        F.count(
            F.when(F.length("text") >= DOC_MIN_CHARS, 1)
        ).alias("len_ok"),
    )
    return d.select(
        F.explode(
            F.array(
                _audit_row("documents", "unique_doc_id",
                           _ratio(F.col("pk_distinct"), F.col("n")), F.lit(1.0)),
                _audit_row("documents", "consistent_n_chars",
                           _ratio(F.col("len_consistent"), F.col("n")), F.lit(1.0)),
                _audit_row("documents", "min_length_gate",
                           _ratio(F.col("len_ok"), F.col("n")), F.lit(0.5)),
            )
        ).alias("r")
    ).select("r.*")


def quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per constraint: (table_name, check_name, metric, passed).

    metric is the satisfaction ratio in [0, 1]; passed = metric meets
    the constraint's threshold (1.0 for hard constraints, the
    documented gate for soft ones).  Orders constraints: completeness,
    PK uniqueness, status-domain membership, price bounds, FK
    containment in customer.  Documents constraints: PK uniqueness,
    n_chars/text consistency, min-length curation gate.

    NULL-passed contract (consumer boundary): over an EMPTY audited
    slice the ratios are 0/0, try_divide yields NULL metric and
    therefore NULL passed -- deliberately neither pass nor fail.  A
    release gate consuming this frame MUST gate on `passed IS TRUE`
    (fail-closed); filtering `passed == false` would silently treat an
    empty audited slice as passing."""
    return orders_audit_frame(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    ).unionByName(
        documents_audit_frame(load_table(spark, sf_dir, "documents"))
    )


QUALITY_REPORT_SQL = f"""
WITH o AS (
  SELECT COUNT(*) AS n,
         COUNT(o_custkey) AS custkey_nn,
         COUNT(DISTINCT o_orderkey) AS pk_distinct,
         COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END)
           AS status_in_domain,
         COUNT(CASE WHEN o_totalprice > {ORDER_PRICE_MIN!r}
                     AND o_totalprice <= {ORDER_PRICE_MAX!r} THEN 1 END)
           AS price_in_bounds
  FROM orders
), fk AS (
  SELECT COUNT(*) AS fk_matched FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM customer)
), d AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT doc_id) AS pk_distinct,
         COUNT(CASE WHEN n_chars = LENGTH(text) THEN 1 END)
           AS len_consistent,
         COUNT(CASE WHEN LENGTH(text) >= {DOC_MIN_CHARS} THEN 1 END)
           AS len_ok
  FROM documents
), metrics AS (
  SELECT 'orders' AS table_name, 'completeness_o_custkey' AS check_name,
         {round_sql("custkey_nn::DOUBLE / n::DOUBLE", 6)} AS metric, 1.0 AS threshold
  FROM o
  UNION ALL SELECT 'orders', 'unique_o_orderkey',
         {round_sql("pk_distinct::DOUBLE / n::DOUBLE", 6)}, 1.0 FROM o
  UNION ALL SELECT 'orders', 'domain_o_orderstatus',
         {round_sql("status_in_domain::DOUBLE / n::DOUBLE", 6)}, 1.0 FROM o
  UNION ALL SELECT 'orders', 'bounds_o_totalprice',
         {round_sql("price_in_bounds::DOUBLE / n::DOUBLE", 6)}, 1.0 FROM o
  UNION ALL SELECT 'orders', 'fk_o_custkey_in_customer',
         {round_sql("fk.fk_matched::DOUBLE / o.n::DOUBLE", 6)}, 1.0 FROM o, fk
  UNION ALL SELECT 'documents', 'unique_doc_id',
         {round_sql("pk_distinct::DOUBLE / n::DOUBLE", 6)}, 1.0 FROM d
  UNION ALL SELECT 'documents', 'consistent_n_chars',
         {round_sql("len_consistent::DOUBLE / n::DOUBLE", 6)}, 1.0 FROM d
  UNION ALL SELECT 'documents', 'min_length_gate',
         {round_sql("len_ok::DOUBLE / n::DOUBLE", 6)}, 0.5 FROM d
)
SELECT table_name, check_name, metric, metric >= threshold AS passed
FROM metrics
"""


# ----------------------------------------- fuzzy similarity self-join

FUZZY_MAX_DIST = 1  # FastSS deletion-neighborhood depth (see module doc)


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every unordered customer pair whose names are within edit
    distance FUZZY_MAX_DIST, found by deletion-neighborhood blocking +
    equi-join + levenshtein verify (never a cross join).

    Variant 0 is the string itself; variant i the string with character
    i removed -- all generated in-plan (sequence + transform, no
    Python).  Two strings within edit distance 1 necessarily share a
    variant (substitution: same-position deletions collide; indel: one
    side's self equals the other's deletion), so the variant equi-join
    has recall exactly 1 and the levenshtein verify only ever REMOVES
    false candidates.  Output: (custkey_a, custkey_b, name_a, name_b,
    dist) with custkey_a < custkey_b."""
    # rebalance=True: each name explodes into |name|+1 deletion variants
    # that immediately pay a self-join shuffle write -- heavy per-row
    # work that an under-split customer file would otherwise run on ONE
    # core (r12 stage profile: a single 3.8 s task; the loader's row
    # threshold never fires for a dimension table).
    cust = load_table(spark, sf_dir, "customer", rebalance=True).select(
        "c_custkey", "c_name"
    )
    name = F.col("c_name")
    variants = cust.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array_union(
                F.array(name),
                F.transform(
                    F.sequence(F.lit(1), F.length(name)),
                    lambda i: F.concat(
                        name.substr(F.lit(1), i - F.lit(1)),
                        name.substr(i + F.lit(1), F.length(name) - i),
                    ),
                ),
            )
        ).alias("variant"),
    )
    a = variants.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        "variant",
    )
    b = variants.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        "variant",
    )
    candidates = (
        a.join(b, "variant")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .select("custkey_a", "custkey_b", "name_a", "name_b")
        .distinct()  # a pair can share several variants
    )
    return candidates.select(
        "custkey_a",
        "custkey_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= FUZZY_MAX_DIST)


FUZZY_NAME_PAIRS_SQL = f"""
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       a.c_name AS name_a, b.c_name AS name_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
"""


# --------------------------------------------- k-anonymity audit

K_ANONYMITY = 10  # classes smaller than this are re-identification risks


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (c_nationkey, c_mktsegment): one row per equivalence class with its
    size, whether it violates k >= K_ANONYMITY, and the class's
    re-identification risk (1/size, the probability of pinning an
    individual given the quasi-identifiers) -- the privacy gate a
    training-data release runs after PII scrubbing (`text_pii_scrub`
    removes direct identifiers; this measures the INDIRECT ones).

    Scale: one map-side-combinable groupBy on a bounded key domain
    (|nations| x |segments|); nothing else touches the corpus."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            (F.col("class_size") < K_ANONYMITY).alias("at_risk"),
            F.round(
                F.lit(1.0) / F.col("class_size").cast("double"), 6
            ).alias("reident_risk"),
        )
    )


K_ANONYMITY_SQL = f"""
SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
       COUNT(*) < {K_ANONYMITY} AS at_risk,
       {round_sql("1.0 / CAST(COUNT(*) AS DOUBLE)", 6)} AS reident_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


# --------------------------------------------- l-diversity audit

L_DIVERSITY = 3  # classes need >= this many distinct sensitive values


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007): k-anonymity's
    successor -- a quasi-identifier class can be large (k-anonymous) yet
    still leak if everyone in it shares the SAME sensitive value.  Per
    (c_nationkey, c_mktsegment) class, against the sensitive attribute
    o_orderpriority of the class members' orders: distinct-l (number of
    distinct sensitive values), entropy-l (exp of the Shannon entropy of
    the sensitive distribution -- the EFFECTIVE number of values,
    punishing 99/1 skew that distinct-l ignores), and the homogeneity-
    attack flag distinct_l < {L_DIVERSITY}.

    Scale: orders co-shuffles onto its customer on custkey (the corpus'
    one row-level shuffle), then a two-level map-side-combinable
    aggregate on the bounded (nation x segment x priority) domain --
    everything past the join moves <= |nations|x|segments|x5 rows.
    Entropy terms quantize to DECIMAL(28,10) before summing (the
    `bigram_logprob` pattern), so the double sum is partition-order
    independent and engine-exact."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # window-free entropy over counts: H = ln(n) - sum(c*ln c)/n
    agg = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").alias("class_orders"),
        F.count(F.lit(1)).alias("distinct_l"),
        F.sum(
            (F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            .cast("decimal(28,10)")
        ).cast("double").alias("sum_clnc"),
    )
    entropy = (
        F.log(F.col("class_orders").cast("double"))
        - F.col("sum_clnc") / F.col("class_orders").cast("double")
    )
    return agg.select(
        "c_nationkey",
        "c_mktsegment",
        "class_orders",
        "distinct_l",
        (F.col("distinct_l") < L_DIVERSITY).alias("homogeneity_risk"),
        F.round(F.exp(entropy), 6).alias("entropy_l"),
    )


L_DIVERSITY_SQL = f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, o_orderpriority, COUNT(*) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2, 3
),
agg AS (
  SELECT c_nationkey, c_mktsegment,
         SUM(c) AS class_orders,
         COUNT(*) AS distinct_l,
         CAST(CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                            AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
           AS sum_clnc
  FROM cells GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment,
       CAST(class_orders AS BIGINT) AS class_orders, distinct_l,
       distinct_l < {L_DIVERSITY} AS homogeneity_risk,
       {round_sql(
           "exp(ln(CAST(class_orders AS DOUBLE))"
           " - sum_clnc / CAST(class_orders AS DOUBLE))", 6)} AS entropy_l
FROM agg
"""


# --------------------------------------------- Benford first-digit audit

#: expected first-significant-digit shares log10(1 + 1/d) (Benford 1938);
#: Python float repr literals parse bit-identically in both engines
import math as _math

BENFORD_SHARES = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs Benford's
    law -- the classic fabricated-numbers screen an ingest audit runs on
    monetary columns.

    The first digit is extracted with INTEGER arithmetic only (floor ->
    digit-count via string length -> one power-of-ten divide): no
    log10() on the data path, whose last-bit rounding differs across
    libm implementations and would make the bucketing itself
    nondeterministic.  One map-side-combinable aggregate on a 9-value
    key; the total re-attaches via a window over the 9-row frame.

    Output per digit: observed count/share, Benford share, absolute
    deviation.  Flag wiring (e.g. MAD > 0.015 fences) is a consumer
    concern; this emits the evidence."""
    orders = load_table(spark, sf_dir, "orders")
    ip = F.floor(F.col("o_totalprice")).cast("long")
    magnitude = F.length(ip.cast("string")) - F.lit(1)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), magnitude.cast("double"))
    ).cast("int")
    per_digit = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W

    total = F.sum("n").over(W.partitionBy())
    obs = F.round(F.col("n").cast("double") / total.cast("double"), 6)
    benford = F.element_at(
        F.array(*[F.lit(BENFORD_SHARES[d]) for d in range(1, 10)]),
        F.col("digit"),
    )
    return per_digit.select(
        "digit",
        "n",
        obs.alias("obs_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(F.abs(obs - F.round(benford, 6)), 6).alias("abs_dev"),
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {BENFORD_SHARES[d]!r}" for d in range(1, 10)
)

BENFORD_AUDIT_SQL = f"""
WITH per_digit AS (
  SELECT CAST(FLOOR(o_totalprice / POWER(10.0,
           CAST(LENGTH(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR))
                - 1 AS DOUBLE))) AS INT) AS digit,
         COUNT(*) AS n
  FROM orders WHERE o_totalprice >= 1
  GROUP BY 1
)
SELECT digit, n,
       {round_sql("n::DOUBLE / (SUM(n) OVER ())::DOUBLE", 6)} AS obs_share,
       {round_sql("CASE digit " + _BENFORD_CASE + " END", 6)} AS benford_share,
       {round_sql(
           "ABS(" + round_sql("n::DOUBLE / (SUM(n) OVER ())::DOUBLE", 6)
           + " - " + round_sql("CASE digit " + _BENFORD_CASE + " END", 6) + ")", 6)}
         AS abs_dev
FROM per_digit
"""


# ------------------------------------------ release gate (composition)

BENFORD_MAD_MAX = 0.015  # Nigrini's nonconformity line for first digits


def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release gate: one uniform (audit, check_name, metric,
    passed) row per check across the three quality planes -- set-level
    constraints, Benford fraud screen (summarized to its MAD
    statistic), and the k-anonymity privacy audit (summarized to the
    at-risk-class share).  Composes the already-audited constituent
    plans; each summary aggregates a bounded frame (9 digits /
    |QI classes|), so the gate adds no corpus work beyond its parts.

    On the synthetic tables the Benford row FAILS by design -- uniform
    synthetic prices are exactly what the screen exists to flag.

    NULL-passed contract: an EMPTY audited slice yields NULL metric AND
    NULL passed (try_divide's 0/0), deliberately neither pass nor fail.
    Consumers MUST gate fail-closed on `passed IS TRUE`; a filter on
    `passed == false` would let an empty slice through as passing."""
    from streamprocessing_with_kafka_spark.functions.numeric import dec_sum

    constraints = quality_report(spark, sf_dir).select(
        F.lit("constraints").alias("audit"), "check_name", "metric", "passed"
    )
    # try_divide on both summary ratios: an empty audited slice must
    # yield NULL metric/passed rows (= the oracle's x/0), not an ANSI
    # divide-by-zero that kills the release gate
    mad = F.round(
        F.try_divide(dec_sum("abs_dev"), F.count(F.lit(1)).cast("double")), 6
    )
    benford = benford_audit(spark, sf_dir).agg(
        F.lit("benford").alias("audit"),
        F.lit("benford_mad").alias("check_name"),
        mad.alias("metric"),
        (mad <= BENFORD_MAD_MAX).alias("passed"),
    )
    share = F.round(
        F.try_divide(
            F.count(F.when(F.col("at_risk"), 1)).cast("double"),
            F.count(F.lit(1)).cast("double"),
        ),
        6,
    )
    kanon = k_anonymity_audit(spark, sf_dir).agg(
        F.lit("privacy").alias("audit"),
        F.lit("k_anon_at_risk_share").alias("check_name"),
        share.alias("metric"),
        (share == 0.0).alias("passed"),
    )
    return constraints.unionByName(benford).unionByName(kanon)


def _quality_gate_sql() -> str:
    from streamprocessing_with_kafka_spark.functions.numeric import dec_sum_sql

    return f"""
WITH qr AS ({QUALITY_REPORT_SQL}),
bf AS ({BENFORD_AUDIT_SQL}),
ka AS ({K_ANONYMITY_SQL})
SELECT 'constraints' AS audit, check_name, metric, passed FROM qr
UNION ALL
SELECT 'benford', 'benford_mad',
       {round_sql(dec_sum_sql("abs_dev") + " / COUNT(*)::DOUBLE", 6)},
       {round_sql(dec_sum_sql("abs_dev") + " / COUNT(*)::DOUBLE", 6)}
         <= {BENFORD_MAD_MAX!r}
FROM bf
UNION ALL
SELECT 'privacy', 'k_anon_at_risk_share',
       {round_sql("COUNT(CASE WHEN at_risk THEN 1 END)::DOUBLE / COUNT(*)::DOUBLE", 6)},
       {round_sql("COUNT(CASE WHEN at_risk THEN 1 END)::DOUBLE / COUNT(*)::DOUBLE", 6)}
         = 0.0
FROM ka
"""


QUALITY_GATE_SQL = _quality_gate_sql()
