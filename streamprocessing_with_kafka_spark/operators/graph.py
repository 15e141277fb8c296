"""Graph analytics over the user co-occurrence graph derived from
`events` -- triangle counting and local clustering coefficients, the
standard "how cliquish is this interaction graph" primitives
(reference has no graph surface at all; SURVEY.md §2.6).

Graph construction: an undirected edge (u, v) exists iff the two users
both produced at least one event of the same type in the same hour.
Everything downstream is ordered-edge equi-joins -- the classic
SQL-native triangle enumeration: store each edge once as (u < v) and
count closed ordered triples (a<b<c) by joining the edge list against
itself twice on equality keys only. No theta joins, no adjacency
matrices on the driver.

Scale: the co-occurrence pair explosion is quadratic in the
per-(type, hour) cell size -- the same hot-block hazard as the shingle
blocks in `dedup.ngram_jaccard_pairs`, controlled the same way (cap or
sub-bucket hot cells; the registered query runs uncapped for oracle
exactness). The triangle join's cost is the wedge count, so edges are
ORIENTED from the (degree, id)-smaller endpoint to the larger one
before the two equi-joins (compact-forward, Latapy 2008): every
triangle survives as exactly one directed path a->b->c closed by a->c,
and the wedge stream is bounded by sum(outdeg^2) <= O(m^1.5) REGARDLESS
of max degree -- on a skewed graph the previous id-ordered edge list
degenerates to deg_max * m wedges through any hub. (On the synthetic
sf corpus degrees are near-uniform per cell, so id-order was already
near-optimal: 277.8M -> 277.2M wedges at sf0.1 -- the orientation is
worst-case insurance, not a win on this data.) The plan shape (two
equi-joins) is unchanged, so the sf plan IS the 100 TB plan. What DID
move at sf0.1 is the wedge exchange: the oriented edge list is slim
enough that AQE's runtime broadcast conversion (session.py threshold
note) builds both join sides as 6 MB hash tables and streams the
wedges through them -- 1.88 GB of shuffled+sorted wedge rows dropped
to zero, wall 72 s -> 35 s. Past broadcastable edge lists, the shuffle
moves oriented-wedge rows -- the textbook MapReduce triangle-count
cost, minimized by the orientation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamprocessing_with_kafka_spark.functions.lineage import free_local_checkpoint
from streamprocessing_with_kafka_spark.functions.numeric import dec_sum, round_sql
from streamprocessing_with_kafka_spark.sources.tables import _parquet_layout, load_table


def cooccurrence_edges(ev: DataFrame) -> DataFrame:
    """Distinct ordered edges (u < v): users sharing a (type, hour) cell.

    The distinct on (user, type, hour) BEFORE the self-join keeps the
    pair blowup bounded by cell cardinality in users, not in raw events.
    """
    occ = ev.select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    ).dropDuplicates(["user_id", "event_type", "h"])
    a = occ.select(F.col("user_id").alias("u"), "event_type", "h")
    b = occ.select(F.col("user_id").alias("v"), "event_type", "h")
    return (
        a.join(b, ["event_type", "h"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .dropDuplicates(["u", "v"])
    )


def triangle_clustering(
    spark: SparkSession, sf_dir: str, *, checkpoint: bool = True
) -> DataFrame:
    """Per-user triangle count, degree, and local clustering coefficient.

    Triangles enumerate once each via two equi-joins over the DEGREE-
    ORIENTED edge list (each undirected edge directed from its
    (degree, id)-smaller endpoint -- a strict total order, so a triangle
    whose corners sort a<b<c in it carries exactly the directed edges
    a->b, b->c, a->c and is found exactly once as the a->b->c path
    closed by a->c); each triangle then credits its three corners
    through one explode. Degree is a per-endpoint count over the
    undirected edge list, computed FIRST and reused for the orientation.
    The final frame is user-sized -- joins after the corpus scan touch
    only vocabulary-scale data, and the wedge stream between the two
    joins is bounded by sum(outdeg^2) <= O(|E|^1.5).
    `lcc = 2*tri / (deg*(deg-1))` in fixed-order double, 6dp.
    """
    ev = load_table(spark, sf_dir, "events")
    e = cooccurrence_edges(ev)
    # the edge list feeds FIVE consumers (degree + orientation + three
    # triangle-join roles); without truncation each re-runs the occ
    # self-join and distincts (a 17-shuffle plan). Vocabulary-sized:
    # cheap to materialize. checkpoint=False keeps lineage for plan pins.
    if checkpoint:
        e = e.localCheckpoint()
    degree = (
        e.select(F.explode(F.array("u", "v")).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    if checkpoint:
        degree = degree.localCheckpoint()
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    d = (
        e.join(degree.select(F.col("user_id").alias("u"), F.col("degree").alias("du")), "u")
        .join(degree.select(F.col("user_id").alias("v"), F.col("degree").alias("dv")), "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    if checkpoint:
        d = d.localCheckpoint()
    # The wedge join's OUTPUT is quadratic in its input (sum(outdeg^2)
    # rows from |E| rows), but AQE sizes post-shuffle partitions by the
    # INPUT bytes it can see -- on a vocabulary-sized edge list it
    # coalesces the join down to a handful of partitions and the entire
    # wedge enumeration (plus the closing broadcast probe fused into the
    # same stage) runs on those few cores (r12 stage profile: 216 CPU-s
    # through 5 tasks, 61 s wall). Pin the join's partitioning with an
    # explicit repartition-by-number on the shared wedge key, which AQE
    # honors (REPARTITION_BY_NUM), so the fan-out uses every core; the
    # two sides share one exchange signature and the number tracks
    # defaultParallelism, not a constant.
    p = spark.sparkContext.defaultParallelism
    ab = d.select(F.col("s").alias("a"), F.col("t").alias("b")).repartition(p, "b")
    bc = d.select(F.col("s").alias("b"), F.col("t").alias("c")).repartition(p, "b")
    tri = ab.join(bc, "b").join(
        d.select(F.col("s").alias("a"), F.col("t").alias("c")), ["a", "c"]
    )
    tri_per_user = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0
            * F.coalesce("n_triangles", F.lit(0)).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        degree.join(tri_per_user, "user_id", "left")
        .select(
            "user_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            lcc.alias("clustering_coeff"),
        )
    )


_LCC_SQL = round_sql(
    "2.0 * COALESCE(t.n_triangles, 0) / CAST(d.degree * (d.degree - 1) AS DOUBLE)", 6
)

TRIANGLE_CLUSTERING_SQL = f"""
WITH occ AS (
  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
  FROM events
),
e AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM occ a JOIN occ b
    ON a.event_type = b.event_type AND a.h = b.h
  WHERE a.user_id < b.user_id
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
tpu AS (
  SELECT user_id, COUNT(*) AS n_triangles FROM (
    SELECT a AS user_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY user_id
),
deg AS (
  SELECT user_id, COUNT(*) AS degree FROM (
    SELECT u AS user_id FROM e UNION ALL SELECT v FROM e
  ) GROUP BY user_id
)
SELECT d.user_id, d.degree, COALESCE(t.n_triangles, 0) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN {_LCC_SQL} ELSE 0.0 END AS clustering_coeff
FROM deg d LEFT JOIN tpu t USING (user_id)
"""


PAGERANK_ITERS = 3  # fixed unrolled rounds (the de-recursion pattern)
PAGERANK_DAMPING = 0.85

# Below this many event rows the per-round frames are tiny enough that AQE
# coalesces every ENSURE_REQUIREMENTS exchange to a handful of partitions;
# there the width pin (repartition on the group key BEFORE the aggregate,
# reused by the groupBy) beats map-side combine, whose savings are
# negligible at that volume (A/B at sf0.1: pin 5.1 s vs combine-first
# ~11-14 s, r13 probes).  At or above it, the aggregate owns its exchange
# so the |E|-row contrib shuffle carries map-side-combined partials
# (|V|-bounded per map task -- the dominant term at lake scale), and AQE
# keeps width naturally because the frames exceed its advisory size.
PAGERANK_COMBINE_MIN_EVENT_ROWS = 10_000_000


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected co-occurrence graph, PAGERANK_ITERS
    synchronous rounds from the uniform start -- the canonical
    iterative-graph-at-scale operator, de-recursed the `kmeans_train`
    way: fixed unrolled iterations, 6dp-rounded scores per round so
    both engines iterate on bit-identical state, `localCheckpoint` on
    the node-sized rank frame between rounds so round r's plan doesn't
    replay rounds 1..r-1.

    Per round: ranks equi-join the directed edge list on the source
    (ranks are |nodes| rows against |2E| edges -- at 100 TB this is the
    classic Pregel-style shuffle on src, then a map-side-combinable sum
    on dst), add the (1-d)/N teleport with N as an in-plan 1-row
    broadcast, never a driver collect.  Undirected graph = each edge in
    both directions; every node has degree >= 1 here (edges come from
    co-occurrence), so there is no dangling-mass term -- documented
    rather than silently wrong: a directed deployment must redistribute
    sink mass.

    Output: (user_id, pagerank, degree).  Scores sum to ~1 (fuzzed in
    test_graph.py); uniform-degree graphs stay uniform."""
    ev = load_table(spark, sf_dir, "events")
    e = cooccurrence_edges(ev)
    directed = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint()
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    n_row = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.join(F.broadcast(n_row)).select(
        "src", "degree", F.round(1.0 / F.col("n"), 6).alias("pr")
    )
    prev = None
    p = spark.sparkContext.defaultParallelism
    # Scale-adaptive strategy for the per-round mass aggregate: see
    # PAGERANK_COMBINE_MIN_EVENT_ROWS.  Cheap driver-side footer read;
    # no data action.
    ev_rows, _ = _parquet_layout(f"{sf_dir}/events.parquet")
    combine = ev_rows >= PAGERANK_COMBINE_MIN_EVENT_ROWS
    for _ in range(PAGERANK_ITERS):
        ranks = _pagerank_round(directed, deg, n_row, ranks, p, combine).localCheckpoint()
        if prev is not None:
            free_local_checkpoint(prev)  # superseded round's blocks
        prev = ranks
    # the final ranks checkpoint is materialized; the edge list's blocks
    # are no longer reachable from the returned plan
    free_local_checkpoint(directed)
    return ranks.select(F.col("src").alias("user_id"), F.col("pr").alias("pagerank"), "degree")


def _pagerank_round(
    directed: DataFrame,
    deg: DataFrame,
    n_row: DataFrame,
    ranks: DataFrame,
    p: int,
    combine: bool,
) -> DataFrame:
    """One synchronous PageRank round (pre-checkpoint), factored out so
    tests and plan dumps can inspect both aggregate strategies.

    combine=True (lake scale): the mass aggregate owns its exchange, so
    the |E|-row contrib shuffle carries map-side-combined partial sums
    (|V|-bounded per map task -- the dominant term at volume); AQE keeps
    the post-shuffle stages wide because the frames exceed its advisory
    size.  combine=False (test scale): pin width on the group key BEFORE
    the aggregate (the groupBy reuses the exchange -- exchange count
    unchanged); forfeits map-side combine, negligible at that volume,
    and keeps every per-round stage wide where AQE would coalesce the
    few-hundred-KB frames to ONE partition (one 3.9 s task in a 10.5 s
    query, r12 stage profile; combine-first A/B'd ~2x slower at sf0.1,
    r13 probes)."""
    d = PAGERANK_DAMPING
    contrib = directed.join(ranks, "src").select(
        "dst", (F.col("pr") / F.col("degree")).alias("w")
    )
    if not combine:
        contrib = contrib.repartition(p, "dst")
    contrib = contrib.groupBy("dst").agg(dec_sum("w").alias("mass"))
    return (
        deg.join(contrib, deg.src == contrib.dst)
        .join(F.broadcast(n_row))
        .select(
            "src",
            "degree",
            F.round((1.0 - d) / F.col("n") + d * F.col("mass"), 6).alias("pr"),
        )
    )


def _pagerank_iter_sql(i: int, prev: str) -> str:
    mass = (
        "CAST(CAST(SUM(CAST(r.pr / r.degree AS DECIMAL(28,10))) AS VARCHAR)"
        " AS DOUBLE)"
    )
    pr = round_sql(
        f"(1.0 - {PAGERANK_DAMPING!r}) / n.n + {PAGERANK_DAMPING!r} * c{i}.mass", 6
    )
    return f"""
c{i} AS (
  SELECT e.dst, {mass} AS mass
  FROM directed e JOIN {prev} r ON e.src = r.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT deg.src, deg.degree, {pr} AS pr
  FROM deg JOIN c{i} ON deg.src = c{i}.dst CROSS JOIN n_row n
)"""


PAGERANK_SQL = (
    f"""
WITH occ AS (
  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
  FROM events
),
e AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM occ a JOIN occ b
    ON a.event_type = b.event_type AND a.h = b.h
  WHERE a.user_id < b.user_id
),
directed AS (
  SELECT u AS src, v AS dst FROM e
  UNION ALL SELECT v AS src, u AS dst FROM e
),
deg AS (SELECT src, COUNT(*) AS degree FROM directed GROUP BY src),
n_row AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (
  SELECT deg.src, deg.degree, {round_sql('1.0 / n.n', 6)} AS pr
  FROM deg CROSS JOIN n_row n
),"""
    + ",".join(_pagerank_iter_sql(i + 1, f"r{i}") for i in range(PAGERANK_ITERS))
    + f"""
SELECT src AS user_id, pr AS pagerank, degree FROM r{PAGERANK_ITERS}
"""
)
