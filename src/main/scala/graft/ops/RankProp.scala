package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point rank propagation — PageRank-style authority over an
  * undirected similarity graph (near-dup buckets, shared n-grams,
  * citation links), in EXACT integer arithmetic so the iterated scores
  * are bit-identical in any engine. The curation use: a document whose
  * neighborhood is dense duplicate mass scores high — a cluster-authority
  * signal for keeper election and mixture downweighting beyond plain
  * degree (used by SemDeDup-style pipelines as the "centrality" keeper).
  *
  * Recurrence (parts-per-million fixed point, all BIGINT):
  * {{{
  *   score₀(v)   = 1 000 000
  *   contrib(u)  = score(u) DIV deg(u)
  *   scoreₖ₊₁(v) = (10⁶ − damp) + (damp · Σ_{u∼v} contrib(u)) DIV 10⁶
  * }}}
  * with `damp = 850 000` ppm. Every step is BIGINT floor division —
  * no float anywhere, so K iterations replay exactly (the oracle unrolls
  * the same K joins). Scores stay ≤ ~10⁶·maxDeg, far inside BIGINT.
  *
  * Scale shape (100 TB): per iteration ONE shuffle keyed by the node id
  * (edges join scores on `src`, aggregate on `dst`) — the standard
  * Pregel-as-joins layout; deg and the edge list are computed once and
  * `localCheckpoint`ed (the dupComponents boundary pattern) so K
  * iterations re-read materialized partitions instead of re-deriving
  * the graph K times. Edge skew = a hot node's fan-out; the aggregate
  * is map-side combined so a 10⁶-degree hub shuffles partial sums, not
  * 10⁶ rows, and AQE handles residual reducer skew. K is a small fixed
  * constant (3–10): the driver loop adds K plan stages, not K² work.
  */
object RankProp {

  /** Propagate over undirected pair list `(aCol, bCol)` (each pair once,
    * a ≠ b); `nodes` supplies the universe (isolated nodes keep the base
    * score 150 000). Returns `(nodeCol, score)`.
    */
  def propagate(pairs: DataFrame, aCol: String, bCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int = 3,
      dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16]: $iters")
    require(dampPpm >= 0 && dampPpm <= 1000000L,
      s"dampPpm must be in [0, 1e6]: $dampPpm")
    val base = 1000000L - dampPpm

    // mirror to a directed edge list; materialize edges + degrees once —
    // every iteration re-reads these, not the upstream graph derivation
    val edges = pairs
      .select(col(aCol).as("__src"), col(bCol).as("__dst"))
      .union(pairs.select(col(bCol).as("__src"), col(aCol).as("__dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy("__src").agg(count(lit(1)).as("__d"))
      .localCheckpoint(true)
    val universe = nodes.select(col(nodeCol).as("__n")).distinct()
      .localCheckpoint(true)

    var score = universe.select(col("__n"), lit(1000000L).as("__score"))
    for (_ <- 1 to iters) {
      val inc = edges
        .join(score.withColumnRenamed("__n", "__src"), "__src")
        .join(deg, "__src")
        .select(col("__dst"), expr("__score DIV __d").as("__c"))
        .groupBy("__dst").agg(sum("__c").as("__inc"))
      score = universe
        .join(inc.withColumnRenamed("__dst", "__n"), Seq("__n"), "left")
        .select(col("__n"),
          (lit(base) + expr(s"($dampPpm * coalesce(__inc, 0L)) DIV 1000000"))
            .as("__score"))
    }
    score.select(col("__n").as(nodeCol), col("__score").as("score"))
  }

  /** DuckDB twin: unrolled K-iteration replay over the same pair list.
    * `pairsInner` must SELECT columns `a, b` (each undirected pair once).
    */
  def propagateSql(pairsInner: String, nodesInner: String,
      nodeE: String, iters: Int = 3, dampPpm: Long = 850000L): String = {
    val base = 1000000L - dampPpm
    val head =
      s"""WITH __p AS MATERIALIZED ($pairsInner),
         |__e AS (SELECT a AS src, b AS dst FROM __p
         |        UNION ALL SELECT b, a FROM __p),
         |__deg AS (SELECT src, count(*) AS d FROM __e GROUP BY src),
         |__n AS (SELECT DISTINCT $nodeE AS n FROM ($nodesInner)),
         |__s0 AS (SELECT n, CAST(1000000 AS BIGINT) AS score FROM __n)"""
        .stripMargin
    val iterCtes = (1 to iters).map { k =>
      s"""__i$k AS (SELECT e.dst AS n,
         |    CAST(sum(s.score // g.d) AS BIGINT) AS inc
         |  FROM __e e JOIN __s${k - 1} s ON e.src = s.n
         |    JOIN __deg g ON e.src = g.src
         |  GROUP BY e.dst),
         |__s$k AS (SELECT __n.n,
         |    CAST($base + ($dampPpm * coalesce(i.inc, 0)) // 1000000
         |      AS BIGINT) AS score
         |  FROM __n LEFT JOIN __i$k i USING (n))""".stripMargin
    }
    (head +: iterCtes).mkString(",\n") +
      s"\nSELECT n AS $nodeE, score FROM __s$iters"
  }
}
