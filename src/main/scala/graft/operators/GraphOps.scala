package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed graph analytics over relational edges — the iterative
  * family (alongside DedupOps.connectedComponents) a curation pipeline
  * uses for influence/centrality weighting.
  *
  * PageRank determinism: floating-point PageRank is NOT reproducible
  * across engines (per-node in-contribution sums are partial-order
  * dependent), so ranks run in FIXED-POINT integer arithmetic — scaled
  * longs with truncating division (`div` in Spark, `//` in DuckDB —
  * identical on non-negatives). Integer sums are order-independent, so
  * every round, and therefore the final ranking, is bit-identical in
  * both engines. SCALE=1e9 bounds the worst case far from overflow:
  * total mass ≤ |V|·1e9, and the per-round product rank·85 stays under
  * 2^63 up to ~10^8 vertices (document and raise to DECIMAL beyond).
  */
object GraphOps {

  private val Scale = 1000000000L // 1e9 fixed-point
  private val Rounds = 5

  /** Customer↔supplier purchase graph: symmetrized distinct edges from
    * lineitem x orders, vertex ids disjoint by parity (2·custkey vs
    * 2·suppkey+1). Ranks after 5 damped rounds (d=0.85), top-50 by rank
    * with a total-order tie-break.
    *
    * Scale shape: the edge list is built once (one fact-fact shuffle on
    * orderkey + a distinct) and localCheckpoint-published so the 5
    * rank rounds re-read materialized blocks instead of re-running the
    * join (ContextCleaner frees them when the frame is dropped — q65's
    * cache-hygiene pattern). Each round is one join keyed by src + one
    * partial+final aggregate keyed by dst — payload |E| longs, never
    * wider. The symmetric graph has no dangling vertices by
    * construction (every vertex has out-degree ≥ 1).
    */
  def q89PageRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val pairs = t.lineitem.select($"l_orderkey", $"l_suppkey")
      .join(t.orders.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"s".as("dst"))
      .unionAll(pairs.select($"s".as("src"), $"c".as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val outDeg = edges.join(deg, "src").localCheckpoint()
    var ranks = deg.select($"src".as("node"), lit(Scale).as("rank"))
    for (_ <- 1 to Rounds) {
      ranks = outDeg
        .join(ranks, $"src" === $"node")
        .select($"dst", expr(s"(rank * 85) div (100 * deg)").as("contrib"))
        .groupBy($"dst")
        .agg((lit(15L * Scale / 100) + sum($"contrib")).as("rank"))
        .select($"dst".as("node"), $"rank")
    }
    ranks
      .select($"node",
        when($"node" % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("kind"),
        expr("node div 2").as("entity_id"), $"rank")
      .orderBy($"rank".desc, $"node")
      .limit(50)
  }

  val q89Sql: String = {
    val base =
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT c AS src, s AS dst FROM pairs
         |  UNION ALL SELECT s AS src, c AS dst FROM pairs),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |        FROM edges GROUP BY src),
         |pr0 AS (SELECT src AS node, CAST($Scale AS BIGINT) AS rank FROM deg)""".stripMargin
    val rounds = (1 to Rounds).map { i =>
      s"""pr$i AS (
         |  SELECT e.dst AS node,
         |    CAST(${15L * Scale / 100} + sum((p.rank * 85) // (100 * d.deg))
         |      AS BIGINT) AS rank
         |  FROM pr${i - 1} p JOIN edges e ON e.src = p.node
         |                    JOIN deg d ON d.src = p.node
         |  GROUP BY e.dst)""".stripMargin
    }
    s"""$base,
       |${rounds.mkString(",\n")}
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  node // 2 AS entity_id, rank
       |FROM pr$Rounds
       |ORDER BY rank DESC, node
       |LIMIT 50""".stripMargin
  }

  /** Frequent co-purchased part pairs (market-basket itemset mining,
    * the k=2 core of FP-growth-style analysis): support counts for part
    * pairs that appear in the same order, min-support pruned, top-25.
    *
    * Scale shape: ONE shuffle keyed by order collects each basket's
    * distinct items (state bounded by basket size — single-digit items
    * per order at any corpus scale), then the C(b,2) pair fanout is
    * ROW-LOCAL (two lateral explodes + index filter) before the pair
    * aggregate — the raw fact stream never self-joins. A naive
    * fact⋈fact self-join on orderkey computes the same pairs but ships
    * the fact table twice; this ships it once. Support pruning happens
    * in the aggregate (partial+final), and the top-25 is
    * TakeOrderedAndProject with a total-order tie-break.
    */
  def q92ItemPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val minSupport = 2L
    Tables(spark, dir).lineitem
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"l_partkey")).as("items"))
      .select(posexplode($"items").as(Seq("i", "a")), $"items")
      .select($"a", explode(slice($"items", $"i" + 2, size($"items"))).as("b"))
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= minSupport)
      .orderBy($"support".desc, $"a", $"b")
      .limit(25)
  }

  val q92Sql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b
      |  FROM items x JOIN items y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)
      |SELECT a, b, CAST(count(*) AS BIGINT) AS support
      |FROM pairs
      |GROUP BY a, b
      |HAVING count(*) >= 2
      |ORDER BY support DESC, a, b
      |LIMIT 25""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q89_pagerank", q89PageRank, Some(q89Sql), Seq("X-graph", "X-scale"),
      "fixed-point integer PageRank over the purchase graph (5 damped rounds)"),
    Q("q92_item_pairs", q92ItemPairs, Some(q92Sql), Seq("X-graph", "X-stats"),
      "co-purchase pair mining: basket-local pair fanout, support pruning"))
}
