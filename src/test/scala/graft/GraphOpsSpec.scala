package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Fixed-point PageRank checked against an in-test integer reference
  * model running the SAME scaled-long arithmetic — any drift in round
  * count, damping, truncation, or edge construction breaks equality.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q89 matches the integer reference model and ranks the hub first") {
    val dir = TestSpark.scratch("pagerank-graph")
    // purchase pairs: s1 serves c1..c4 (degree 4), c1 also buys from
    // s2,s3 (degree 3) → s1 is the strict hub (a c1/s1 degree TIE would
    // rank the customer first on the node-id tie-break)
    val pairs = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (4L, 1L))
    pairs.zipWithIndex.map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate", lit(new java.sql.Timestamp(0L)))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    pairs.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }
      .toDF("l_orderkey", "l_suppkey")
      .withColumn("l_partkey", lit(1L)).withColumn("l_linenumber", lit(1))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit(new java.sql.Timestamp(0L)))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // reference model: same vertex ids, symmetric edges, scaled longs
    val scale = 1000000000L
    val edges = pairs.flatMap { case (c, s) =>
      Seq((2 * c, 2 * s + 1), (2 * s + 1, 2 * c)) }.distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> scale).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (src, _) =>
        rank(src) * 85 / (100 * deg(src)) }.sum).toMap
      rank = rank.keys.map(v => v -> (15L * scale / 100 + contrib(v))).toMap
    }
    val expected = rank.toSeq.sortBy { case (n, r) => (-r, n) }

    val got = GraphOps.q89PageRank(spark, dir)
      .select($"node", $"rank").as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // hub: s1 (node 3) must rank first, and kinds/entity ids decode
    val top = GraphOps.q89PageRank(spark, dir).limit(1)
      .select($"kind", $"entity_id").as[(String, Long)].head()
    assert(top == (("supplier", 1L)))
  }

  test("q92 counts each basket's distinct pairs once and prunes below min support") {
    val dir = TestSpark.scratch("itempairs")
    // baskets: o1={1,2,3} (part 1 listed TWICE — must still pair once),
    // o2={1,2}, o3={1,2,4}, o4={2} → only (1,2) reaches support 2
    val rows = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 2L))
    rows.zipWithIndex.map { case ((o, p), i) => (o, p, i) }
      .toDF("l_orderkey", "l_partkey", "l_linenumber")
      .withColumn("l_suppkey", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit(new java.sql.Timestamp(0L)))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.q92ItemPairs(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    assert(out === List((1L, 2L, 3L)))
  }

  test("q103 counts each planted triangle once and attributes it to all three vertices") {
    val dir = TestSpark.scratch("triangle-graph")
    // baskets: {1,2,3} → triangle A; {3,4},{4,5},{3,5} → triangle B.
    // Vertex 3 sits in both. An open wedge 3-4 / 3-5 without the 4-5
    // edge would NOT count — basket {4,5} is what closes B. Every edge
    // recurs (×2 baskets) to clear the support-≥2 cut; basket {1,6} is
    // a one-off co-occurrence whose edge must be pruned — vertex 6
    // never appears and vertex 1's degree stays 2.
    val baskets = Seq(
      10L -> Seq(1L, 2L, 3L), 20L -> Seq(1L, 2L, 3L),
      11L -> Seq(3L, 4L), 21L -> Seq(3L, 4L),
      12L -> Seq(4L, 5L), 22L -> Seq(4L, 5L),
      13L -> Seq(3L, 5L), 23L -> Seq(3L, 5L),
      30L -> Seq(1L, 6L))
    val rows = for {
      (ok, items) <- baskets
      (p, i) <- items.zipWithIndex
    } yield (ok, p, i + 1)
    rows.toDF("l_orderkey", "l_partkey", "l_linenumber")
      .withColumn("l_suppkey", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit(new java.sql.Timestamp(0L)))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.q103Triangles(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    // degrees: 1:2, 2:2, 3:4, 4:2, 5:2; triangle counts: 3→2, rest→1
    assert(out === List(
      (3L, 4L, 2L), (1L, 2L, 1L), (2L, 2L, 1L), (4L, 2L, 1L), (5L, 2L, 1L)))
  }

  test("association rules: asymmetric confidence, shared lift, exact milli floors") {
    val dir = TestSpark.scratch("assoc-graph")
    // 6 baskets: {1,2} ×3, {1} ×2, {2,3} ×1 → supp(1)=5, supp(2)=4,
    // supp(3)=1, supp({1,2})=3 (frequent), supp({2,3})=1 (pruned).
    // conf(1→2)=3/5→600 milli, conf(2→1)=3/4→750; lift = 6·3/(5·4)=0.9→900
    val baskets = Seq(
      Seq(1L, 2L), Seq(1L, 2L), Seq(1L, 2L), Seq(1L), Seq(1L), Seq(2L, 3L))
    val rows = for {
      (items, ok) <- baskets.zipWithIndex
      (p, i) <- items.zipWithIndex
    } yield (ok.toLong, p, i + 1)
    rows.toDF("l_orderkey", "l_partkey", "l_linenumber")
      .withColumn("l_suppkey", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit(new java.sql.Timestamp(0L)))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.q116AssocRules(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(out === List(
      (2L, 1L, 3L, 4L, 5L, 750L, 900L),
      (1L, 2L, 3L, 5L, 4L, 600L, 900L)))
  }

  test("bfsReach: min distance wins, bounded rounds, unreachable stays absent") {
    // 1→2→3→4→5 chain plus a shortcut 1→4 (4 must land at dist 1, not 3),
    // node 9 disconnected, node 6 beyond the round bound
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (5L, 6L), (9L, 9L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = GraphOps.bfsReach(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L,
      6L -> 3L))
  }

  test("bfsReach: multi-seed fronts merge at min distance") {
    val edges = Seq((1L, 2L), (5L, 4L), (2L, 3L), (4L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("node")
    val out = GraphOps.bfsReach(edges, seeds, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("labelProp: disjoint cliques converge to per-clique min labels") {
    // two symmetric triangles {1,2,3} and {7,8,9}: after 2 rounds every
    // node carries its clique's minimum label; no cross-contamination
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a != b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(7L, 8L, 9L)))
      .toDF("src", "dst")
    val out = GraphOps.labelProp(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("labelProp: a true majority beats the smallest-label tie-break") {
    // clique {5,6,7} collapses to label 5 by round 2; node 1 keeps
    // label 1 via its self-loop. Node 10's in-neighbours {6, 7, 1} then
    // carry labels {5, 5, 1}: majority 5 must win even though 1 < 5 —
    // proving the argmax orders by count first, label only on ties
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a != b) yield (a, b)
    val edges = (clique(Seq(5L, 6L, 7L)) ++
      Seq((1L, 1L), (6L, 10L), (7L, 10L), (1L, 10L))).toDF("src", "dst")
    val out = GraphOps.labelProp(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) === 5L, s"majority must win: $out")
    // and the pure-tie rule: after round 1, node 10 saw distinct labels
    // {6, 7, 1} (one vote each) → smallest label 1
    val one = GraphOps.labelProp(edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(10L) === 1L, s"tie must break to smallest: $one")
  }
}
