package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** The bucketed edge TABLE for the iterative graph family (r12 verdict
  * order 2): with `spark.graft.graphEdgeTable` set, q167/q171's per-round
  * `edges ⋈ frontier/labels` joins must plan with NO Exchange and NO Sort
  * on the edge side — the |E|-row stream crosses the network once at
  * table-build time, never per round — and the query RESULTS must be
  * byte-identical to the default checkpoint path.
  */
class GraphBucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  private def withEdgeTable[A](f: => A): A = {
    val wh = TestSpark.scratch("graph-edge-wh")
    val prevOrdering = spark.conf
      .getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set(GraphOps.EdgeTableConf, wh)
    try f
    finally {
      spark.conf.set(GraphOps.EdgeTableConf, "")
      // bucketedPurchaseEdges turns the ordering conf on — restore, so
      // the shared test session doesn't leak it into other suites
      prevOrdering match {
        case Some(v) => spark.conf
          .set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
        case None => spark.conf
          .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
      spark.sql(s"SHOW TABLES").collect()
        .map(_.getAs[String]("tableName"))
        .filter(_.startsWith("graft_purchase_edges_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("per-round join on the bucketed edge table: no Exchange, no Sort on the edge side") {
    withEdgeTable {
      import spark.implicits._
      val edges = GraphOps.bucketedPurchaseEdges(
        spark, TestSpark.sf, spark.conf.get(GraphOps.EdgeTableConf))
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // force the SMJ regime — the sf10 reality where the frontier no
        // longer broadcasts and the edge-side layout is what's at stake
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // a local-relation frontier gives the OTHER side a known shape
        // (LocalTableScan → Exchange → Sort), so the plan's total
        // Exchange/Sort counts isolate the edge side exactly
        val frontier = Seq(0L, 2L, 4L, 6L).toDF("src")
        val p = plan(edges.join(frontier, Seq("src")))
        assert(p.contains("Bucketed: true"), p.take(4000))
        val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
        val sorts = "\\(\\d+\\) Sort\\b".r.findAllIn(p).size
        // exactly the frontier side's exchange+sort — the bucketed scan
        // (one file per bucket) provides both partitioning and order
        assert(exchanges == 1, s"expected 1 frontier-side Exchange, got $exchanges:\n${p.take(4000)}")
        assert(sorts == 1, s"expected 1 frontier-side Sort, got $sorts:\n${p.take(4000)}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("q167/q171 results identical on the checkpoint path and the bucketed-table path") {
    val dir = TestSpark.sf
    val base167 = GraphOps.q167BfsReach(spark, dir).collect().toSeq
    val base171 = GraphOps.q171LabelProp(spark, dir).collect().toSeq
    withEdgeTable {
      val b167 = GraphOps.q167BfsReach(spark, dir).collect().toSeq
      val b171 = GraphOps.q171LabelProp(spark, dir).collect().toSeq
      assert(b167 == base167)
      assert(b171 == base171)
    }
  }
}
