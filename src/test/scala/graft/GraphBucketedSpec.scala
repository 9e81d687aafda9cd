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

  private val OrderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"

  private def withEdgeTable[A](f: => A): A = {
    val wh = TestSpark.scratch("graph-edge-wh")
    val prevOrdering = spark.conf.getOption(OrderingConf)
    spark.conf.set(GraphOps.EdgeTableConf, wh)
    // BOTH deployment confs are the caller's to set (the operator no
    // longer mutates the session — r13 ADVICE): the ordering conf is what
    // lets the one-file-per-bucket scan serve the sort order too
    spark.conf.set(OrderingConf, "true")
    try f
    finally {
      spark.conf.set(GraphOps.EdgeTableConf, "")
      prevOrdering match {
        case Some(v) => spark.conf.set(OrderingConf, v)
        case None => spark.conf.unset(OrderingConf)
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

  test("edge-table opt-in leaves no session state: ordering conf untouched, later bucketed scans plan unchanged") {
    import spark.implicits._
    // a non-graph bucketed table, scanned before and after the edge-table
    // operator runs — its join plan must be byte-identical (the r13
    // operator set the session-global ordering conf and never restored
    // it, silently changing every later bucketed scan's planning)
    val wh = graft.etl.Warehouse(spark, TestSpark.scratch("ordering-leak-wh"))
    wh.writeBucketed(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "graft_leak_probe", Seq("k"), 4)
    def probePlan(): String = {
      val other = Seq((1L, 9L)).toDF("k", "w")
      // strip auto-incrementing expression/plan ids: only the SHAPE must
      // be stable across the two probes
      plan(spark.table("graft_leak_probe").join(other, Seq("k")))
        .replaceAll("#\\d+", "#")
        .replaceAll("plan_id=\\d+", "plan_id=")
    }
    val preConf = spark.conf.getOption(OrderingConf)
    val prePlan = probePlan()
    try {
      val whDir = TestSpark.scratch("graph-edge-wh-leak")
      spark.conf.set(GraphOps.EdgeTableConf, whDir)
      try
        GraphOps.q167BfsReach(spark, TestSpark.sf).collect(): Unit
      finally spark.conf.set(GraphOps.EdgeTableConf, "")
      assert(spark.conf.getOption(OrderingConf) == preConf,
        "edge-table operator mutated the session ordering conf")
      assert(probePlan() == prePlan,
        "a non-graph bucketed scan plans differently after edge-table use")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_leak_probe")
      spark.sql(s"SHOW TABLES").collect()
        .map(_.getAs[String]("tableName"))
        .filter(_.startsWith("graft_purchase_edges_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
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
