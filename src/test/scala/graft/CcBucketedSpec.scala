package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, GraphOps, TextOps}

/** The bucketed edge TABLE extended to the pointer-doubling CC family
  * (r13 verdict order 2): with `spark.graft.graphEdgeTable` set, the
  * symmetrized CC edge stream is published as a table bucketed+sorted on
  * `src`, so each round's `edges ⋈ labels` join plans with NO Exchange
  * and NO Sort on the edge side — and q65/q68/q140 results must be
  * byte-identical to the default persist path.
  */
class CcBucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val OrderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"

  private def plan(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  private def withEdgeTable[A](f: => A): A = {
    val wh = TestSpark.scratch("cc-edge-wh")
    val prevOrdering = spark.conf.getOption(OrderingConf)
    spark.conf.set(GraphOps.EdgeTableConf, wh)
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
        .filter(_.startsWith("graft_cc_edges_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("per-round CC join on the bucketed edge table: no Exchange, no Sort on the edge side") {
    withEdgeTable {
      import spark.implicits._
      val sym = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
      val (edges, release) = DedupOps.publishCcEdges(sym)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // the SMJ regime — at scale the label frame no longer broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val labels = Seq((1L, 1L), (3L, 3L)).toDF("src", "label")
        val p = plan(edges.join(labels, Seq("src")))
        assert(p.contains("Bucketed: true"), p.take(4000))
        val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
        val sorts = "\\(\\d+\\) Sort\\b".r.findAllIn(p).size
        // exactly the label side's Exchange+Sort — the edge scan (one
        // file per bucket + the ordering conf) provides both
        assert(exchanges == 1, s"expected 1 label-side Exchange, got $exchanges:\n${p.take(4000)}")
        assert(sorts == 1, s"expected 1 label-side Sort, got $sorts:\n${p.take(4000)}")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        release()
      }
    }
  }

  test("release hook drops the per-call table and its files") {
    withEdgeTable {
      import spark.implicits._
      val (edges, release) = DedupOps.publishCcEdges(
        Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      assert(edges.count() == 2)
      val tables = spark.sql("SHOW TABLES").collect()
        .map(_.getAs[String]("tableName"))
        .filter(_.startsWith("graft_cc_edges_"))
      assert(tables.nonEmpty)
      release()
      val after = spark.sql("SHOW TABLES").collect()
        .map(_.getAs[String]("tableName"))
        .filter(_.startsWith("graft_cc_edges_"))
      assert(after.isEmpty, "release() must drop the per-call table")
      val whRoot = new java.io.File(
        spark.conf.get(GraphOps.EdgeTableConf))
      val leftover = Option(whRoot.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("graft_cc_edges_"))
      assert(leftover.isEmpty, s"release() must delete table files: ${leftover.mkString(",")}")
    }
  }

  test("degenerate inputs under the bucketed conf: empty edge set, all-singleton corpus") {
    withEdgeTable {
      import spark.implicits._
      // empty sym → empty bucketed table: the scan must read back empty
      // (32 empty buckets), not throw at write or plan time
      val emptySym = Seq.empty[(Long, Long)].toDF("src", "dst")
      val (edges, release) = DedupOps.publishCcEdges(emptySym)
      try assert(edges.count() == 0)
      finally release()
      // CC over an empty PAIR frame: every vertex is a singleton labeled
      // by itself — the loop must converge (round 1, zero changes)
      // through the table path just like the persist path
      val verts = Seq(10L, 20L, 30L).toDF("v")
      val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      val out = DedupOps.connectedComponents(verts, pairs)
        .orderBy("v").collect().toSeq
      assert(out.map(r => (r.getLong(0), r.getLong(1))) ==
        Seq((10L, 10L), (20L, 20L), (30L, 30L)))
    }
  }

  test("q65/q68/q140 results identical on the persist path and the bucketed-table path") {
    val dir = TestSpark.sf
    val base65 = DedupOps.q65DupClusters(spark, dir).collect().toSeq
    val base68 = DedupOps.q68ClusterReps(spark, dir).collect().toSeq
    val base140 = TextOps.q140EntityResolution(spark, dir).collect().toSeq
    withEdgeTable {
      assert(DedupOps.q65DupClusters(spark, dir).collect().toSeq == base65)
      assert(DedupOps.q68ClusterReps(spark, dir).collect().toSeq == base68)
      assert(TextOps.q140EntityResolution(spark, dir).collect().toSeq == base140)
    }
  }
}
