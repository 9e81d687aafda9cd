package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Freshness of the cached purchase-edge table (r14 verdict order 2):
  * the catalog name is a digest of the fixture paths PLUS a content
  * fingerprint of the underlying files, so a fixture regenerated IN
  * PLACE at the same path must map to a NEW table — the r13→r14 fix
  * closed cross-path collisions but still served a stale table after
  * in-place regeneration, relying on an unenforced caller-owned drop.
  */
class EdgeTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Tiny in-place-regenerable fixture: one customer↔supplier pair per
    * (orderkey, custkey, suppkey) triple.
    */
  private def writeFixture(dir: String, triples: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    triples.map { case (o, _, s) => (o, s) }.toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    triples.map { case (o, c, _) => (o, c) }.distinct.toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("in-place fixture regeneration rebuilds the edge table (content-fingerprinted name)") {
    val dir = TestSpark.scratch("edge-fixture")
    val wh = TestSpark.scratch("edge-fixture-wh")
    try {
      writeFixture(dir, Seq((1L, 10L, 20L)))
      val name1 = GraphOps.edgeTableName("graft_purchase_edges_", dir, wh,
        GraphOps.fixtureFingerprint(spark, dir))
      val edges1 = GraphOps.bucketedPurchaseEdges(spark, dir, wh)
      // symmetrized: (2·10, 2·20+1) both directions
      assert(edges1.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        === Array((20L, 41L), (41L, 20L)))

      // regenerate IN PLACE at the SAME path with different content —
      // the name must change and the rebuilt table must serve the NEW
      // edge set, not the cached one
      writeFixture(dir, Seq((1L, 10L, 20L), (2L, 11L, 21L)))
      val name2 = GraphOps.edgeTableName("graft_purchase_edges_", dir, wh,
        GraphOps.fixtureFingerprint(spark, dir))
      assert(name1 !== name2,
        "regenerated fixture mapped to the same table name — stale table would be served")
      val edges2 = GraphOps.bucketedPurchaseEdges(spark, dir, wh)
      assert(edges2.count() === 4)
    } finally {
      spark.sql("SHOW TABLES").collect()
        .map(_.getAs[String]("tableName"))
        .filter(_.startsWith("graft_purchase_edges_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("fingerprint covers both fact files and reports an absent one") {
    val dir = TestSpark.scratch("edge-fixture-fp")
    writeFixture(dir, Seq((1L, 10L, 20L)))
    val fp = GraphOps.fixtureFingerprint(spark, dir)
    assert(fp.contains(".parquet|"), fp) // (name, size, mtime) entries
    val empty = TestSpark.scratch("edge-fixture-empty")
    val fpEmpty = GraphOps.fixtureFingerprint(spark, empty)
    assert(fpEmpty.contains("lineitem.parquet|absent"))
    assert(fpEmpty.contains("orders.parquet|absent"))
  }
}
