package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

/** The cluster-durability switch: `spark.graft.checkpointDir` routes every
  * `Ckpt.ckpt()` publish (the CC loop, textcat's shared trigram frame,
  * q158's published anchors, …) through reliable `checkpoint()` files
  * instead of executor-local blocks — the contract a 1000-executor job
  * needs to survive executor loss mid-iteration.
  */
class CkptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CC loop runs under reliable checkpointing and writes checkpoint files") {
    val dir = TestSpark.scratch("reliable-ckpt")
    spark.conf.set(Ckpt.ConfKey, dir)
    try {
      // diameter-6 chain → multi-round fixpoint, several publishes per round
      val verts = (0L to 6L).toDF("v")
      val edges = (0L until 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val labels = DedupOps.connectedComponents(verts, edges)
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 7 && labels.values.forall(_ == 0L))
      // reliable mode is observable: checkpoint files landed under the dir
      def countFiles(f: java.io.File): Int =
        if (f.isFile) 1
        else Option(f.listFiles()).map(_.map(countFiles).sum).getOrElse(0)
      assert(countFiles(new java.io.File(dir)) > 0,
        s"expected reliable checkpoint files under $dir")
    } finally spark.conf.unset(Ckpt.ConfKey)
  }

  test("without the conf the publish stays executor-local (no checkpoint dir use)") {
    import Ckpt._
    assert(spark.conf.getOption(Ckpt.ConfKey).isEmpty)
    val out = Seq((1L, "a")).toDF("k", "s").ckpt()
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
