package graft

/** Dev diagnostic main: named one-off measurements over an sf dir, so
  * scale probes (edge volumes, candidate counts) are reproducible
  * commands instead of throwaway shell snippets. Usage:
  * `runMain graft.Probe <name> <sfDir>`; prints one `[probe]` line.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val dir = args(1)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val line = what match {
      case "q140-thin-edges" =>
        s"thin_edges=${operators.TextOps.fuzzyMatchEdges(spark, dir).count()}"
      case "q140-full-pairs" =>
        s"full_pairs=${operators.TextOps.fuzzyJoin(spark, dir).count()}"
      case "ivf-sweep" =>
        // per-width eval wall time measured separately so the sweep line
        // carries both axes of the operating curve (recall, cost)
        val rows = Seq(1, 2, 4, 8, 10).map { p =>
          val w0 = System.nanoTime()
          val rec = operators.SimilarityOps.ivfSweep(spark, dir, Seq(p)).collect()
          val secs = (System.nanoTime() - w0) / 1e9
          val r10 = rec.find(_.getLong(1) == 10L).get
          f"nProbe=$p recall@1=${rec.find(_.getLong(1) == 1L).get.getDouble(3)}%.2f " +
            f"recall@10=${r10.getDouble(3)}%.2f scanned_frac=${r10.getDouble(5)}%.3f " +
            f"eval_secs=$secs%.1f"
        }
        rows.mkString("\n[probe] ")
      case other => sys.error(s"unknown probe: $other")
    }
    println(f"[probe] $line dir=$dir secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
