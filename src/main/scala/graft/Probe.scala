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
      case other => sys.error(s"unknown probe: $other")
    }
    println(f"[probe] $line dir=$dir secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
