package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Diagnostic main: dump `explain("formatted")` for every registered query
  * (the plan-iteration loop the scale contract demands — run after any
  * operator change, read for missing pushdowns/broadcasts/partial aggs).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("target/plans.txt")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    operators.Registry.all.sortBy(_.name).foreach { q =>
      sb.append(s"==== ${q.name} — ${q.doc}\n")
      try {
        val baos = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(baos)) {
          q.run(spark, sfDir).explain("formatted")
        }
        sb.append(baos.toString).append("\n")
      } catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
