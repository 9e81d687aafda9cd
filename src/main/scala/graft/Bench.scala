package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at the env-selected scale
  * factor, one JSON line to stdout. Each query runs median-of-3 (override
  * via SPARK_GRAFT_BENCH_REPS) so host variance cannot masquerade as a
  * regression.
  *
  * Each query is forced through a `noop`-format write — unlike `count()`,
  * that materializes every output column (no Catalyst shortcut where the
  * count skips projections), so timings reflect real execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up outside timing: parquet footers (+ first row group) of
    // every table, then one full query for JIT — so the first timed
    // queries don't pay one-off IO/compile costs the rest never see.
    // events MUST go through Tables (nanos-timestamp handling). Each
    // loader is itself inside the try: `Tables.events` analyzes eagerly
    // (withColumn), so a schema surprise must degrade to a cold first
    // query, not kill the whole bench before a single timing is taken.
    val t = Tables(spark, sfDir)
    Seq[() => org.apache.spark.sql.DataFrame](
      () => t.region, () => t.nation, () => t.customer, () => t.supplier,
      () => t.part, () => t.orders, () => t.lineitem, () => t.events,
      () => t.documents, () => t.embeddings).foreach { mk =>
      try mk().limit(1).collect(): Unit
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries.head._2(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // median-of-N per query: a single-shot timing cannot distinguish host
    // variance from a real regression (the r3 q4/q50 "regressions" were
    // exactly this), so each query runs N times and reports its median;
    // the headline total is the sum of medians.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=q65_dup_clusters,q68_cluster_reps
    // times just those queries (the driver never sets it — full run).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // a crashing query must NOT score as a fast pass: record -1 and the
      // error, and exit nonzero after reporting
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case t: Throwable => Some(t.toString) }
        (if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
      }
      val err = runs.collectFirst { case (_, Some(m)) => m }
      val secs =
        if (err.isDefined) -1.0
        else {
          // true median: average the two middle elements for even reps
          // (sorted(reps/2) alone would report the SLOWER middle run)
          val s = runs.map(_._1).sorted
          if (reps % 2 == 1) s(reps / 2) else (s(reps / 2 - 1) + s(reps / 2)) / 2.0
        }
      (name, secs, err)
    }
    // ascending-by-time so the SLOWEST queries sit at the END of the line:
    // the driver keeps only a ~2000-char tail of stdout, and this ordering
    // lands the top-cost queries (the ones worth reading) inside that
    // window for free, right before the compact total line
    val qs = results.sortBy(_._2).map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + m.replaceAll("""[\\"\n\r\t]""", " ").take(200) + "\""
    }
    // full line carries the errors map; the compact final line gets only
    // the numeric count — a heavy-failure run would otherwise re-inflate
    // the last line past the driver's tail window (the thing it exists
    // to stay inside of)
    val errField =
      if (errs.isEmpty) ""
      else errs.mkString(""","errors":{""", ",", "}") + s""","failed":${errs.size}"""
    val failedField = if (errs.isEmpty) "" else s""","failed":${errs.size}"""
    // a crashed query contributes 0s of work — a summed total would READ
    // AS FASTER on a broken build, so the headline goes to -1 whenever
    // anything failed (per-query times stay available above)
    val total =
      if (errs.isEmpty) results.map(_._2).sum else -1.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}"""
    println(line)
    // the driver's stdout capture truncates long output (BENCH_r07 lost 70
    // of 134 per-query numbers that way) — persist the complete line to a
    // stable path as well, so every round's evidence survives verbatim
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/bench_full.json"),
        (line + "\n").getBytes("UTF-8"))
      // sf-suffixed copy so a later run at another SF doesn't clobber
      // this one's evidence (subset runs at other SFs did exactly that)
      val sfTag = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"target/bench_full-$sfTag.json"),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    // FINAL stdout line is a compact summary with no per-query map: the
    // driver's capture tail-truncates long output, and a 5 KB queries
    // map can push the line's head (the metric/value fields) out of the
    // window — r7/r9 both recorded parsed:null that way. A short last
    // line always survives a tail whole; the full per-query evidence
    // lives in the line above and in target/bench_full*.json.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size}$failedField,"sf":"$sfDir","queries_file":"target/bench_full.json"}""")
    if (errs.nonEmpty) sys.exit(1)
  }
}
