package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage-truncating publish for iterative and multiply-consumed frames,
  * with a cluster-durability switch.
  *
  * Every iterative loop (connected components, Lloyd rounds, PageRank) and
  * every "compute once, feed N consumers" frame in this library publishes
  * through [[Ckpt.GraftCheckpoint.ckpt]]:
  *
  *  - '''default''' — `localCheckpoint()`: blocks live in executor storage,
  *    zero filesystem round-trip. Right for `local[*]` and for clusters
  *    where a lost executor may re-run the whole query.
  *  - '''`spark.graft.checkpointDir` set''' — reliable `checkpoint()` into
  *    that directory (HDFS/S3/local path). Checkpoint files survive
  *    executor loss, so a 1000-executor job resumes an iterative query
  *    from the last round instead of restarting it — the 100 TB
  *    durability contract. Set it once on the session
  *    (`spark.conf.set(Ckpt.ConfKey, "hdfs://…/ckpt")`); every operator
  *    picks it up with no per-call plumbing.
  *
  * Both forms are EAGER (materialize now) and truncate lineage to the
  * materialized copy — the property the iterative loops rely on (a
  * self-join over round r would otherwise double the plan tree per
  * round).
  */
object Ckpt {
  /** Session conf key: when set to a non-empty path, `ckpt()` uses
    * reliable `checkpoint()` rooted at that directory.
    */
  val ConfKey = "spark.graft.checkpointDir"

  implicit final class GraftCheckpoint(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = {
      val spark = df.sparkSession
      spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
        case Some(dir) =>
          val sc = spark.sparkContext
          // setCheckpointDir appends a per-app UUID subdir; only (re)set
          // when unset so repeated publishes share one checkpoint root
          if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
          df.checkpoint()
        case None => df.localCheckpoint()
      }
    }
  }

  /** Free the storage blocks behind an already-published frame that is
    * PROVEN DEAD (no live frame will ever read it again).
    *
    * `localCheckpoint` persists at the RDD layer, which
    * `DataFrame.unpersist` (plan-cache layer) never sees — without this,
    * a long-lived JVM running many CC rounds holds every round's blocks
    * until the ContextCleaner happens to collect the dropped references.
    * This walks the plan to the `LogicalRDD` leaves and unpersists their
    * RDDs directly. Under reliable checkpointing the call is still safe:
    * it drops cached blocks only — the checkpoint FILES remain, so even a
    * not-quite-dead frame stays recomputable.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
