package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so hard that even a
  * split partition overwhelms a task (the classic hot-key fact⋈dim case).
  *
  * `saltedJoin` spreads each hot left-side key over `salt` sub-keys and
  * replicates the (small) right side `salt` ways, so the hot key's rows
  * land on `salt` different reducers instead of one. The salt is a
  * deterministic hash of the whole left row — stable across retries, no
  * rand() (which would break task re-execution).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Join a skewed frame to a small dimension on `key`, spreading the
    * left side over `salt` sub-partitions. Right side grows ×salt —
    * intended for dimension-sized right inputs.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val leftCols = skewed.columns.map(col)
    val left = skewed.withColumn(SaltCol, pmod(xxhash64(leftCols: _*), lit(salt)).cast("int"))
    val right = dim.withColumn(SaltCol,
      explode(array((0 until salt).map(i => lit(i)): _*)))
    left.join(right, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
