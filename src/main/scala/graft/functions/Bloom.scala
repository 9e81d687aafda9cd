package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.{ColumnBridge, PlanBridge}

/** Column wrappers over Spark's own runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair behind
  * spark.sql.optimizer.runtime.bloomFilter). Spark only injects these
  * automatically under join-selectivity heuristics; exposing them as
  * columns lets a pipeline build the filter ONCE and push it through an
  * arbitrary dataflow (e.g. pre-filter a fact scan before an exact
  * semi join — see Relational.q86BloomSemiJoin).
  *
  * The sketch is a fixed-size binary aggregated distributedly
  * (partial buffers merge by OR) and reaches the probe side as a scalar
  * subquery — the same plan shape InjectRuntimeFilter produces — so
  * nothing key-sized ships and nothing is collected to the driver.
  */
object Bloom {

  /** Aggregate a bloom filter over `hashed` (must be a LongType column —
    * hash keys with xxhash64 first, matching Spark's own injection).
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(hashed),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe: true if `hashed` might be in the single-row
    * single-column `bloom` frame (no false negatives — safe as a
    * pre-filter for exact joins). `might_contain` requires its filter as
    * a constant or scalar subquery, so the bloom plan rides in as one.
    */
  def mightContain(bloom: DataFrame, hashed: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(ScalarSubquery(PlanBridge.analyzed(bloom)),
        ColumnBridge.expression(hashed)))
}
