package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.{ColumnBridge, PlanBridge}

/** Group-wise top-k as a first-class operator (custom-operator tier (c):
  * LogicalPlan + SparkStrategy + SparkPlan).
  *
  * Spark expresses "k best rows per key" as row_number over a window +
  * filter, which SORTS every key's full row set — O(n log n) per
  * partition and, at 100 TB, a full shuffle of the input. This operator
  * keeps a bounded heap per key instead:
  *
  *   - partial phase (mapper-side, no distribution requirement): each
  *     task reduces its input to ≤ k rows per key it has seen — the
  *     shuffle then moves at most k·keys rows per task, not the corpus;
  *   - final phase (requires clustering by key): merges the partial
  *     top-ks per key with the same bounded heap.
  *
  * Cost is O(n log k) with k·keys memory per task, no sort anywhere.
  * Rows within a group are emitted in no particular order (callers
  * needing ordered output sort the ≤ k·keys result — negligible).
  */
object TopKPerKey {

  /** Logical node: carries grouping keys, a total SortOrder, and k.
    * Constructed with resolved expressions (taken from the input frame),
    * so the analyzer passes it through untouched.
    */
  case class TopKPerKeyPlan(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
      child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
      copy(child = c)
  }

  case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
      child: SparkPlan, partial: Boolean) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal = k
      val keysLocal = keys
      val orderLocal = order
      val childOutput = child.output
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(keysLocal, childOutput)
        val rowOrdering: Ordering[InternalRow] =
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .create(orderLocal, childOutput)
        // max-heap on "comes last": head is the worst kept row per key
        val heaps = scala.collection.mutable.HashMap
          .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
        it.foreach { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              if (heap.size < kLocal) heap.enqueue(row.copy())
              else if (rowOrdering.lt(row, heap.head)) {
                heap.dequeue()
                heap.enqueue(row.copy())
              }
            case None =>
              val heap = scala.collection.mutable.PriorityQueue
                .empty[InternalRow](rowOrdering)
              heap.enqueue(row.copy())
              heaps.update(key.copy(), heap)
          }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }
    }

    override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
      copy(child = c)
  }

  /** Plans the logical node as partial → (exchange inserted by
    * EnsureRequirements) → final.
    */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyPlan(k, keys, order, child) =>
        val partial = TopKPerKeyExec(k, keys, order, planLater(child), partial = true)
        TopKPerKeyExec(k, keys, order, partial, partial = false) :: Nil
      case _ => Nil
    }
  }

  /** Idempotently install the strategy on a live session. */
  def register(spark: SparkSession): Unit = {
    val exp = PlanBridge.experimental(spark)
    if (!exp.extraStrategies.contains(Strategy))
      exp.extraStrategies = exp.extraStrategies :+ Strategy
  }

  /** One sort dimension; include a trailing unique tie-break column to
    * make the result deterministic.
    */
  final case class SortSpec(col: String, desc: Boolean = false)

  /** Public API: the k first rows per key under `order`. Built from
    * catalyst-native unresolved attributes (NOT lazy Column nodes — those
    * only convert at known Dataset API call sites), which the analyzer
    * resolves against the child generically.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[SortSpec], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    register(spark)
    val keyExprs: Seq[Expression] =
      keys.map(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted)
    val sortOrders = order.map { s =>
      SortOrder(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(s.col),
        if (s.desc) Descending else Ascending)
    }
    PlanBridge.ofRows(spark,
      TopKPerKeyPlan(k, keyExprs, sortOrders, PlanBridge.analyzed(df)))
  }
}
