package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * "novel sketch" surface: Spark has HLL (approx_count_distinct) and
  * quantile sketches built in, but no frequent-items aggregate.
  *
  * Guarantee: any item with true frequency > n/(k+1) is present in the
  * final counter set; reported counts are undercounts by at most n/(k+1).
  * The buffer is a bounded map (≤ k entries), merges are associative, so
  * the aggregate is partial+final like any hash aggregate and ships ≤ k
  * entries per task through the shuffle — constant-size state at any
  * corpus scale. (Counts depend on merge order within the error bound —
  * use the spec'd containment guarantee, not exact values.)
  */
object HeavyHitters {

  final case class MG(k: Int, counters: Map[String, Long]) {
    def add(item: String): MG = {
      val c = counters
      if (c.contains(item)) copy(counters = c.updated(item, c(item) + 1))
      else if (c.size < k) copy(counters = c.updated(item, 1L))
      else {
        // decrement-all step; drop zeros
        val dec = c.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        copy(counters = dec)
      }
    }
    def mergeWith(other: MG): MG = {
      val combined = (counters.keySet ++ other.counters.keySet).map { key =>
        key -> (counters.getOrElse(key, 0L) + other.counters.getOrElse(key, 0L))
      }.toMap
      if (combined.size <= k) copy(counters = combined)
      else {
        // keep the k largest, subtracting the (k+1)-th count (MG merge)
        val sorted = combined.toSeq.sortBy { case (key, n) => (-n, key) }
        val cut = sorted(k)._2
        copy(counters = sorted.take(k).map { case (key, n) => key -> (n - cut) }
          .filter(_._2 > 0).toMap)
      }
    }
  }

  final class MisraGries(k: Int) extends Aggregator[String, MG, Map[String, Long]] {
    override def zero: MG = MG(k, Map.empty)
    override def reduce(b: MG, a: String): MG = b.add(a)
    override def merge(b1: MG, b2: MG): MG = b1.mergeWith(b2)
    override def finish(r: MG): Map[String, Long] = r.counters
    override def bufferEncoder: Encoder[MG] = Encoders.product[MG]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: heavy_hitters(items, k) over a string column. */
  def heavyHitters(items: Column, k: Int): Column = udaf(new MisraGries(k)).apply(items)
}
