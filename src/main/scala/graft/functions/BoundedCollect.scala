package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded posting-list collection: `collect_list` that stops at a cap
  * and marks the group as overflowed instead of growing.
  *
  * This is the single-shuffle form of the df-capped inverted index: the
  * classic plan aggregates document frequencies, joins the cap filter
  * back onto the posting stream, and only then collects the surviving
  * lists — two by-key shuffles and two passes over the (expensive,
  * uncached) posting upstream. Collecting WITH the bound folds all of
  * that into one aggregation: a group that exceeds the cap would be
  * discarded by the df filter anyway, so capping its buffer loses
  * nothing, and state stays ≤ cap+1 entries per group at every stage —
  * partial buffers cap before the shuffle, so a stop-shingle appearing
  * in millions of documents ships ≤ cap+1 rows per map task instead of
  * its full posting list (the skew the df cap exists to kill).
  */
object BoundedCollect {

  /** One posting: a document and its full shingle-set size (carried so
    * pair rows leave the combination explode already sized).
    */
  final case class Posting(doc_id: Long, n_sh: Long)

  final case class Buf(over: Boolean, items: Seq[Posting])

  /** finish sorts by doc_id, so position order downstream (i < j) is
    * doc_id order; an overflowed group finishes as None (SQL null).
    */
  final class BoundedPostings(cap: Int)
      extends Aggregator[Posting, Buf, Option[Seq[Posting]]] {
    override def zero: Buf = Buf(over = false, Vector.empty)
    override def reduce(b: Buf, a: Posting): Buf =
      if (b.over) b
      else if (b.items.size >= cap) Buf(over = true, Vector.empty)
      else b.copy(items = b.items :+ a)
    override def merge(x: Buf, y: Buf): Buf =
      if (x.over || y.over) Buf(over = true, Vector.empty)
      else if (x.items.size + y.items.size > cap) Buf(over = true, Vector.empty)
      else x.copy(items = x.items ++ y.items)
    override def finish(b: Buf): Option[Seq[Posting]] =
      if (b.over) None else Some(b.items.sortBy(p => (p.doc_id, p.n_sh)))
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Option[Seq[Posting]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Seq[Posting]]]()
  }

  /** Column form over (doc_id, n_sh); null when the group exceeds cap. */
  def boundedPostings(docId: Column, nSh: Column, cap: Int): Column =
    udaf(new BoundedPostings(cap), Encoders.product[Posting]).apply(docId, nSh)
}
