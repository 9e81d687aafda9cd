package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for word-trigram extraction — the shared shingling
  * primitive of the dedup/contamination/repetition family (q20/q21/q42/
  * q49/q50).
  *
  * The regexp_extract_all formulation runs a regex engine with a
  * lookahead + capture per overlapping match and materializes each
  * trigram through the matcher. But over single-space-separated text a
  * word trigram is exactly the SUBSTRING from token i's first byte to
  * token i+2's last byte — so one pass over the UTF-8 bytes collecting
  * space positions (0x20 never occurs inside a multi-byte sequence)
  * yields every trigram as a byte-range slice: no regex, no
  * concatenation, O(text + output) and zero per-match machinery.
  *
  * Semantics contract (same as DedupOps.TrigramRegex and the DuckDB
  * `string_split` twin): tokens are split on EVERY single space; fewer
  * than 3 tokens → empty array. Pinned against the regex and the naive
  * split+transform constructions by DedupSimilaritySpec.
  */
object TextExpressions {

  /** Static entry point for both eval and generated code. */
  def trigrams(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token start offsets (token k starts after the k-th space)
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < 3) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < n) {
      if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    val out = new Array[Any](nTok - 2)
    var t = 0
    while (t < nTok - 2) {
      val start = starts(t)
      // end = byte before the space that precedes token t+3 (or EOS)
      val end = if (t + 3 < nTok) starts(t + 3) - 1 else n
      out(t) = UTF8String.fromBytes(bytes, start, end - start)
      t += 1
    }
    new GenericArrayData(out)
  }

  case class WordTrigrams(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_trigrams"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      trigrams(v.asInstanceOf[UTF8String])

    // one static call into the byte-scan above: the expression itself
    // participates in whole-stage codegen (no interpreted fallback for
    // the surrounding projection), and the helper does the work without
    // regex/matcher allocation
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.TextExpressions.trigrams($c);")

    override protected def withNewChildInternal(c: Expression): WordTrigrams =
      copy(child = c)
  }

  def wordTrigrams(c: Column): Column =
    ColumnBridge.column(WordTrigrams(ColumnBridge.expression(c)))

  /** Rabin–Karp polynomial rolling hash over the UTF-8 bytes:
    * h = fold(0)((acc, b) => (acc·257 + b) mod (2³¹−1)). Static entry
    * point shared by eval and generated code. The per-step product stays
    * under 2³⁹, so the arithmetic never overflows a long.
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 257 + (bytes(i) & 0xff)) % 2147483647L
      i += 1
    }
    acc
  }

  /** The production content-hash of a dedup pass: one multiply-add-mod
    * per byte (no block cipher), incrementally extendable — the hash a
    * content-defined-chunking or shift-tolerant dedup builds on, where
    * md5 (q17/q19) is the content-ADDRESS. Portable contract: the
    * DuckDB twin folds ascii() codepoints, which equals the byte fold
    * on an ASCII corpus (the q30 contract); non-ASCII text hashes by
    * BYTE here and by CODEPOINT there, so oracles must stay on ASCII
    * fixtures.
    */
  case class RollingHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash32"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      rollingHash(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.TextExpressions.rollingHash($c);")

    override protected def withNewChildInternal(c: Expression): RollingHash32 =
      copy(child = c)
  }

  def rollingHash32(c: Column): Column =
    ColumnBridge.column(RollingHash32(ColumnBridge.expression(c)))

  /** Unicode NFC normalization with an ASCII fast path.
    *
    * Visually identical strings with different codepoint sequences
    * ("é" as U+00E9 vs e + U+0301) defeat hash-based dedup (q19/q21)
    * and fingerprinting (q17) — canonical composition first makes
    * content hashing mean content, not byte accident. Spark has no
    * built-in for this (the usual fallback is a Scala UDF, which blocks
    * whole-stage codegen); DuckDB ships `nfc_normalize`.
    *
    * Fast path: NFC can only alter strings containing codepoints with
    * nonzero canonical combining class or composition mappings, all of
    * which are non-ASCII — so a pure-ASCII input (the overwhelming hot
    * path of a web corpus) is returned UNCHANGED with zero allocation
    * after one byte scan. Only strings with a high bit set pay the
    * String round-trip through java.text.Normalizer (isNormalized
    * short-circuits the already-composed majority of those).
    */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      nfc(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.TextExpressions.nfc($c);")

    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
