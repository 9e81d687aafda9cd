package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

/** Planted-fixture semantics for the profiling and pre-tokenizer
  * operators (their corpus-level behavior is pinned by the DuckDB
  * oracle gate; these cover the edge cases a uniform fixture never
  * hits).
  */
class ProfilingTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("regr trend NULLs slope and intercept for degenerate groups") {
    // a group whose orders all share one date (den = n·Σx² − (Σx)² = 0)
    // and a singleton group must yield NULL, not NaN/±Infinity — the
    // TPC-H fixture never hits this, so pin it on a planted one
    val dir = TestSpark.scratch("regr-degenerate")
    def d(n: Int) = java.sql.Date.valueOf(f"1995-02-$n%02d")
    Seq(
      ("1-SAME", d(5), 100.0), ("1-SAME", d(5), 200.0),
      ("2-ONE", d(7), 300.0),
      ("3-OK", d(1), 100.0), ("3-OK", d(3), 300.0))
      .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = Profiling.q119RegrTrend(spark, dir).collect()
    val byP = rows.map(r => r.getString(0) -> r).toMap
    assert(byP("1-SAME").isNullAt(2) && byP("1-SAME").isNullAt(3))
    assert(byP("2-ONE").isNullAt(2) && byP("2-ONE").isNullAt(3))
    // the healthy group still fits: slope (300−100)/(2 days) = 100/day
    assert(byP("3-OK").getDouble(2) == 100.0)
  }

  test("keySkew reports uniform keys as ratio 1 and a hot key as its multiple") {
    // uniform fixture: 4 keys × 2 rows → skew ratio exactly 1.
    // hot fixture: keys 1..3 with 2 rows each plus 8 rows of key 9 →
    // 14 rows over 4 keys, max 8 → skew = 8·4/14
    val uniform = (1 to 4).flatMap(k => Seq(k, k)).toDF("k")
    val u = Profiling.keySkew(uniform, "k", "u").collect().head
    assert(u.getAs[Long]("n_rows") == 8L)
    assert(u.getAs[Long]("n_keys") == 4L)
    assert(u.getAs[Long]("max_cnt") == 2L)
    assert(u.getAs[Double]("skew_ratio") == 1.0)
    val hot = ((1 to 3).flatMap(k => Seq(k, k)) ++ Seq.fill(8)(9)).toDF("k")
    val h = Profiling.keySkew(hot, "k", "h").collect().head
    assert(h.getAs[Long]("max_cnt") == 8L)
    assert(h.getAs[Double]("skew_ratio") == 8.0 * 4 / 14)
  }

  test("surprisal bits are the exact integer floor-log2 of inverse token frequency") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("surprisal-docs")
    // counts: a=3, b=1, c=1, N=5; bits(tok) = bitlength(N div c) - 1:
    // a → 5 div 3 = 1 → 0 bits; b, c → 5 → '101' → 2 bits
    Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q67Surprisal(spark, dir)
      .select($"doc_id", $"n_tokens", $"total_bits", $"avg_bits")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out === List((1L, 3L, 2L, 2.0 / 3), (2L, 2L, 2L, 1.0)))
  }

  test("bigram surprisal prices transitions by exact conditional floor-log2") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("bigram-docs")
    // c2: (a,b)=3 (b,a)=1 (b,c)=1; prefix c1: a=3, b=2
    // bits: (a,b) → 3//3=1 → 0; (b,a) → 2//1=2 → 1; (b,c) → 1
    Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q74BigramSurprisal(spark, dir)
      .select($"doc_id", $"n_bigrams", $"total_bits", $"avg_bits")
      .as[(Long, Long, Long, Double)].collect().toList
    // the 1-word doc has no bigrams and no row
    assert(out === List((1L, 3L, 1L, 1.0 / 3), (2L, 2L, 1L, 0.5)))
  }

  test("tf-idf ranks rare heavy terms first with integer floor-log2 idf") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("tfidf-docs")
    // N=4; df: apple=1 banana=2 cherry=2 common=4 date=1 eel=1
    // idf_bits: df=1 → bitlen(4)-1=2; df=2 → 1; df=4 → 0
    Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common common"),
      (3L, "common cherry date"),
      (4L, "common eel eel eel")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q70TfIdf(spark, dir)
      .select($"doc_id", $"term_rank", $"term", $"tf", $"df", $"idf_bits", $"score")
      .as[(Long, Long, String, Long, Long, Long, Long)].collect().toList
    // doc 1: apple 2·2=4, banana 1·1=1, common 1·0=0
    assert(out.filter(_._1 == 1L) === List(
      (1L, 1L, "apple", 2L, 1L, 2L, 4L),
      (1L, 2L, "banana", 1L, 2L, 1L, 1L),
      (1L, 3L, "common", 1L, 4L, 0L, 0L)))
    // doc 4 has only 2 distinct terms → 2 rows, eel 3·2=6 first
    assert(out.filter(_._1 == 4L) === List(
      (4L, 1L, "eel", 3L, 1L, 2L, 6L),
      (4L, 2L, "common", 1L, 4L, 0L, 0L)))
    // score ties (doc 3: cherry 1·1=1 beats nothing equal; common 0 vs
    // nothing) — and zero-score rows still rank by term asc
    assert(out.filter(_._1 == 3L).map(_._3) === List("date", "cherry", "common"))
  }

  test("vocabulary ranks by count then term, with exact cumulative coverage") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("vocab-docs")
    // counts: a=3, b=2, c=1, d=1 (c/d tie → term asc); stream N=7
    Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q73Vocab(spark, dir)
      .select($"vocab_rank", $"term", $"cnt", $"cum_cnt", $"cum_share")
      .as[(Long, String, Long, Long, Double)].collect().toList
    assert(out === List(
      (1L, "a", 3L, 3L, 3.0 / 7),
      (2L, "b", 2L, 5L, 5.0 / 7),
      (3L, "c", 1L, 6L, 6.0 / 7),
      (4L, "d", 1L, 7L, 1.0)))
  }

  test("boilerplate share counts positions against distinct-doc trigram frequency") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("boiler-docs")
    // "x y z" occurs in 4 DISTINCT docs → boilerplate (df ≥ 3); every
    // other trigram is doc-unique. Doc 5 repeats the boiler trigram at 2
    // of its 5 POSITIONS (multiset positions, distinct-doc df). The
    // 1-word doc has no trigrams and no row.
    Seq(
      (1L, "x y z a b"),
      (2L, "x y z c d"),
      (3L, "x y z e f"),
      (4L, "p q r s"),
      (5L, "x y z x y z x"),
      (6L, "hi")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q76Boilerplate(spark, dir)
      .select($"doc_id", $"n_trigrams", $"n_boiler", $"boiler_share")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out === List(
      (1L, 3L, 1L, 1.0 / 3), (2L, 3L, 1L, 1.0 / 3), (3L, 3L, 1L, 1.0 / 3),
      (4L, 2L, 0L, 0.0), (5L, 5L, 2L, 0.4)))
  }

  test("PMI collocations keep positive-PMI pairs with exact floor-log2 bits") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("pmi-docs")
    // bigrams: doc1 (a,b)×3 (b,a)×2; doc2 (c,d)×3 (d,c)×2; doc3 (a,d)×1
    // unigram sums over both bigram slots: a=6 b=5 c=5 d=6; N=22
    // (a,b): 22·3=66 ≥ 6·5=30 → 66//30=2 → 1 bit; (b,a): 44 ≥ 30 → 0 bits
    // (c,d): 66 ≥ 25 → 1 bit;                 (d,c): 44 ≥ 30 → 0 bits
    // (a,d): c12=1 < 2 → excluded
    Seq((1L, "a b a b a b"), (2L, "c d c d c d"), (3L, "a d"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q78Pmi(spark, dir)
      .select($"w1", $"w2", $"c12", $"c1", $"c2", $"pmi_bits")
      .as[(String, String, Long, Long, Long, Long)].collect().toList
    assert(out === List(
      ("a", "b", 3L, 6L, 5L, 1L),
      ("c", "d", 3L, 5L, 6L, 1L),
      ("b", "a", 2L, 5L, 6L, 0L),
      ("d", "c", 2L, 6L, 5L, 0L)))
  }

  test("corr stats emit exact sufficient sums; degenerate variance is NULL not NaN") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("corr-docs")
    // source A: (x, y) = (10,1) (20,2) (30,3) — perfectly linear;
    // source B: word count constant → zero y-variance → corr NULL
    Seq(
      (1L, "w", "A", 10L), (2L, "w w", "A", 20L), (3L, "w w w", "A", 30L),
      (4L, "a b", "B", 5L), (5L, "c d", "B", 9L))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Profiling.q79CorrStats(spark, dir).collect()
    val a = rows.find(_.getAs[String]("source") == "A").get
    assert((a.getAs[Long]("n"), a.getAs[Long]("sx"), a.getAs[Long]("sy"),
      a.getAs[Long]("sxy"), a.getAs[Long]("sxx"), a.getAs[Long]("syy"))
      === ((3L, 60L, 6L, 140L, 1400L, 14L)))
    assert(math.abs(a.getAs[Double]("corr") - 1.0) < 1e-12)
    val b = rows.find(_.getAs[String]("source") == "B").get
    assert(b.isNullAt(b.fieldIndex("corr")))
  }

  test("BPE pre-tokenizer splits contractions, digit runs, and punctuation runs") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("bpe-docs")
    Seq((0L, "en", "don't stop 42 now!!"), (1L, "en", "a1b2"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q51BpeTokens(spark, dir)
      .select($"doc_id", $"n_tokens", $"n_alpha", $"n_digit")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    // don|'t|<sp>stop|<sp>42|<sp>now|!! → 6 tokens, alpha runs: don,t,stop,now
    assert(out(0L) == ((6L, 4L, 1L)))
    // a|1|b|2 → 4 tokens, 2 alpha runs, 2 digit runs
    assert(out(1L) == ((4L, 2L, 2L)))
  }

  test("column profile: nulls, exact distincts, typed min/max, completeness") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("profile-lineitem")
    Seq(
      (1L, Some(1.0), "A"), (2L, Some(3.0), "A"),
      (3L, None, "B"), (4L, Some(3.0), "B"))
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
      .withColumn("l_extendedprice", lit(5.0))
      .withColumn("l_discount", lit(0.1))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_linestatus", lit("O"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = operators.Profiling.q85ColumnProfile(spark, dir).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val q = rows("l_quantity")
    assert(q.getAs[Long]("n_rows") === 4L)
    assert(q.getAs[Long]("n_null") === 1L)
    assert(q.getAs[Long]("n_distinct") === 2L) // NULL not a distinct value
    assert(q.getAs[Double]("min_num") === 1.0)
    assert(q.getAs[Double]("max_num") === 3.0)
    assert(q.isNullAt(q.fieldIndex("min_str")))
    assert(q.getAs[Double]("completeness") === 0.75)
    val f = rows("l_returnflag")
    assert(f.getAs[Long]("n_null") === 0L)
    assert(f.getAs[Long]("n_distinct") === 2L)
    assert((f.getAs[String]("min_str"), f.getAs[String]("max_str")) === (("A", "B")))
    assert(f.isNullAt(f.fieldIndex("min_num")))
    assert(f.getAs[Double]("completeness") === 1.0)
  }

  test("drift: stable type residuals are 0, shifted type gets symmetric residuals") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("drift-events")
    def ns(sec: Long): Long = sec * 1000000000L
    // secs 0..39 → mid = 20. A: 10 events each half (no drift).
    // B: 4 in p0, 16 in p1 (shift). Totals: p0=14, p1=26, N=40; each
    // type row-total 20 → expected 7/13 for both types.
    val secs =
      (0L to 9L).map(("A", _)) ++ (20L to 29L).map(("A", _)) ++
        (10L to 13L).map(("B", _)) ++
        (30L to 37L).flatMap(s => Seq(("B", s), ("B", s)))
    secs.zipWithIndex.map { case ((ty, s), id) => (id.toLong, 1L, ns(s), ty) }
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.Profiling.q87Drift(spark, dir)
      .as[(String, Long, Long, Double, Double, Double, Double)].collect().toList
    val r = 3.0 / math.sqrt(7.0)
    assert(out === List(
      ("A", 10L, 10L, 7.0, 13.0, r, -3.0 / math.sqrt(13.0)),
      ("B", 4L, 16L, 7.0, 13.0, -r, 3.0 / math.sqrt(13.0))))
  }

  test("mode+entropy: deterministic tie-break, zero entropy for degenerate groups") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("modeentropy-events")
    def ns(hour: Long, i: Long): Long = (hour * 3600L + i) * 1000000000L
    // hour 0: a,a,b → mode a, H = −(2/3·log2 2/3 + 1/3·log2 1/3) = 0.9183
    // hour 1: c,c   → degenerate, H = 0
    // hour 2: b,a   → tied counts: mode must be 'a' (value-asc tie-break)
    val rows = Seq(
      (0L, "a"), (0L, "a"), (0L, "b"),
      (1L, "c"), (1L, "c"),
      (2L, "b"), (2L, "a"))
    rows.zipWithIndex.map { case ((h, ty), id) => (id.toLong, 1L, ns(h, id), ty) }
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.Profiling.q95ModeEntropy(spark, dir)
      .as[(Int, String, Long, Double, Long, Long)].collect().toList
    val h0 = BigDecimal(-(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)) / math.log(2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === List(
      (0, "a", 2L, h0, 2L, 3L),
      (1, "c", 2L, 0.0, 1L, 2L),
      (2, "a", 1L, 1.0, 2L, 2L)))
  }

  test("MAD outliers: median/MAD ignore the planted spike; z-score-style mean would not") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("mad-events")
    // values 1..9 plus a 1000 spike: med = 5.5, deviations sorted give
    // MAD = 2.5 → threshold 4.4478·2.5 = 11.1195 → exactly the spike
    // flags. (mean/stddev would be dragged to ~104/~314 and flag nothing)
    val rows = ((1 to 9).map(_.toDouble) :+ 1000.0).zipWithIndex.map {
      case (v, i) => (i.toLong, 1L, i.toLong * 1000000000L, "A", v)
    }
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.Profiling.q104MadOutliers(spark, dir)
      .as[(String, Long, Double, Double, Long)].collect().toList
    assert(out === List(("A", 10L, 5.5, 2.5, 1L)))
  }

  test("KS drift: identical halves score 0, disjoint halves score 1, integer numerator") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("ks-events")
    def ns(sec: Long): Long = sec * 1000000000L
    // global mid = (0 + (33-0+1)//2) = 17. Type A: both halves {1,2} →
    // D = 0. Type B: early {1,1}, late {2,2} → at value 1 the ECDFs are
    // 1 vs 0 → numerator |2·2−0·2| = 4, D = 1.
    val rows = Seq(
      ("A", 0L, 1.0), ("A", 1L, 2.0), ("A", 30L, 1.0), ("A", 31L, 2.0),
      ("B", 2L, 1.0), ("B", 3L, 1.0), ("B", 32L, 2.0), ("B", 33L, 2.0))
    rows.zipWithIndex.map { case ((ty, s, v), id) => (id.toLong, 1L, ns(s), ty, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.Profiling.q105KsDrift(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(out === List(("A", 2L, 2L, 0L, 0.0), ("B", 2L, 2L, 4L, 1.0)))
  }

  test("table digest is row-order independent and sensitive to a one-cent change") {
    import org.apache.spark.sql.functions._
    def write(dir: String, rows: Seq[(Long, Int, Double)]): Unit =
      rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("l_partkey", lit(1L)).withColumn("l_suppkey", lit(1L))
        .withColumn("l_quantity", lit(1.0))
        .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
        .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
        .withColumn("l_shipdate",
          lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
        .repartition(3)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val a = TestSpark.scratch("digest-a")
    val b = TestSpark.scratch("digest-b")
    val c = TestSpark.scratch("digest-c")
    val rows = (1L to 20L).map(k => (k, 1, 100.00 + k))
    write(a, rows)
    write(b, rows.reverse) // same content, different order/partitioning
    write(c, rows.updated(4, (5L, 1, 105.01))) // one cent off in one row
    def dig(dir: String) = operators.Profiling.q106TableDigest(spark, dir)
      .as[(String, Long, Long, Long)].collect().toList
    assert(dig(a) === dig(b))
    assert(dig(a) !== dig(c))
    assert(dig(a).head._2 === 20L)
  }

  test("percentile gate keeps exactly the per-source top 30% with doc_id tie-break") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("pgate-docs")
    // source X: 10 docs with strictly increasing word counts (1..10
    // words, all below the 60-word cap → quality strictly increases);
    // top-30% = the 3 longest. source Y: 2 docs → 10·rank ≤ 3·2 keeps none.
    val rows = (1 to 10).map { i =>
      (i.toLong, (1 to i).map(j => s"w$j").mkString(" "), "en", "X", 0L)
    } ++ Seq((100L, "a b", "en", "Y", 0L), (101L, "c d", "en", "Y", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.CurationOps.q107PercentileGate(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(out.map(r => (r._1, r._2, r._3)) ===
      List(("X", 8L, 3L), ("X", 9L, 2L), ("X", 10L, 1L)))
  }

  test("join estimate: the forecast equals the materialized join's exact cardinality") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf
    val est = operators.Profiling.q109JoinEstimate(spark, sf).collect()
    val orders = Tables(spark, sf).orders
    val customer = Tables(spark, sf).customer
    val actual = orders.join(customer,
      orders("o_custkey") === customer("c_custkey")).count()
    assert(est.map(_.getAs[Long]("est_rows")).sum === actual)
    // per-bucket max is consistent with its own sum
    est.foreach { r =>
      assert(r.getAs[Long]("max_key_rows") <= r.getAs[Long]("est_rows"))
    }
  }

  test("decayed counts halve per 365-day age step and cap at 10 halvings") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("decay-orders")
    def d(daysAgo: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2001-01-01 00:00:00").getTime - daysAgo * 86400000L)
    // anchor = newest order. ages 0/400/800 days → 1000/500/250 milli;
    // a 20-year fossil caps at 10 halvings → 1000 >> 10 = 0
    Seq(
      (1L, "A", d(0)), (2L, "A", d(400)), (3L, "A", d(800)),
      (4L, "B", d(7300)))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .withColumn("o_custkey", lit(1L)).withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = operators.Profiling.q113DecayedCounts(spark, dir)
      .as[(String, Long, Long)].collect().toList
    assert(out === List(("A", 3L, 1750L), ("B", 1L, 0L)))
  }

  test("Benford digits come from exact cent strings; expectations follow log10(1+1/d)") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("benford-orders")
    // cent strings: 100, 150, 200, 999 → digits 1,1,2,9
    Seq((1L, 1.00), (2L, 1.50), (3L, 2.00), (4L, 9.99))
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("o_custkey", lit(1L)).withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderdate",
        lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = operators.Profiling.q114Benford(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toList
    def exp(d: Int) = BigDecimal(4 * math.log10(1.0 + 1.0 / d))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(r => (r._1, r._2)) === List((1L, 2L), (2L, 1L), (9L, 1L)))
    assert(out.map(_._3) === List(exp(1), exp(2), exp(9)))
    out.foreach(r => assert(r._4 >= 0.0))
  }

  test("WOE bins are equal-count and isolate the high-value failure band") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("woe-orders")
    // prices 1..20, only the two most expensive are 'F' → bin 10 has
    // f_rate 1.0, every other bin 0.0; all bins hold exactly 2 rows
    val rows = (1 to 20).map(i =>
      (i.toLong, i.toDouble, if (i > 18) "F" else "O"))
    rows.toDF("o_orderkey", "o_totalprice", "o_orderstatus")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderdate",
        lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = operators.Profiling.q115WoeBins(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toList
    assert(out.map(_._2) === List.fill(10)(2L))
    assert(out.map(_._4) === (List.fill(9)(0.0) :+ 1.0))
    assert(out.last._5 === 19.0 && out.last._6 === 20.0)
  }

  test("fuzzy join matches within blocks across length bands; blocking excludes cross-brand twins") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("fuzzy-part")
    Seq(
      // same block, dist 1 → match
      (1L, "abcd", "B1", 1), (2L, "abcde", "B1", 1),
      // same block, lens 7 vs 10 straddle the div-4 band edge (bands 1
      // vs 2) — only the adjacent-band explode can find this dist-3 pair
      (3L, "abcdefg", "B1", 2), (4L, "abcdefghij", "B1", 2),
      // identical name, DIFFERENT brand → blocked out by design
      (5L, "abcd", "B2", 1),
      // same block as 1/2 but dist > 3 → filtered
      (6L, "zzzzzzzz", "B1", 1))
      .toDF("p_partkey", "p_name", "p_brand", "p_size")
      .withColumn("p_type", lit("t")).withColumn("p_retailprice", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = operators.TextOps.q121FuzzyJoin(spark, dir)
      .as[(Long, Long, String, String, Long)].collect().toList
    assert(out === List(
      (1L, 2L, "abcd", "abcde", 1L),
      (3L, 4L, "abcdefg", "abcdefghij", 3L)))
    // the banded design must plan as a hash join — never BNLJ/cartesian
    val plan = operators.TextOps.q121FuzzyJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"))
  }

  test("fuzzy join matches brute force exactly on a dense block (PassJoin losslessness)") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("fuzzy-part-big")
    // A single 46-name block (the old guard refused >16) mixing clones,
    // 1–3-char typos, length straddles, and far strings — every segment
    // slot and shift sign of the PassJoin window gets exercised.
    val base = Seq("almond antique blue", "midnight linen rose",
      "goldenrod lace spring", "burnished plum metallic")
    val names = base.zipWithIndex.flatMap { case (n, bi) =>
      Seq(n, n, // clones (dist 0)
        n.replace('a', 'o'), // scattered substitutions
        n.dropRight(2), // suffix deletions (dist 2)
        "xy" + n, // prefix insertions (dist 2)
        n.take(3) + "qqq" + n.drop(6), // mid substitutions (dist 3)
        s"unrelated string $bi zz", // far
        n.reverse, // far
        n.toUpperCase, // far (case = many substitutions)
        n + " xyz") // suffix insertions (dist 4 — just outside)
    } ++ Seq("ab", "abc", "abcf", "zzz") // short-path strings
    val rows = names.zipWithIndex.map { case (n, i) => ((i + 1).toLong, n, "B1", 1) }
    rows.toDF("p_partkey", "p_name", "p_brand", "p_size")
      .withColumn("p_type", lit("t")).withColumn("p_retailprice", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = operators.TextOps.q121FuzzyJoin(spark, dir)
      .as[(Long, Long, String, String, Long)].collect().toList
    val p = spark.read.parquet(s"$dir/part.parquet")
      .select($"p_partkey", $"p_name")
    val brute = p.toDF("key_a", "name_a")
      .crossJoin(p.toDF("key_b", "name_b"))
      .filter($"key_a" < $"key_b" &&
        levenshtein($"name_a", $"name_b") <= 3)
      .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
      .select($"key_a", $"key_b", $"name_a", $"name_b", $"dist")
      .orderBy($"key_a", $"key_b")
      .as[(Long, Long, String, String, Long)].collect().toList
    assert(brute.nonEmpty) // fixture actually plants matches
    assert(got === brute)
  }

  test("regression trend recovers an exact planted line per group") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratch("regr-orders")
    def day(x: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1995, 1, 1).plusDays(x).atStartOfDay())
    // URGENT: y = 2x + 5 exactly (x = 0..4) → slope 2, intercept 5;
    // LOW: constant y = 10 → slope 0, intercept 10
    val rows =
      (0 to 4).map(x => ((x + 1).toLong, day(x), 5.0 + 2 * x, "1-URGENT")) ++
        (0 to 4).map(x => ((x + 10).toLong, day(x), 10.0, "5-LOW"))
    rows.toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority")
      .withColumn("o_custkey", lit(1L)).withColumn("o_orderstatus", lit("O"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = operators.Profiling.q119RegrTrend(spark, dir)
      .as[(String, Long, Double, Double)].collect().toList
    assert(out === List(
      ("1-URGENT", 5L, 2.0, 5.0),
      ("5-LOW", 5L, 0.0, 10.0)))
  }

  test("NFC normalize: combining sequences compose, ASCII takes the zero-copy fast path") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.plans.TextExpressions
    // decomposed e + COMBINING ACUTE (U+0301) composes to U+00E9
    val decomposed = UTF8String.fromString("cafe\u0301 bar")
    val composed = UTF8String.fromString("caf\u00e9 bar")
    assert(TextExpressions.nfc(decomposed) === composed)
    // already-NFC unicode returns the same instance (isNormalized path)
    assert(TextExpressions.nfc(composed) eq composed)
    // pure ASCII returns the same instance without Normalizer involvement
    val ascii = UTF8String.fromString("plain ascii text")
    assert(TextExpressions.nfc(ascii) eq ascii)

    // end to end: all three spellings normalize to the SAME fingerprint
    val dir = TestSpark.scratch("normalize-docs")
    Seq(
      (1L, "Cafe\u0301   Latte", "en", "s", 0L), // decomposed + space run
      (2L, "CAF\u00c9 Latte", "en", "s", 0L), // composed, uppercase
      (3L, "  caf\u00e9\tlatte ", "en", "s", 0L)) // tab + padding
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextOps.q102Normalize(spark, dir)
      .as[(Long, Int, String)].collect().toList
    assert(out.map(_._3).distinct.size === 1)
    assert(out.forall(_._2 === "caf\u00e9 latte".length))
  }

  test("k-anonymity ladder: planted risky combos, strict-< boundary at the ladder rung") {
    import org.apache.spark.sql.functions.lit
    val dir = TestSpark.scratch("kanon-customer")
    // planted QI combo sizes: 1, 3, 7, 25, and EXACTLY 5 \u2014 the k=5 rung
    // must NOT count the 5-member combo (n < k is strict), the k=10 rung
    // must; 25 is risky only at k=50
    val sizes = Seq((1, "A", 1), (1, "B", 3), (2, "A", 7), (2, "B", 25), (3, "C", 5))
    val rows = for {
      ((nat, seg, n), g) <- sizes.zipWithIndex
      i <- 0 until n
    } yield ((g * 100 + i).toLong, s"c$g-$i", nat, seg)
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .withColumn("c_acctbal", lit(0.0))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = Profiling.q131KAnonymity(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out === List(
      (2L, 1L, 1L, 1L),
      (5L, 2L, 4L, 1L),
      (10L, 4L, 16L, 1L),
      (20L, 4L, 16L, 1L),
      (50L, 5L, 41L, 1L)))
  }

  test("q138 fk audit: planted orphans and NULL keys are counted separately") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), // valid, shared key
      (3L, Option(99L)),                    // orphan key 99
      (4L, Option.empty[Long]),             // NULL FK — not an orphan
      (5L, Option(98L)),                    // orphan key 98
      (6L, Option(11L))                     // valid
    ).toDF("id", "fk")
    val parent = Seq(10L, 11L, 12L).toDF("pk")
    val r = Profiling.fkAudit(child, "fk", parent, "pk", "t.fk->p")
      .collect().head
    assert(r.getAs[String]("edge") == "t.fk->p")
    assert(r.getAs[Long]("child_rows") == 6L)
    assert(r.getAs[Long]("child_keys") == 4L) // 10, 99, 98, 11
    assert(r.getAs[Long]("null_rows") == 1L)
    assert(r.getAs[Long]("orphan_rows") == 2L)
    assert(r.getAs[Long]("orphan_keys") == 2L)
  }

  test("q138 fk audit: a clean edge reports zero orphans") {
    val child = Seq((1L, 10L), (2L, 11L)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val r = Profiling.fkAudit(child, "fk", parent, "pk", "clean").collect().head
    assert(r.getAs[Long]("orphan_rows") == 0L && r.getAs[Long]("null_rows") == 0L)
  }

  test("q143 bm25: exact integer scores, tf saturation, length normalization") {
    import graft.operators.TextOps
    val docs = Seq(
      (0L, "apple banana"), // the query doc
      (1L, "apple banana x1 x2"),
      (2L, "apple apple apple apple x3 x4 x5 x6"),
      (3L, "apple b1 b2 b3 b4 b5 b6 b7"),
      (4L, "f1 f2"), (5L, "f3 f4"), (6L, "f5 f6"), (7L, "f7 f8")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Of(docs).as[(Long, Long, Long)].collect().toList
    // replicate the exact integer rational from the scaladoc
    val N = 8L
    val L = 2L + 4 + 8 + 8 + 8 // total corpus tokens
    def idf(df: Long) = java.lang.Long.toBinaryString(N / df).length.toLong - 1
    def term(tf: Long, len: Long, df: Long) =
      (1000L * 22 * L * tf * idf(df)) / (10 * L * tf + 3 * L + 9 * len * N)
    val dfApple = 4L // docs 0,1,2,3
    val dfBanana = 2L // docs 0,1
    val s1 = term(1, 4, dfApple) + term(1, 4, dfBanana)
    val s2 = term(4, 8, dfApple)
    val s3 = term(1, 8, dfApple)
    val expected = List((1L, s1, 2L), (2L, s2, 1L), (3L, s3, 1L))
      .sortBy(t => (-t._2, t._1))
    assert(out == expected)
    // tf saturation: four occurrences are worth less than 4x one
    assert(s2 < 4 * term(1, 8, dfApple))
    // length normalization: same tf in a doc twice as long scores lower
    assert(s3 < term(1, 4, dfApple))
  }

  test("q140 canonicalization: typo chain merges transitively, majority name wins") {
    import graft.operators.TextOps
    // 1-2-3-4 form one entity only through the chain (1 and 3 share no
    // pair); the canonical form is the most frequent variant
    // "blue widget" (2 occurrences); 5 stays a singleton entity.
    val parts = Seq(
      (1L, "blu widget"), (2L, "blue widget"), (3L, "bleu widget"),
      (4L, "blue widget"), (5L, "other thing")
    ).toDF("p_partkey", "p_name")
    val pairs = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("doc_a", "doc_b")
    val out = TextOps.canonicalEntities(parts, pairs)
      .as[(Long, Long, Long, String)].collect().toList
    assert(out == List(
      (1L, 4L, 3L, "blue widget"), // entity 1: members 1-4, 3 variants
      (5L, 1L, 1L, "other thing")))
  }

  test("q140 canonicalization: frequency tie breaks to the smaller string") {
    import graft.operators.TextOps
    val parts = Seq((1L, "beta"), (2L, "alpha")).toDF("p_partkey", "p_name")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = TextOps.canonicalEntities(parts, pairs)
      .as[(Long, Long, Long, String)].collect().toList
    assert(out == List((1L, 2L, 2L, "alpha")))
  }

  test("q152 mrr eval: planted near-dup partners rank first") {
    import graft.operators.TextOps
    def long(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val shared = long("w", 60)
    val docs = Seq(
      (1L, shared + " extraA"), // near-dup pair (Jaccard well above 0.5):
      (2L, shared + " extraB"), // each member must retrieve the other at rank 1
      (3L, long("x", 60)), // distractors with disjoint vocabulary score no
      (4L, long("y", 60))) // shared term and never enter the ranking
      .toDF("doc_id", "text")
    val r = TextOps.mrrEvalOf(docs).collect().head
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Long]("hits_at_1") == 2L)
    assert(r.getAs[Long]("hits_at_10") == 2L)
    assert(r.getAs[Double]("mrr") == 1.0)
  }

  test("q146 bucket diff flags exactly the buckets holding planted drift") {
    import graft.operators.Profiling
    // Derive the expected report from the planted-drift rules directly:
    // buckets with a dropped key (%997) must be count_diff; buckets whose
    // only perturbation is a price shift (%991) must be content_diff;
    // nothing else may appear.
    val keys = Tables(spark, TestSpark.sf).orders
      .select($"o_orderkey").as[Long].collect()
    val dropped = keys.filter(_ % 997 == 0).map(_ % 4096).toSet
    val shifted = keys.filter(k => k % 991 == 0 && k % 997 != 0)
      .map(_ % 4096).toSet
    val expected = dropped.map(_ -> "count_diff").toMap ++
      (shifted -- dropped).map(_ -> "content_diff").toMap
    val got = Profiling.q146BucketDiff(spark, TestSpark.sf).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[String]("status")).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // count deltas reconcile: total missing rows == number of dropped keys
    val rows = Profiling.q146BucketDiff(spark, TestSpark.sf).collect()
    val missing = rows.map(r => r.getAs[Long]("n_a") - r.getAs[Long]("n_b")).sum
    assert(missing == keys.count(_ % 997 == 0))
  }

  test("q156 mutual info: exact powers-of-two, independence zero, q12 precision") {
    import graft.operators.Profiling
    // perfectly dependent 2x2: each diagonal cell has lift 2 -> log2 exactly
    // 4096 in q12; total MI = 1 bit (0.5 + 0.5)
    val dep = (Seq.fill(5)(("A", "A")) ++ Seq.fill(5)(("B", "B")))
      .toDF("xcat", "ycat")
    val depRows = Profiling.mutualInfoOf(dep, "xcat", "ycat").collect()
    depRows.foreach { r =>
      assert(r.getAs[Long]("mi_q12") == r.getAs[Long]("n") * 4096L)
      assert(r.getAs[Double]("mi_bits") == 0.5)
    }
    // independent 2x2 (all lifts exactly 1) -> every contribution exactly 0
    val ind = (for (x <- Seq("A", "B"); y <- Seq("C", "D"); _ <- 1 to 3)
      yield (x, y)).toDF("xcat", "ycat")
    Profiling.mutualInfoOf(ind, "xcat", "ycat").collect()
      .foreach(r => assert(r.getAs[Long]("mi_q12") == 0L))
    // non-power lifts: 3 and 1.5 land within 2 LSB of the true q12 log2
    val mix = (Seq.fill(3)(("A", "A")) ++ Seq.fill(6)(("B", "B")))
      .toDF("xcat", "ycat")
    val byCell = Profiling.mutualInfoOf(mix, "xcat", "ycat").collect()
      .map(r => r.getAs[String]("xcat") -> r).toMap
    def q12(lift: Double) = math.log(lift) / math.log(2.0) * 4096
    assert(math.abs(byCell("A").getAs[Long]("mi_q12") / 3L - q12(3.0)) <= 2)
    assert(math.abs(byCell("B").getAs[Long]("mi_q12") / 6L - q12(1.5)) <= 2)
  }

  test("q160 fd audit: planted keys, violations counted per determinant value") {
    import graft.operators.Profiling
    // k is a key (k -> v, k -> c hold); v -> k fails on the repeated v=10
    // (two distinct k) but v=20 maps cleanly; c is constant so * -> c
    // holds and c -> * fails with exactly one (the only) violating value
    val df = Seq((1L, 10L, "x"), (2L, 10L, "x"), (3L, 20L, "x"))
      .toDF("k", "v", "c")
    val out = Profiling.fdAuditOf(df, Seq("k", "v", "c")).collect()
      .map(r => (r.getAs[String]("det"), r.getAs[String]("dep")) -> r).toMap
    assert(out.size == 6)
    assert(out(("k", "v")).getAs[Boolean]("holds"))
    assert(out(("k", "c")).getAs[Boolean]("holds"))
    assert(out(("v", "c")).getAs[Boolean]("holds"))
    val vk = out(("v", "k"))
    assert(!vk.getAs[Boolean]("holds"))
    assert(vk.getAs[Long]("n_det_values") == 2L && vk.getAs[Long]("n_violating") == 1L)
    val ck = out(("c", "k"))
    assert(!ck.getAs[Boolean]("holds"))
    assert(ck.getAs[Long]("n_det_values") == 1L && ck.getAs[Long]("n_violating") == 1L)
    assert(!out(("c", "v")).getAs[Boolean]("holds"))
  }

  test("q161 bpe merges: hand-counted pairs, tie order, share arithmetic") {
    import graft.operators.TextOps
    val dir = TestSpark.scratch("bpe-merge-docs")
    // words: "abab" -> ab,ba,ab ; "ab" -> ab ; "cd" -> cd ; "x" -> none
    // counts: ab=3, ba=1, cd=1 (ba/cd tie -> "ba" after "cd"? string asc:
    // "ba" < "cd") ; positions total = 5
    Seq((1L, "abab ab"), (2L, "cd x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextOps.q161BpeMerges(spark, dir)
      .as[(Long, String, Long, Double)].collect().toList
    assert(out == List(
      (1L, "ab", 3L, 3.0 / 5),
      (2L, "ba", 1L, 1.0 / 5),
      (3L, "cd", 1L, 1.0 / 5)))
  }

  test("q162 langid eval: planted confusion cells with exact row shares") {
    import graft.operators.TextOps
    val dir = TestSpark.scratch("langid-eval-docs")
    // disjoint vocabularies -> the self-trained profiles separate
    // perfectly, so the confusion matrix is exactly diagonal; the empty
    // doc has no trigrams and lands in the 'und' column of its row
    Seq(
      (1L, "the cat sat on the mat near the door", "en"),
      (2L, "a dog and the cat", "en"),
      (3L, "foo bar baz foo bar", "xx"),
      (4L, "qux quux corge foo baz", "xx"),
      (5L, "", "xx"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q162LangIdEval(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toList
    assert(out == List(
      ("en", "en", 2L, 2L, 1.0),
      ("xx", "und", 1L, 3L, 1.0 / 3),
      ("xx", "xx", 2L, 3L, 2.0 / 3)))
  }

  test("textcat shows diagonal dominance on per-language vocabulary (accuracy > 0.9)") {
    import graft.operators.TextOps
    // three languages, disjoint 12-word vocabularies, 12 docs each with
    // deterministic word draws — the trainable-label regime the driver
    // corpus (synthetic labels) never provides. Self-trained ranked
    // trigram profiles must recover essentially every label.
    val vocab = Map(
      "en" -> Seq("the", "cat", "sat", "mat", "dog", "ran", "house", "tree",
        "water", "small", "green", "quickly"),
      "de" -> Seq("der", "hund", "katze", "haus", "baum", "wasser", "klein",
        "schnell", "gruen", "lief", "sass", "matte"),
      "fr" -> Seq("le", "chat", "chien", "maison", "arbre", "eau", "petit",
        "vite", "vert", "courut", "assis", "tapis"))
    val docs = for {
      (lang, words) <- vocab.toSeq
      d <- 0 until 12
    } yield {
      val text = (0 until 20).map(i => words((d * 7 + i * 3) % words.length))
        .mkString(" ")
      (lang.hashCode.toLong * 100 + d, text, lang)
    }
    val pred = TextOps.textcatOf(docs.toDF("doc_id", "text", "lang"))
    val truth = docs.toDF("doc_id", "text", "lang").select($"doc_id", $"lang")
    val correct = pred.join(truth, "doc_id")
      .filter($"lang_pred" === $"lang").count()
    assert(correct.toDouble / docs.size > 0.9,
      s"accuracy ${correct.toDouble / docs.size} on planted vocab")
  }

  test("q140 thin edges: star contraction keeps components, drops C(m,2) volume") {
    import graft.operators.TextOps
    import org.apache.spark.sql.functions._
    // A 6-member clone family + a typo neighbor: the full q121 pair
    // expansion emits C(6,2)=15 clone pairs + 6 typo pairs = 21 edges;
    // the star contraction must emit (6-1) star edges + 1 rep-rep edge
    // and produce IDENTICAL canonicalization output.
    val parts = ((1L to 6L).map(k => (k, "blue widget")) :+ (7L, "blu widget"))
      .toDF("p_partkey", "p_name")
    val dir = TestSpark.scratch("thin-edges")
    parts.select($"p_partkey", lit("B").as("p_brand"), lit(1).as("p_size"),
        $"p_name", lit(0.0).as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val full = TextOps.fuzzyJoin(spark, dir)
    val thin = TextOps.fuzzyMatchEdges(spark, dir)
    assert(full.count() == 21L) // 15 clone pairs + 6 typo pairs
    assert(thin.count() == 6L) // 5 star edges + 1 rep-rep edge
    val fromFull = TextOps.canonicalEntities(
      parts, full.select($"key_a".as("doc_a"), $"key_b".as("doc_b")))
      .as[(Long, Long, Long, String)].collect().toList
    val fromThin = TextOps.canonicalEntities(parts, thin)
      .as[(Long, Long, Long, String)].collect().toList
    assert(fromThin == fromFull)
    assert(fromThin == List((1L, 7L, 2L, "blue widget")))
  }

  test("q165 fd discovery: exact survivors only, agrees with the exhaustive audit") {
    // id -> grp holds; grp -> val violated in group "a" only; id is a key
    // (all id -> * hold); nothing with determinant grp or val holds.
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"), (4L, "b", "z"))
      .toDF("id", "grp", "vl")
    val cols = Seq("id", "grp", "vl")
    val got = Profiling.fdDiscoverOf(df, cols)
      .as[(String, String, Long)].collect().toList
    assert(got == List(
      ("id", "grp", 4L), ("id", "vl", 4L), ("vl", "grp", 3L)))
    // cross-check: exactly the holds=true rows of the exhaustive q160 audit
    val audit = Profiling.fdAuditOf(df, cols)
      .filter($"holds").select($"det", $"dep", $"n_det_values")
      .as[(String, String, Long)].collect().toList
    assert(got == audit)
  }

  test("q168 PSI: identical halves score exactly zero") {
    // same cents multiset on both sides of the midpoint (secs 0..49 vs
    // 50..99) → every bin's p0 == p1 → every psi term is exactly 0
    val ev = (0 until 50).flatMap(i => Seq(
      ("a", i * 20L, i.toLong), ("a", i * 20L, 50L + i)))
      .toDF("event_type", "cents", "sec")
    val out = Profiling.psiOf(ev).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("psi_q12") == 0L))
    assert(out.forall(_.getAs[Long]("psi_total_q12") == 0L))
  }

  test("q168 PSI: a full distribution shift scores far above the 0.25 gate") {
    // first half all-low, second half all-high: mass moves 10 bins,
    // PSI in bits ≈ 2 · log2(1e6) ≈ 40 ≫ the conventional 0.25 alarm
    val ev = (0 until 50).flatMap(i => Seq(
      ("b", 0L, i.toLong), ("b", 999L, 50L + i)))
      .toDF("event_type", "cents", "sec")
    val out = Profiling.psiOf(ev).collect()
    val bits = out.head.getAs[Double]("psi_bits")
    assert(bits > 10.0, s"psi_bits = $bits")
    // and the per-bin ledger names the movers: bin 0 lost, bin 9 gained
    val byBin = out.map(r => r.getAs[Long]("bin") ->
      (r.getAs[Long]("c0"), r.getAs[Long]("c1"))).toMap
    assert(byBin(0L) == (50L, 0L) && byBin(9L) == (0L, 50L))
  }

  test("q168 PSI: an event type wholly inside one half saturates, not crashes") {
    // type "a" spans both halves; type "c" exists only in the first —
    // the fuzz-found t1 = 0 case. The empty half reads 1 ppm per bin
    // (the same floor empty bins get), so "c" scores maximal drift.
    val ev = (0 until 50).flatMap(i => Seq(
      ("a", i * 20L, i.toLong), ("a", i * 20L, 50L + i),
      ("c", 100L, i.toLong)))
      .toDF("event_type", "cents", "sec")
    val out = Profiling.psiOf(ev).collect()
    val cRows = out.filter(_.getAs[String]("event_type") == "c")
    assert(cRows.nonEmpty)
    assert(cRows.forall(_.getAs[Long]("p1_ppm") == 1L))
    assert(cRows.head.getAs[Double]("psi_bits") > 10.0)
    // the spanning type is untouched by the guard
    assert(out.filter(_.getAs[String]("event_type") == "a")
      .forall(_.getAs[Long]("psi_q12") == 0L))
  }

  test("q176 fertility: micro-averaged exact quotients per language") {
    // en: "hello world" → BPE tokens ["hello", " world"], 2 words, 11
    // chars; de: "abc123 x" → ["abc", "123", " x"], 2 words, 8 chars.
    val docs = Seq(
      (0L, "hello world", "en", "src", 1L),
      (1L, "abc123 x", "de", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.TextOps.tokenizerFertilityOf(docs).collect().toList
    val byLang = out.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("total_chars"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("total_words"), r.getAs[Double]("chars_per_token"),
        r.getAs[Double]("tokens_per_word"))).toMap
    assert(byLang("en") == ((11L, 2L, 2L, 5.5, 1.0)))
    assert(byLang("de") == ((8L, 3L, 2L, 8.0 / 3.0, 1.5)))
  }

  test("q177 hapax profile: Good-Turing mass counts singletons per language") {
    // en: tokens a a b → vocab 2, hapax 1 (b), dis 1 (a), N=3;
    // de reuses the term "a" but is counted in its own slice.
    val docs = Seq(
      (0L, "a a b", "en", "src", 1L),
      (1L, "a c c c", "de", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.TextOps.hapaxProfileOf(docs).collect().toList
    val byLang = out.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("vocab"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("hapax"), r.getAs[Long]("dis"),
        r.getAs[Double]("gt_unseen_mass"))).toMap
    assert(byLang("en") == ((2L, 3L, 1L, 1L, 1.0 / 3.0)))
    assert(byLang("de") == ((2L, 4L, 1L, 0L, 0.25)))
  }

  test("q173 zipf fit matches a double-precision OLS within fixed-point accuracy") {
    // planted counts 16/8/4/2/1: exact powers of two, ranks 1..5; the
    // fixed-point log2 is within 2^-12 per point, so the slope must sit
    // within ~1e-3 of the libm OLS on the same (rank, cnt) pairs.
    val words =
      Seq.fill(16)("t1") ++ Seq.fill(8)("t2") ++ Seq.fill(4)("t3") ++
        Seq.fill(2)("t4") ++ Seq("t5")
    val docs = Seq((0L, words.mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = Profiling.zipfFitOf(docs).collect().head
    assert(row.getAs[Long]("n_terms") == 5L)
    val pts = Seq((1.0, 16.0), (2.0, 8.0), (3.0, 4.0), (4.0, 2.0), (5.0, 1.0))
      .map { case (r, c) => (math.log(r) / math.log(2), math.log(c) / math.log(2)) }
    val n = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val got = row.getAs[Double]("slope")
    assert(math.abs(got - want) < 1e-3, s"slope $got vs $want")
    assert(got < -1.0 && got > -2.5)
  }

  test("q190 repetition ratio: hand-computed dup trigram shares; sub-3-token docs drop") {
    import graft.operators.TextOps
    val docs = Seq(
      1L -> "a b c d",                    // 2 trigrams, both unique
      2L -> "x y x y x y x y x y",       // 8 trigrams, all in dup groups
      3L -> "w1 w2 w3 w1 w2 w3 w9",      // 5 trigrams, [w1 w2 w3] ×2
      4L -> "a b",                        // <3 tokens → no row
      5L -> "s s s s s s s s"             // single-token repetition → 1.0
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionRatioOf(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L) == (2L, 0L, 0.0))
    assert(got(2L) == (8L, 8L, 1.0))
    assert(got(3L) == (5L, 2L, 0.4))
    assert(got(5L) == (6L, 6L, 1.0))
  }

  test("q190 row-local singleton counting equals the grouped (doc, gram) aggregate on random text") {
    import graft.operators.TextOps
    import org.apache.spark.sql.functions.{explode, expr, sum, when}
    // independent oracle: the DuckDB twin's grouped math, in Spark
    val rnd = new scala.util.Random(190)
    val docs = (0L until 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(40) + 3)(
        s"w${rnd.nextInt(6)}").mkString(" ")
    }.toDF("doc_id", "text")
    val rowLocal = TextOps.repetitionRatioOf(docs)
      .as[(Long, Long, Long, Double)].collect().toSet
    val grouped = docs
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(split(text, ' ')) - 2), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")).as("g"))
      .groupBy($"doc_id", $"g").count()
      .groupBy($"doc_id")
      .agg(sum($"count").as("n_grams"),
        sum(when($"count" > 1, $"count").otherwise(0L)).as("dup_grams"))
      .select($"doc_id", $"n_grams", $"dup_grams",
        ($"dup_grams".cast("double") / $"n_grams").as("dup_ratio"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(rowLocal == grouped)
  }

  test("q191 PII density: planted matches count, near-misses do not, clean docs drop") {
    import graft.operators.TextOps
    val docs = Seq(
      1L -> ("reach j.doe+spam@ex-ample.org or admin@site.io now " +
        "call 555-123-4567 id 123-45-6789 host 10.0.0.255"),
      2L -> "bad@nodot num 123-456-789 ver 1.2.3 plain words only",
      3L -> "two mails a@b.co c@d.org and twin phones 555-000-1111 555-000-2222",
      4L -> ""
    ).toDF("doc_id", "text")
    val got = TextOps.piiDensityOf(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    // doc 2: TLD-less email, 3-3-3 number, 3-part version — all misses;
    // doc 4 empty: both drop (pii_total = 0)
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == (2L, 1L, 1L, 1L, 5L))
    assert(got(3L) == (2L, 2L, 0L, 0L, 4L))
  }

  test("q191 contact cards: every card phones once, modular email/ip/ssn legs, near-misses and c_name contribute zero") {
    import graft.operators.TextOps
    // keys picked to cover every residue combination incl. 105 ≡ 0
    // mod 3, 5 AND 7 (all four patterns on one card)
    val keys = Seq(0L, 1L, 3L, 5L, 7L, 15L, 21L, 35L, 105L)
    val customers = keys.map(k => (k, f"Customer#$k%09d"))
      .toDF("c_custkey", "c_name")
    val cards = TextOps.contactCards(customers)
    val got = TextOps.piiDensityOf(cards)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    // every card appears (phone ⇒ pii_total ≥ 1) at id base + key
    assert(got.keySet == keys.map(_ + 100000000L).toSet)
    keys.foreach { k =>
      val (em, ph, ss, ip) = got(k + 100000000L)
      // exactly one phone per card, and the 3-3-4 group never
      // double-counts as an SSN (nor the ssn leg as a phone): the
      // ssn count is purely the modular leg
      assert(ph == 1L, s"key $k phones")
      assert(em == (if (k % 3 == 0) 1L else 0L), s"key $k emails")
      assert(ip == (if (k % 5 == 0) 1L else 0L), s"key $k ips")
      assert(ss == (if (k % 7 == 0) 1L else 0L), s"key $k ssns")
    }
    // the engine-side and oracle-side card builders emit the same text:
    // parity of the leg ITSELF, not just of the counts downstream
    val sqlCards = {
      customers.createOrReplaceTempView("customer")
      try spark.sql(TextOps.contactCardsSql
        .replace("VARCHAR", "STRING")) // Spark parser accepts STRING
        .as[(Long, String)].collect().toSet
      finally spark.catalog.dropTempView("customer")
    }
    assert(cards.as[(Long, String)].collect().toSet == sqlCards)
  }

  test("CharNgrams byte-scan kernel matches the HOF construction it replaced (padded trigrams and raw bigrams)") {
    import org.apache.spark.sql.functions._
    // the exact edge battery the kernel's token walk must survive: empty
    // text, 1-char words, consecutive/leading/trailing spaces (empty
    // tokens), and multi-byte codepoints (substring counts CHARS)
    val texts = Seq(
      "", " ", "a", "ab", "hello world", "a b c",
      "  double  spaces  ", "trail ", " lead",
      "héllo wörld", "日本語 テスト x", "one"
    ).toDF("text")
    val hofTri = texts.select(
      expr("""flatten(transform(
           |  filter(split(text, ' '), w -> length(w) >= 1),
           |  w -> transform(sequence(1, length(w)),
           |    i -> substring('_' || w || '_', i, 3))))""".stripMargin)
        .as("hof"),
      graft.plans.TextExpressions.paddedCharTrigrams(col("text"))
        .as("native"))
    hofTri.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"padded trigrams diverge: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    val hofBi = texts.select(
      expr("""flatten(transform(
           |  filter(split(text, ' '), w -> length(w) >= 2),
           |  w -> transform(sequence(0, length(w) - 2),
           |    i -> substring(w, i + 1, 2))))""".stripMargin)
        .as("hof"),
      graft.plans.TextExpressions.charBigrams(col("text")).as("native"))
    hofBi.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"bigrams diverge: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("ArrayWordNgrams and SortedSingletonCount kernels match the HOF constructions they replaced") {
    import org.apache.spark.sql.functions._
    val texts = Seq(
      "", "a", "a b", "a b c", "a b c d e f g",
      "x x x x x", "one two one two one two",
      "  gaps  between  ", "héllo wörld ünïcode tokens here"
    ).toDF("text").select(split(col("text"), " ").as("t"))
    // n = 5 (SpanN) and n = 3: window text must equal the interpreted
    // transform+slice+concat_ws chain element for element
    for (n <- Seq(3, 5)) {
      val cmp = texts.select(
        expr(s"""IF(size(t) >= $n,
             |  transform(sequence(1, size(t) - ${n - 1}),
             |    i -> concat_ws(' ', slice(t, i, $n))),
             |  CAST(array() AS ARRAY<STRING>))""".stripMargin).as("hof"),
        graft.plans.TextExpressions.arrayWordNgrams(col("t"), n).as("native"))
      cmp.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n windows diverge: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
    // singleton count over the sorted trigram array must equal the
    // neighborhood-lambda count (incl. the empty-array case)
    val sgl = texts.select(
      array_sort(graft.plans.TextExpressions.arrayWordNgrams(col("t"), 3))
        .as("gs"))
      .select(
        expr("""CAST(IF(size(gs) = 0, 0,
             |  size(filter(sequence(0, size(gs) - 1), i ->
             |    (i = 0 OR gs[i - 1] <> gs[i])
             |    AND (i = size(gs) - 1 OR gs[i + 1] <> gs[i])))) AS BIGINT)"""
          .stripMargin).as("hof"),
        graft.plans.TextExpressions.sortedSingletonCount(col("gs"))
          .as("native"))
    sgl.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"singleton counts diverge: ${r.getLong(0)} vs ${r.getLong(1)}")
    }
  }
}
