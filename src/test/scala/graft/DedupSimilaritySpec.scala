package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps}

/** Planted-fixture specs for the engine-hash operators (minhash / simhash /
  * IVF) that the DuckDB oracle can't cross-check: known duplicates must
  * surface, known non-duplicates must not, and ANN must agree with the
  * exact baseline on a clustered fixture.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** documents fixture: doc0 base, doc1 = near-dup (2 words changed),
    * doc2 = exact copy of doc0, doc3/doc4 = unrelated.
    */
  private lazy val docDir: String = {
    val dir = TestSpark.scratch("dedup-docs")
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 30).map(i => s"tok$i") ++ Seq("CHANGED_A", "CHANGED_B") ++
      (33 to 60).map(i => s"tok$i")).mkString(" ")
    val other1 = (100 to 160).map(i => s"alt$i").mkString(" ")
    val other2 = (200 to 260).map(i => s"zed$i").mkString(" ")
    Seq(
      (0L, base, "en", "src", base.length.toLong),
      (1L, near, "en", "src", near.length.toLong),
      (2L, base, "en", "src", base.length.toLong),
      (3L, other1, "en", "src", other1.length.toLong),
      (4L, other2, "en", "src", other2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** embeddings fixture: 3 orthogonal-ish clusters, label = cluster id;
    * 8 dims, 10 vectors per cluster. vec 0 is the ANN query.
    */
  private lazy val embDir: String = {
    val dir = TestSpark.scratch("sim-emb")
    val rows = for {
      cluster <- 0 until 3
      i <- 0 until 10
    } yield {
      val base = Array.fill(8)(0.05f * ((cluster * 10 + i) % 3))
      base(cluster) = 10.0f
      base((cluster + 4) % 8) = 1.0f + 0.1f * i
      ((cluster * 10 + i).toLong, base.toSeq, cluster)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("exact dedup groups the identical pair and keeps the smallest id") {
    val out = DedupOps.q19DedupExact(spark, docDir).collect()
    assert(out.length == 4) // 5 docs, one exact-dup pair
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 0L)
  }

  test("ngram jaccard surfaces the near-dup pair and not the unrelated ones") {
    val pairs = DedupOps.q20NgramJaccard(spark, docDir)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 2L))) // exact copy → jaccard 1.0
    assert(keys.contains((0L, 1L)) && keys.contains((1L, 2L))) // near-dups
    assert(!keys.exists(k => k._1 == 3L || k._2 == 3L))
    assert(pairs.find(p => (p._1, p._2) == (0L, 2L)).get._3 == 1.0)
  }

  test("minhash-LSH finds the planted near-dups after exact verification") {
    val pairs = DedupOps.q21MinhashLsh(spark, docDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("connected components label every vertex with its component minimum") {
    // chain 2–3–4 has diameter 2 (exercises a multi-round fixpoint);
    // 1 and 5 are singletons
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
    val edges = Seq((2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 5L))
  }

  test("pointer doubling closes a diameter-200 chain in O(log d) rounds") {
    // A sequential-edit dup family: 201 docs in a path 100..300, diameter
    // 200. Plain min-propagation needs 200 rounds and would trip the
    // maxIter=20 require; propagate+shortcut must converge with the label
    // reach doubling every round (2^8 > 200 → <= ~9 rounds).
    val verts = (100L to 300L).toDF("v")
    val edges = (100L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 201 && labels.values.forall(_ == 100L))
    assert(DedupOps.lastCcRounds <= 10,
      s"expected O(log d) rounds, got ${DedupOps.lastCcRounds}")
  }

  test("dup clustering is transitive and counts singletons as their own cluster") {
    val out = DedupOps.q65DupClusters(spark, docDir)
      .as[(Long, Long, Long)].collect().toList
    // docs 0/1/2 are the planted near-dup family → one cluster labeled 0
    assert(out === List((0L, 0L, 3L), (1L, 0L, 3L), (2L, 0L, 3L),
      (3L, 3L, 1L), (4L, 4L, 1L)))
  }

  test("cluster representatives pick the higher-quality member over the smaller id") {
    val dir = TestSpark.scratch("dedup-reps")
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    // doc 10 = base plus stopword padding (quality penalized by the
    // stopword ratio); doc 11 = clean base (quality 1.0). They are
    // near-dups, and the rep must be 11 DESPITE the larger doc_id.
    val padded = base + " the the the the"
    Seq(
      (10L, padded, "en", "src", padded.length.toLong),
      (11L, base, "en", "src", base.length.toLong),
      (12L, (1 to 61).map(i => s"alt$i").mkString(" "), "en", "src", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val reps = DedupOps.q68ClusterReps(spark, dir)
      .select($"cluster_id", $"cluster_size", $"rep_doc_id")
      .as[(Long, Long, Long)].collect().toList
    assert(reps === List((10L, 2L, 11L), (12L, 1L, 12L)))
  }

  test("keep-first LSH dedup keeps sub-3-word documents unconditionally") {
    val dir = TestSpark.scratch("dedup-short")
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    Seq(
      (0L, base, "en", "src", base.length.toLong),
      (1L, base, "en", "src", base.length.toLong), // exact dup → dropped
      (2L, "hi", "en", "src", 2L), // 1 word: no shingles, must survive
      (3L, "two words", "en", "src", 9L),
      (4L, "", "en", "src", 0L)) // empty text must survive too
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = DedupOps.q64KeepFirstDedup(spark, dir).as[Long].collect().toSet
    assert(kept === Set(0L, 2L, 3L, 4L))
  }

  test("incremental dedup: corpus partner wins, then batch-first, short docs kept") {
    val dir = TestSpark.scratch("dedup-incr")
    def txt(tag: String) = (1 to 60).map(i => s"$tag$i").mkString(" ")
    // 16 docs → split = floor(0.8·16) = 12; batch = {12..15}.
    // 12 = copy of corpus doc 3 → dup_of_corpus(3); 13 = new text →
    // kept; 14 = copy of 13 → dup_in_batch(13); 15 = 1 word → kept.
    // Corpus-internal dup pair (5,6) must not surface in the output.
    val rows = (0 to 11).map(i => (i.toLong, if (i == 6) txt("u5_") else txt(s"u${i}_"))) ++
      Seq((12L, txt("u3_")), (13L, txt("new_")), (14L, txt("new_")), (15L, "hi"))
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.q77IncrementalDedup(spark, dir)
      .select($"doc_id", $"verdict", $"partner")
      .as[(Long, String, Option[Long])].collect().toList
    assert(out === List(
      (12L, "dup_of_corpus", Some(3L)),
      (13L, "kept", None),
      (14L, "dup_in_batch", Some(13L)),
      (15L, "kept", None)))
  }

  test("prefix families split exact-dup and partial-dup variants") {
    val dir = TestSpark.scratch("dedup-prefix")
    val pre = (1 to 20).map(i => s"p$i").mkString(" ")
    val full = (1 to 20).map(i => s"q$i").mkString(" ") + " " +
      (1 to 10).map(i => s"same$i").mkString(" ")
    Seq(
      (0L, pre + " tailA tailA2 tailA3 tailA4 tailA5"), // partial-dup pair:
      (1L, pre + " tailB tailB2 tailB3 tailB4 tailB5"), // same prefix, 2 variants
      (2L, full), (3L, full),                           // exact-dup pair: 1 variant
      (4L, (1 to 25).map(i => s"solo$i").mkString(" ")), // unique → no row
      (5L, (1 to 19).map(i => s"p$i").mkString(" ")))   // <20 words → out of scope
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.q82PrefixDup(spark, dir)
      .select($"doc_id", $"family_id", $"family_size", $"n_variants")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out === List(
      (0L, 0L, 2L, 2L), (1L, 0L, 2L, 2L),
      (2L, 2L, 2L, 1L), (3L, 2L, 2L, 1L)))
  }

  test("simhash: identical docs collide; near-dups are close in Hamming distance") {
    val sig = DedupOps.q22Simhash(spark, docDir)
      .as[(Long, Long)].collect().toMap
    assert(sig(0L) == sig(2L))
    val hammingNear = java.lang.Long.bitCount(sig(0L) ^ sig(1L))
    val hammingFar = java.lang.Long.bitCount(sig(0L) ^ sig(3L))
    assert(hammingNear <= 8, s"near-dup hamming $hammingNear")
    assert(hammingFar > hammingNear, s"far $hammingFar vs near $hammingNear")
  }

  test("prefix-filtered candidate path returns exactly the plain capped-join pairs") {
    val docs = graft.Tables(spark, docDir).documents
    for (t <- Seq(0.2, 0.5)) {
      val plain = DedupOps.jaccardPairs(docs, t)
        .as[(Long, Long, Double)].collect().toSeq
      val prefixed = DedupOps.jaccardPairs(docs, t, prefixFilter = true)
        .as[(Long, Long, Double)].collect().toSeq
      assert(plain == prefixed, s"threshold $t")
      assert(plain.nonEmpty)
    }
  }

  test("engine-hash (xxhash64) minhash/simhash behave like the portable family") {
    val pairs = DedupOps.minhashLsh(spark, docDir, portable = false)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val sig = DedupOps.simhash(spark, docDir, portable = false)
      .as[(Long, Long)].collect().toMap
    assert(sig(0L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(0L) ^ sig(1L)) <
      java.lang.Long.bitCount(sig(0L) ^ sig(3L)))
  }

  test("ANN brute force ranks the query's own cluster first") {
    val top = SimilarityOps.q24AnnBrute(spark, embDir)
      .select($"vec_id").as[Long].collect().toSeq
    assert(top.take(9).forall(_ < 10), s"top-9 should be cluster 0: $top")
  }

  test("q25 lookup plan probes a precomputed index — no centroid build in-query") {
    val plan = SimilarityOps.q25AnnIvf(spark, embDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("posexplode"), "centroid build leaked into the lookup plan")
    assert(plan.contains("ivf-index"), "lookup should scan the persisted index artifact")
  }

  test("IVF probe of 2 cells reaches full recall vs the exact baseline") {
    val brute = SimilarityOps.q24AnnBrute(spark, embDir)
      .select($"vec_id").as[Long].collect().take(10).toSet
    val ivf = SimilarityOps.q25AnnIvf(spark, embDir)
      .select($"vec_id").as[Long].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("embedding near-dup finds same-cluster high-cosine pairs only") {
    val out = SimilarityOps.q23EmbedNearDup(spark, embDir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, b) => a / 10 == b / 10 }) // blocked by cluster
  }

  test("q23 refuses an oversized block and points at the LSH path") {
    val err = intercept[IllegalArgumentException] {
      SimilarityOps.embedNearDup(spark, embDir, maxBlock = 5) // clusters hold 10
    }
    assert(err.getMessage.contains("LSH"))
  }

  test("contamination flags exactly the docs at/over the shared-shingle threshold") {
    val dir = TestSpark.scratch("contam-docs")
    val bench = "b1 b2 b3 b4 b5" // benchmark shingles: b1b2b3, b2b3b4, b3b4b5
    Seq(
      (0L, bench, "en", "s", 1L),                     // benchmark side (doc_id < 5)
      (1L, "f1 f2 f3 f4", "en", "s", 1L),             // filler benchmark, unrelated
      (10L, bench, "en", "s", 1L),                    // shares 3 → flagged
      (11L, "b1 b2 b3 b4 x1", "en", "s", 1L),         // shares 2 → below threshold
      (12L, "z1 z2 z3 z4 z5", "en", "s", 1L))         // shares 0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.q49Contamination(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 3L))
  }

  test("repetition score: planted repetitive doc scores its top-trigram share") {
    val dir = TestSpark.scratch("repetition-docs")
    Seq(
      // "x y x y x y x y": 6 trigram occurrences, "x y x" ×3 → share 0.5
      (0L, "x y x y x y x y", "en", "s", 1L),
      // all-distinct trigrams: top share = 1/3
      (1L, "a b c d e", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextOps.q50Repetition(spark, dir)
      .select($"doc_id", $"top_cnt", $"n_tri", $"top_share")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(out(0L) == ((3L, 6L, 0.5)))
    // unrounded exact-int ratio (identical doubles in both engines —
    // see the moneyAvg no-round rationale in Relational)
    assert(out(1L) == ((1L, 3L, 1.0 / 3)))
  }

  test("PQ codebook is M x K codewords of subspace length, built offline") {
    import spark.implicits._
    val e = Tables(spark, TestSpark.sf).embeddings
    val k = e.select($"label").distinct().count()
    val cb = SimilarityOps.buildPqCodebook(e)
    assert(cb.count() === 8 * math.min(k, 16)) // M=8 subspaces x one codeword per trained cell (K capped at 16)
    assert(cb.select(size($"cb")).distinct().as[Int].collect().toSeq === Seq(8))
  }

  test("PQ ADC retrieval finds the planted cluster exactly on structured data") {
    import spark.implicits._
    // 3 well-separated clusters of 12: center j concentrates mass on
    // dims [j*21, j*21+21) with a small deterministic per-member wobble
    val vecs = for (j <- 0 until 3; i <- 0 until 12) yield {
      val emb = Array.tabulate(64) { d =>
        val base = if (d >= j * 21 && d < j * 21 + 21) 1.0f else 0.0f
        base + 0.05f * math.sin(1.0 + i * 64 + d).toFloat
      }
      ((j * 12 + i).toLong, j, emb)
    }
    val e = vecs.toDF("vec_id", "label", "embedding")
    val top = SimilarityOps.annPq(e, SimilarityOps.buildPqCodebook(e), queryId = 0L, k = 11)
      .select($"vec_id").as[Long].collect().toSet
    // the query's 11 fellow cluster-0 members, nothing cross-cluster
    assert(top === (1L to 11L).toSet)
  }

  test("PQ top-10 carries real signal on the unclustered fixture corpus") {
    import spark.implicits._
    // the fixture's labels are not cosine clusters (exact neighbours of
    // vec 0 span ~8 labels at cosine ~0.3), so exact-top-10 recall is
    // not a meaningful bar; what must hold is that ADC ranking finds
    // genuinely-above-baseline neighbours: corpus-wide cosine against
    // the query averages ~0, the PQ picks must average well above it
    val picks = SimilarityOps.q59AnnPq(spark, TestSpark.sf)
    assert(picks.count() === 10)
    val meanCos = picks.agg(avg($"cos_sim")).as[Double].head()
    assert(meanCos >= 0.1, s"mean true cosine of PQ picks $meanCos")
  }

  test("SRP-LSH finds exactly the planted duplicate pairs, globally") {
    import spark.implicits._
    // 6 well-separated base vectors; bases 0 and 2 get a near-copy at
    // cosine ~0.99999 (the duplicate-detection regime); labels are
    // deliberately USELESS (all equal) - SRP needs no blocking
    def base(j: Int) = Array.tabulate(64)(d => math.sin(j * 97.0 + d * 1.7).toFloat)
    val rows =
      (0 until 6).map(j => (j.toLong, 0, base(j).toSeq)) ++ Seq(
        (10L, 0, base(0).map(x => x + 0.002f * x).toSeq),
        (12L, 0, base(2).map(x => x + 0.002f * x).toSeq))
    val e = rows.toDF("vec_id", "label", "embedding")
    val pairs = SimilarityOps.srpDedup(e, threshold = 0.99)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 10L), (2L, 12L)))
  }

  test("row-local banded signatures match an independent JVM reference computation") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val got = DedupOps.bandedDocs(
      Seq((7L, text)).toDF("doc_id", "text"), carry = Nil, portable = true)
      .select($"band", $"h").as[(Int, String)].collect().toMap
    // reference computation in plain Scala: trigram shingles → md5-folded
    // 31-bit base hash → 16 affine min-lanes → md5 band keys
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val shingles = text.split(" ").sliding(3).map(_.mkString(" ")).toSeq.distinct
    val hs = shingles.map(s => java.lang.Long.parseLong(md5hex(s).take(8), 16) % DedupOps.P31)
    val lanes = (0 until DedupOps.NumHashes).map(i =>
      hs.map(h => (DedupOps.hashA(i) * h + DedupOps.hashB(i)) % DedupOps.P31).min)
    val expected = (0 until DedupOps.Bands).map { b =>
      b -> md5hex(
        (b * DedupOps.RowsPerBand until (b + 1) * DedupOps.RowsPerBand)
          .map(lanes).mkString("|"))
    }.toMap
    assert(got === expected)
  }

  test("PortableMinHashLanes kernel matches the HOF lane construction it replaced") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // edge battery: plain shingles, multi-byte codepoints, 1-element,
    // empty array (array_min-of-empty → null lanes), and a null array
    val rows = Seq(
      (1L, Some(Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon"))),
      (2L, Some(Seq("héllo wörld ünïcode"))),
      (3L, Some(Seq.empty[String])),
      (4L, None))
    val df = rows.toDF("id", "sh")
    val kernel = df.select($"id",
      graft.plans.TextExpressions.portableMinHashLanes(
        $"sh", DedupOps.hashA, DedupOps.hashB, DedupOps.P31).as("mhs"))
    val hof = df.select($"id",
      transform($"sh",
        s => conv(substring(md5(s), 1, 8), 16, 10).cast("long") % DedupOps.P31)
        .as("hs"))
      .select($"id", array((0 until DedupOps.NumHashes).map(i =>
        array_min(transform($"hs",
          h => (lit(DedupOps.hashA(i)) * h + lit(DedupOps.hashB(i))) % DedupOps.P31))): _*)
        .as("mhs"))
    val k = kernel.as[(Long, Option[Seq[Option[Long]]])].collect().toMap
    val h = hof.as[(Long, Option[Seq[Option[Long]]])].collect().toMap
    // null input: kernel yields null array; HOF's outer array(...) of all-null
    // lanes — normalize both to the lane sequence (null array ≡ no lanes)
    assert(k(1L) === h(1L))
    assert(k(2L) === h(2L))
    assert(k(3L).get === Seq.fill(DedupOps.NumHashes)(None)) // empty → null lanes
    assert(h(3L).get === Seq.fill(DedupOps.NumHashes)(None))
    assert(k(4L).isEmpty) // null array stays null through the kernel
  }

  test("regex shingling equals split-on-space trigrams on punctuation-heavy text") {
    // the old \b-anchored lookahead invented shingles mid-token on
    // hyphens/apostrophes and dropped them on leading punctuation
    val texts = Seq(
      "foo-bar baz qux quux",
      "it's a fine day today",
      "(open paren start middle end",
      "trailing dot. next token here",
      "a b c",
      "one two",
      "comma, separated, tokens, here, now",
      "mixed foo-bar it's (p) q.r done",
      "héllo wörld ünïcode trigräm test", // byte-scan must respect multi-byte chars
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DedupOps.shingledFrom(df)
      .select($"doc_id", $"shingles").as[(Long, Seq[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ", -1).toSeq
      if (toks.size >= 3) {
        val want = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
        assert(got(i.toLong) == want, s"doc $i: ${got(i.toLong)} != $want")
      } else assert(!got.contains(i.toLong))
    }
    // the native byte-scan expression and the documented regex agree on
    // single-space text (the corpus contract both state)
    import org.apache.spark.sql.functions._
    val cmp = df.filter(length($"text") > 0).select(
        graft.plans.TextExpressions.wordTrigrams($"text").as("native"),
        regexp_extract_all($"text", lit(DedupOps.TrigramRegex), lit(1)).as("regex"))
      .as[(Seq[String], Seq[String])].collect()
    cmp.foreach { case (n, r) => assert(n == r, s"native $n != regex $r") }
  }

  test("dedup savings report counts removable rows and bytes per source") {
    val dir = TestSpark.scratch("savings-docs")
    // source A: "x" ×3 (300 chars each) + "y" ×1 → 2 removable docs,
    // 600 removable bytes, largest family 3, ratio 2000/4 = 500 milli;
    // source B: all distinct → zero savings
    Seq(
      (1L, "x x x", "en", "A", 300L), (2L, "x x x", "en", "A", 300L),
      (3L, "x x x", "en", "A", 300L), (4L, "y y y", "en", "A", 120L),
      (5L, "p q r", "en", "B", 50L), (6L, "s t u", "en", "B", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.DedupOps.q117DedupSavings(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(out === List(
      ("A", 4L, 2L, 2L, 600L, 3L, 500L),
      ("B", 2L, 2L, 0L, 0L, 1L, 0L)))
  }

  test("filtered ANN returns the best PASSING vector, not a post-filtered global top-k") {
    val dir = TestSpark.scratch("filtered-ann")
    // vec1 is the global nearest neighbour of the query but its document
    // fails the lang filter; vec2 passes and must be ranked; vec3 is en
    // but too short. A post-filter of an unfiltered top-1 would return
    // EMPTY here — the semi-join-first shape returns vec2.
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.01f, 0.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.3f, 0.0f, 0.0f), 0),
      (3L, Seq(0.95f, 0.1f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq(
      (0L, "query doc", "en", "s", 600L),
      (1L, "nearest but wrong lang", "de", "s", 600L),
      (2L, "passes both filters", "en", "s", 600L),
      (3L, "en but too short", "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.SimilarityOps.q110FilteredAnn(spark, dir)
      .as[(Long, Double)].collect().toList
    assert(out.map(_._1) === List(2L))
  }

  test("hybrid RRF ranks keyword+vector agreement first; keyword-less docs are out of scope") {
    val dir = TestSpark.scratch("hybrid-ret")
    // doc1: shares tokens AND nearest vector → both legs rank it 1 →
    // top fusion. doc2: shares tokens, far vector. doc3: nearest-ish
    // vector but ZERO shared tokens → not a keyword candidate → absent
    // (RRF fuses the keyword candidate set by design).
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.99f, 0.1f, 0.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.05f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq(
      (0L, "alpha beta gamma", "en", "s", 10L),
      (1L, "alpha beta delta", "en", "s", 10L),
      (2L, "alpha epsilon zeta", "en", "s", 10L),
      (3L, "iota kappa lambda", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.SimilarityOps.q111HybridRetrieval(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(out.map(_._1) === List(1L, 2L))
    // doc1 leads the keyword leg (2 shared tokens); in the vector leg
    // the keyword-less doc3 holds rank 1 (cos .9988 > .9949), so doc1's
    // vector rank is 2 — ranks are computed over each full leg, the
    // fusion then restricts to keyword candidates
    assert(out.head._3 === 1L && out.head._4 === 2L)
  }

  test("k-means: planted tight groups converge to their seeds; norms are the group means") {
    val dir = TestSpark.scratch("kmeans-emb")
    // 4 axis-aligned groups of 2; vec_ids 0..3 (the deterministic seeds)
    // are one member of each group, so every group keeps its own seed
    // cluster and the 2-member centroid is (10+12)/2 = 11 on one axis
    def vec(axis: Int, mag: Float): Seq[Float] = {
      val a = Array.fill(4)(0.0f); a(axis) = mag; a.toSeq
    }
    val rows = (0 until 4).flatMap { g =>
      Seq((g.toLong, vec(g, 10.0f), g), ((g + 4).toLong, vec(g, 12.0f), g))
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = operators.SimilarityOps.q99Kmeans(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out === List(
      (0L, 2L, 0L, 11.0), (1L, 2L, 1L, 11.0),
      (2L, 2L, 2L, 11.0), (3L, 2L, 3L, 11.0)))
  }

  test("source overlap counts shared distinct trigrams per source pair, short docs excluded") {
    import org.apache.spark.sql.functions.lit
    val dir = TestSpark.scratch("srcoverlap-docs")
    Seq(
      // A: trigrams {w1 w2 w3, w2 w3 w4} → n_a = 2
      (0L, "w1 w2 w3 w4", "en", "A"),
      // B: {w1 w2 w3} shared with A → n_shared = 1; plus a <3-word doc
      // that must contribute nothing
      (1L, "w1 w2 w3", "en", "B"),
      (2L, "too short", "en", "B"),
      // C: disjoint vocabulary → no (A,C)/(B,C) rows at all
      (3L, "x1 x2 x3", "en", "C"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(10L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.DedupOps.q122SourceOverlap(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect().toList
    assert(out === List(("A", "B", 1L, 2L, 1L, 0.5)))
  }

  test("semantic dedup prunes within-cluster near-dups, keeps distinct cluster members") {
    val dir = TestSpark.scratch("semdedup-emb")
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // four well-separated cluster anchors are the k-means seeds (ids 0–3);
    // planted semantics: 8/9 exact copies of 0; 10 exact copy of 1;
    // 11 near-dup of 1 at cos ≈ 0.950; 12/13 share 2's/3's cluster but sit
    // at cos ≈ 0.815 (below the 0.85 default τ — must survive); 14/15 are
    // an identical off-seed pair that co-clusters wherever it lands
    val e0 = v(10, 0, 0, 0, 1, 0, 0, 0)
    val e1 = v(0, 10, 0, 0, 0, 1, 0, 0)
    val e2 = v(0, 0, 10, 0, 0, 0, 1, 0)
    val e3 = v(0, 0, 0, 10, 0, 0, 0, 1)
    val near1 = v(0, 10, 0, 0, 0, 1, 3.3, 0) // cos(e1, near1) ≈ 0.9500
    val far2 = v(0, 0, 10, 0, 7, 0, 0, 0) // cos(e2, far2) ≈ 0.815
    val far3 = v(0, 0, 0, 10, 0, 7, 0, 0) // cos(e3, far3) ≈ 0.815
    val mid = v(5, 5, 5, 5, 0, 0, 0, 0)
    val rows = Seq(
      (0L, e0, 0), (1L, e1, 1), (2L, e2, 2), (3L, e3, 3),
      (8L, e0, 0), (9L, e0, 0), (10L, e1, 1), (11L, near1, 1),
      (12L, far2, 2), (13L, far3, 3), (14L, mid, 0), (15L, mid, 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = operators.SimilarityOps.semanticDedup(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toList
    // (dropped, kept) pairs: exact copies drop to their group minimum, the
    // 0.95 near-dup drops to its anchor, the 0.815 members survive
    assert(out.map(r => (r._1, r._3)) ===
      List((8L, 0L), (9L, 0L), (10L, 1L), (11L, 1L), (15L, 14L)))
    val exact = out.filter(r => Set(8L, 9L, 10L, 15L).contains(r._1))
    assert(exact.forall(_._4 == 1.0))
    val cos11 = out.find(_._1 == 11L).get._4
    assert(cos11 > 0.94 && cos11 < 0.96)
  }

  test("q136 containment: excerpt swallowed by a superset scores 1.0 with low jaccard") {
    // doc1 is a clean 40-word prefix excerpt of the 200-word doc0: every
    // one of its 38 trigrams appears in doc0, so containment = 1.0 while
    // jaccard = 38/198 ≈ 0.19 — below ANY sane jaccard threshold. doc2
    // is disjoint and must produce no pair at all.
    val big = (1 to 200).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (500 to 560).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, big), (1L, excerpt), (2L, other)).toDF("doc_id", "text")
    val out = DedupOps.containmentPairs(docs, 0.5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getAs[Long]("n_a") == 198L && r.getAs[Long]("n_b") == 38L)
    assert(r.getAs[Long]("inter") == 38L)
    assert(r.getAs[Double]("containment") == 1.0)
    assert(r.getAs[Double]("jaccard") < 0.2)
  }

  test("q137 knn graph: exact in-cell ranking, duplicate-vector top rank, no cross-cell edges") {
    val emb = Seq(
      // cell 0: v3 duplicates v0 (cos 1.0 — must be rank 1 for both),
      // v1 is close (cos ≈ 0.994), v2 orthogonal (cos 0.0)
      (0L, 0, Seq(1f, 0f, 0f, 0f)),
      (1L, 0, Seq(0.9f, 0.1f, 0f, 0f)),
      (2L, 0, Seq(0f, 1f, 0f, 0f)),
      (3L, 0, Seq(1f, 0f, 0f, 0f)),
      // cell 1: only two members — each gets a single row (fewer than k)
      (10L, 1, Seq(0f, 0f, 1f, 0f)),
      (11L, 1, Seq(0f, 0f, 0.5f, 0.5f))
    ).toDF("vec_id", "label", "embedding")
    val rows = SimilarityOps.knnGraphOf(emb, 3, 16384L).collect()
    val byVec = rows.groupBy(_.getLong(0))
    // cell 0 members emit 3 rows each, cell 1 members one each
    assert(byVec(0L).length == 3 && byVec(10L).length == 1)
    // every edge stays inside its cell
    val cellOf = Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 0, 10L -> 1, 11L -> 1)
    rows.foreach(r => assert(cellOf(r.getLong(0)) == cellOf(r.getAs[Long]("nbr_id"))))
    def nbrs(v: Long): Seq[Long] =
      byVec(v).sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("nbr_id")).toSeq
    assert(nbrs(0L) == Seq(3L, 1L, 2L)) // dup first, then close, then orthogonal
    assert(nbrs(3L) == Seq(0L, 1L, 2L)) // the dup's own list mirrors it
    assert(nbrs(10L) == Seq(11L) && nbrs(11L) == Seq(10L))
    val v0 = byVec(0L).sortBy(_.getAs[Long]("rank"))
    assert(v0(0).getAs[Double]("cos_sim") == 1.0)
    assert(v0(2).getAs[Double]("cos_sim") == 0.0)
  }

  test("q141 cosine spectrum: bins cover exactly the within-bucket pairs, shares sum to 1") {
    // 16 vectors → 2 hash buckets; replicate the bucket formula here so
    // the expected pair count is derived, not guessed. Two colliding ids
    // get IDENTICAL vectors → the cos=1.0 pair must land in bin 20.
    val n = 16
    def bkt(id: Long): Long = ((id * 2654435761L) % 2147483648L) % (n / 8)
    val ids = (0 until n).map(_.toLong)
    val collide = ids.groupBy(bkt).values.find(_.size >= 2).get.take(2)
    // the planted pair uses a 3-4-5 vector: n2 = 25e6 has an EXACT
    // integer sqrt (5000), so cos evaluates to exactly 1.0 → bin 20
    // (a non-square n2 gives sqrt(n2)² ≠ n2 and cos = 1 − 1ulp → bin 19)
    val emb = ids.map { id =>
      val v =
        if (collide.contains(id)) Seq(3f, 4f, 0f, 0f)
        else Seq(id.toFloat + 1f, 1f, (id % 3).toFloat, 0f)
      (id, v)
    }.toDF("vec_id", "embedding")
    val rows = SimilarityOps.cosineSpectrumOf(emb).collect()
    val expectedPairs = ids.groupBy(bkt).values.map(g => g.size * (g.size - 1) / 2).sum
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == expectedPairs)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    assert(rows.exists(_.getAs[Long]("bin_idx") == 20L)) // the planted identical pair
    rows.foreach(r => assert(r.getAs[Double]("bin_lo") == r.getAs[Long]("bin_idx") / 20.0))
  }

  test("Gram aggregator folds exact sums and upper-triangle products in BOTH carriers") {
    import graft.functions.Gram
    val df = Seq(Seq(1L, 2L), Seq(3L, -4L)).toDF("eq")
    val r = df.agg(Gram.gramAgg($"eq").as("g"))
      .select($"g.n", $"g.mx", $"g.sums", $"g.prods",
        $"g.sumsD", $"g.prodsD").collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 4L) // max|x|
    assert(r.getSeq[Long](2) == Seq(4L, -2L)) // Σx₀, Σx₁
    assert(r.getSeq[Long](3) == Seq(10L, -10L, 20L)) // Σx₀², Σx₀x₁, Σx₁²
    // the double carrier folds the SAME sums (exact below 2⁵³)
    assert(r.getSeq[Double](4) == Seq(4.0, -2.0))
    assert(r.getSeq[Double](5) == Seq(10.0, -10.0, 20.0))
    assert(Gram.triIndex(2, 0, 1) == 1 && Gram.triIndex(2, 1, 1) == 2)
  }

  test("covExactSafe: the Gram finishing guard flips at 2*(n*mx)^2 = Long.MaxValue/2 (r19, verdict order 1)") {
    import graft.functions.Gram
    // mx = 1000: n* = sqrt(Long.MaxValue/4)/1000 = 1518500249.7/1000
    assert(Gram.covExactSafe(1518500L, 1000L))
    assert(!Gram.covExactSafe(1518501L, 1000L))
    // the tested decades sit far inside (sf10 ≈ 5e5 vectors)
    assert(Gram.covExactSafe(500000L, 1000L))
    // a single extreme-coord vector already fails: at mx = 3e9 both
    // the finishing bound 2(n·mx)² and the partial bound n·mx² blow
    // past Long.MaxValue/2 at n = 1
    assert(!Gram.covExactSafe(1L, 3000000000L))
    // degenerate corpora are vacuously safe
    assert(Gram.covExactSafe(0L, 0L))
    assert(Gram.covExactSafe(1000000L, 0L))
  }

  test("q145 covariance: planted perfect correlation, zero-variance NULL") {
    // y = 2x (corr exactly 1.0); z constant (variance 0 → corr NULL)
    val emb = Seq(
      (0L, Seq(1f, 2f, 5f)), (1L, Seq(2f, 4f, 5f)), (2L, Seq(3f, 6f, 5f)))
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.covarianceOf(emb).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r).toMap
    assert(rows.size == 6) // d=3 upper triangle
    // hand-folded on the ×1000 integer grid: x = [1000, 2000, 3000]
    assert(rows((0L, 0L)).getAs[Long]("cov_num") == 6000000L)
    assert(rows((0L, 1L)).getAs[Long]("cov_num") == 12000000L)
    assert(rows((0L, 1L)).getAs[Double]("corr") == 1.0)
    assert(rows((2L, 2L)).getAs[Long]("cov_num") == 0L)
    assert(rows((0L, 2L)).isNullAt(rows((0L, 2L)).fieldIndex("corr")))
  }

  test("q151 top component recovers a planted principal axis") {
    // points on the (3,4)/5 line, mean-centered by symmetry; third dim
    // constant → zero variance, zero loading. Top eigenvector of the
    // covariance is (0.6, 0.8, 0), sign fixed by the largest entry.
    val emb = Seq(
      (0L, Seq(3f, 4f, 7f)), (1L, Seq(-3f, -4f, 7f)),
      (2L, Seq(6f, 8f, 7f)), (3L, Seq(-6f, -8f, 7f)))
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.topComponentOf(emb).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Double]("loading")).toMap
    assert(rows.keySet == Set(0L, 1L, 2L))
    assert(math.abs(rows(0L) - 0.6) < 1e-3)
    assert(math.abs(rows(1L) - 0.8) < 1e-3)
    assert(math.abs(rows(2L)) < 1e-3)
  }

  test("q145/q151 double lane equals the exact lane on a small fixture and nulls cov_num (r19, verdict order 1)") {
    // below 2^53 every double-carrier partial is exact, so the lanes
    // must agree EXACTLY — corr values, NULL pattern, loadings
    val emb = Seq(
      (0L, Seq(1f, 2f, 5f)), (1L, Seq(2f, 4f, 5f)), (2L, Seq(3f, 6f, 5f)))
      .toDF("vec_id", "embedding")
    def corrs(lane: Option[Boolean]) =
      SimilarityOps.covarianceOf(emb, lane).collect()
        .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
          if (r.isNullAt(r.fieldIndex("corr"))) Double.NaN
          else r.getAs[Double]("corr"))).toSeq
    assert(corrs(Some(true)).toString == corrs(Some(false)).toString)
    assert(corrs(None).toString == corrs(Some(true)).toString)
    // the exact lane keeps the int64 numerators; the double lane
    // reports NULL rather than a value int64 could not carry at scale
    assert(SimilarityOps.covarianceOf(emb, Some(true)).collect()
      .forall(!_.isNullAt(2)))
    assert(SimilarityOps.covarianceOf(emb, Some(false)).collect()
      .forall(_.isNullAt(2)))
    def loads(lane: Option[Boolean]) =
      SimilarityOps.topComponentOf(emb, lane).collect()
        .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("loading"))).toSeq
    assert(loads(Some(true)) == loads(Some(false)))
    assert(loads(None) == loads(Some(true)))
  }

  test("q145/q151 above the int64 edge: the UNFORCED guard swaps carriers where the exact finish truly wraps (r19, verdict order 1)") {
    // raw ±1e6 floats quantize to ±1e9: n = 4, mx = 1e9 →
    // 2·(n·mx)² = 3.2e19 ≫ Long.MaxValue/2, so the default lane choice
    // must pick the double carrier. True finishing values (d = 2):
    //   Σx₀ = 2e9, Σx₁ = 1e9, Σx₀² = 4e18, Σx₀x₁ = 1e18, Σx₁² = 1e18
    //   cov(0,0) = 16e18 − 4e18 = 1.2e19  ← past Long.MaxValue
    //   cov(0,1) = 4e18 − 2e18 = 2e18
    //   cov(1,1) = 4e18 − 1e18 = 3e18
    //   corr(0,1) = 2e18 / (√1.2e19·√3e18) = 2/6 → 0.333333
    // (every value is a small-integer multiple of 1e18 — exact in
    // doubles, so the assertions are equality, not tolerance)
    val emb = Seq(
      (0L, Seq(1e6f, 0f)), (1L, Seq(-1e6f, 0f)),
      (2L, Seq(1e6f, 0f)), (3L, Seq(1e6f, 1e6f)))
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.covarianceOf(emb).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r).toMap
    assert(rows.size == 3)
    assert(rows.values.forall(_.isNullAt(2))) // guard chose the double lane
    assert(rows((0L, 0L)).getAs[Double]("corr") == 1.0)
    assert(rows((0L, 1L)).getAs[Double]("corr") == 0.333333)
    assert(rows((1L, 1L)).getAs[Double]("corr") == 1.0)
    // the forced exact lane on the same data demonstrates the hazard
    // the guard prevents: under ANSI the int64 finish THROWS (a 100 TB
    // query that dies at the finish line; the JVM-side Gram partials
    // would wrap silently past their own bound n·mx²)
    val e = intercept[Exception] {
      SimilarityOps.covarianceOf(emb, Some(true)).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("ARITHMETIC_OVERFLOW"))
    // q151 rides the same lane: top component of [[12, 2], [2, 3]]·1e18
    // is (0.97821, 0.20759) — λ₁ = (15 + √97)/2, v ∝ (2, λ₁ − 12)
    val load = SimilarityOps.topComponentOf(emb).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Double]("loading")).toMap
    assert(math.abs(load(0L) - 0.97821) < 1e-3)
    assert(math.abs(load(1L) - 0.20759) < 1e-3)
  }

  test("q157 label variance: per-label top dimension and trace share") {
    // label 0: dim 0 varies (1,3 -> var), dim 1 constant; label 1: dim 1
    // dominates with a bigger spread; dim 2 constant everywhere
    val emb = Seq(
      (0L, 0, Seq(1f, 5f, 7f)), (1L, 0, Seq(3f, 5f, 7f)),
      (10L, 1, Seq(2f, 0f, 7f)), (11L, 1, Seq(2f, 8f, 7f)))
      .toDF("vec_id", "label", "embedding")
    val rows = SimilarityOps.labelVarianceOf(emb).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    // label 0, dim 0 on the millis grid: n=2, x = [1000, 3000]
    // var_num = 2*(1e6 + 9e6) - 4000^2 = 4e6; dims 1,2 constant -> 0
    assert(rows(0L).getAs[Long]("top_dim") == 0L)
    assert(rows(0L).getAs[Long]("top_var_num") == 4000000L)
    assert(rows(0L).getAs[Long]("trace_num") == 4000000L)
    assert(rows(0L).getAs[Double]("top_share") == 1.0)
    // label 1, dim 1: x = [0, 8000] -> var_num = 2*64e6 - 64e6 = 64e6
    assert(rows(1L).getAs[Long]("top_dim") == 1L)
    assert(rows(1L).getAs[Long]("top_var_num") == 64000000L)
    // lane parity (r19): the forced double carrier agrees exactly on
    // this sub-2^53 fixture — same top dims, same shares, NULL numerators
    val dbl = SimilarityOps.labelVarianceOf(emb, Some(false)).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    for (l <- Seq(0L, 1L)) {
      assert(dbl(l).getAs[Long]("top_dim") == rows(l).getAs[Long]("top_dim"))
      assert(dbl(l).getAs[Double]("top_share") ==
        rows(l).getAs[Double]("top_share"))
      assert(dbl(l).isNullAt(dbl(l).fieldIndex("top_var_num")))
      assert(dbl(l).isNullAt(dbl(l).fieldIndex("trace_num")))
    }
  }

  test("q157 above the int64 edge: the UNFORCED guard rides the double carriers (r19, verdict order 1)") {
    // same wrap corpus as the q145 edge spec, all one label: n = 4,
    // mx = 1e9 → covExactSafe fails → double lane. True per-dim
    // variance numerators: dim 0 = 1.2e19 (past Long.MaxValue),
    // dim 1 = 3e18; trace = 1.5e19 → share = 0.8 (exact in doubles)
    val emb = Seq(
      (0L, 0, Seq(1e6f, 0f)), (1L, 0, Seq(-1e6f, 0f)),
      (2L, 0, Seq(1e6f, 0f)), (3L, 0, Seq(1e6f, 1e6f)))
      .toDF("vec_id", "label", "embedding")
    val r = SimilarityOps.labelVarianceOf(emb).collect().head
    assert(r.getAs[Long]("label") == 0L && r.getAs[Long]("n") == 4L)
    assert(r.isNullAt(r.fieldIndex("top_var_num")))
    assert(r.isNullAt(r.fieldIndex("trace_num")))
    assert(r.getAs[Long]("top_dim") == 0L)
    assert(r.getAs[Double]("top_share") == 0.8)
  }

  test("q195 centroid outliers: planted far vector ranks first with the exact integer distance") {
    // label 0: three copies of (1, 0) + one far (0, 1); label 1: two
    // identical (0, 1) (zero distance, tie broken by vec_id)
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 0, Seq(0f, 1f)),
      (10L, 1, Seq(0f, 1f)), (11L, 1, Seq(0f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val rows = SimilarityOps.embeddingOutliersOf(emb).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("rnk")) -> r).toMap
    // label 0 on the millis grid: n=4, sx=(3000, 1000);
    // outlier dev = (4*0-3000, 4*1000-1000) -> dist2 = 9e6 + 9e6 = 18e6;
    // each copy dev = (1000, -1000) -> dist2 = 2e6; msd = dist2 / 16
    val top = rows((0L, 1L))
    assert(top.getAs[Long]("vec_id") == 3L)
    assert(top.getAs[Long]("dist2_num") == 18000000L)
    assert(top.getAs[Double]("msd") == 18000000.0 / 16)
    assert(rows((0L, 2L)).getAs[Long]("vec_id") == 0L) // tie -> lowest id
    assert(rows((0L, 2L)).getAs[Long]("dist2_num") == 2000000L)
    // label 1: both identical -> zero distance, ranks by vec_id
    assert(rows((1L, 1L)).getAs[Long]("vec_id") == 10L)
    assert(rows((1L, 1L)).getAs[Long]("dist2_num") == 0L)
    // top-10 cap: 4 + 2 vectors -> 6 rows total, none dropped
    assert(rows.size == 6)
  }

  test("q196 label margin: the planted cross-label vector is the only suspect") {
    // label 0's vec 3 sits exactly ON label 1's centroid (own msd
    // 1.125e6, other msd 0 -> suspect); every other vector is closer to
    // its own centroid; label 1's members lie on their centroid (own 0)
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 0, Seq(0f, 1f)),
      (10L, 1, Seq(0f, 1f)), (11L, 1, Seq(0f, 1f)), (12L, 1, Seq(0f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val rows = SimilarityOps.labelMarginOf(emb).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_suspect"),
          r.getAs[Double]("suspect_share"))).toMap
    assert(rows(0L) == ((4L, 1L, 0.25)))
    assert(rows(1L) == ((3L, 0L, 0.0)))
  }

  test("q196 label margin: a single-label corpus has no other centroid and no suspects") {
    val emb = Seq((0L, 0, Seq(1f, 0f)), (1L, 0, Seq(0f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val rows = SimilarityOps.labelMarginOf(emb).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_suspect") == 0L)
  }

  test("exactDistSafe: the int64 guard flips exactly at dims*(2n*maxq)^2 = Long.MaxValue/2 (r17 order 2)") {
    // dims=64, max|q|=1000: Long.MaxValue/2 ≈ 2^62, /64 = 2^56,
    // sqrt = 2^28 = 268435456 → n* = 2^28/2000 = 134217.728
    assert(SimilarityOps.exactDistSafe(134217L, 1000L, 64))
    assert(!SimilarityOps.exactDistSafe(134218L, 1000L, 64))
    // tested decades sit far inside the bound (sf10: n = 5e4, 64 dims)
    assert(SimilarityOps.exactDistSafe(50000L, 1000L, 64))
    // a max|q| of 0 (all-zero corpus) must not divide by zero the bound
    assert(SimilarityOps.exactDistSafe(1L, 0L, 64))
  }

  test("q195 large-n msd lane ranks the planted fixture identically to the exact lane and nulls the exact key (r17 order 2)") {
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 0, Seq(0f, 1f)),
      (10L, 1, Seq(0f, 1f)), (11L, 1, Seq(0f, 1f)))
      .toDF("vec_id", "label", "embedding")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("label"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("n"))
    val exact = SimilarityOps
      .embeddingOutliersOf(emb, forceExactLane = Some(true)).collect()
    val msd = SimilarityOps
      .embeddingOutliersOf(emb, forceExactLane = Some(false)).collect()
    // identical ranking below the overflow edge (the verdict's boundary
    // contract: the lanes may only diverge where int64 has already
    // wrapped, which no constructible small fixture can reach)
    assert(exact.map(key).toSeq == msd.map(key).toSeq)
    // the msd lane reports NULL for the exact key instead of a value it
    // cannot represent; the exact lane keeps the int64
    assert(exact.forall(!_.isNullAt(4)))
    assert(msd.forall(_.isNullAt(4)))
    // msd agrees across lanes to fp-sum tolerance
    exact.zip(msd).foreach { case (a, b) =>
      val (x, y) = (a.getAs[Double]("msd"), b.getAs[Double]("msd"))
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)))
    }
    // the default guard picks the exact lane on this fixture
    val auto = SimilarityOps.embeddingOutliersOf(emb).collect()
    assert(auto.map(key).toSeq == exact.map(key).toSeq)
    assert(auto.forall(!_.isNullAt(4)))
  }

  test("q196 double-carrier grid fold equals the exact-carrier fold on the planted fixture (r17 order 2)") {
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 0, Seq(0f, 1f)),
      (10L, 1, Seq(0f, 1f)), (11L, 1, Seq(0f, 1f)), (12L, 1, Seq(0f, 1f)))
      .toDF("vec_id", "label", "embedding")
    def rows(lane: Option[Boolean]) = SimilarityOps
      .labelMarginOf(emb, forceExactLane = lane).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("n"),
        r.getAs[Long]("n_suspect"), r.getAs[Double]("suspect_share")))
      .toSeq
    assert(rows(Some(true)) == rows(Some(false)))
    assert(rows(None) == rows(Some(true)))
  }

  test("q197 fused trust report equals its q195 + q196 constituents row-for-row (r17 order 6)") {
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 0, Seq(0f, 1f)),
      (10L, 1, Seq(0f, 1f)), (11L, 1, Seq(0f, 1f)), (12L, 1, Seq(0f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val fused = SimilarityOps.embeddingTrustOf(emb).collect()
    // q195 part: (label, rnk, vec_id, dist2_num, msd) identical
    val outliers = SimilarityOps.embeddingOutliersOf(emb).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("dist2_num"),
        r.getAs[Double]("msd"))).toSeq
    assert(fused.map(r => (r.getAs[Long]("label"), r.getAs[Long]("rnk"),
      r.getAs[Long]("vec_id"), r.getAs[Long]("dist2_num"),
      r.getAs[Double]("msd"))).toSeq == outliers)
    // q196 part: the label-level columns repeat the margin screen
    val margins = SimilarityOps.labelMarginOf(emb).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_suspect"),
          r.getAs[Double]("suspect_share"))).toMap
    fused.foreach { r =>
      assert(margins(r.getAs[Long]("label")) ==
        ((r.getAs[Long]("n"), r.getAs[Long]("n_suspect"),
          r.getAs[Double]("suspect_share"))))
    }
    // the forced msd lane ranks identically and nulls the exact key
    val msdLane = SimilarityOps
      .embeddingTrustOf(emb, forceExactLane = Some(false)).collect()
    assert(msdLane.map(r => (r.getAs[Long]("label"), r.getAs[Long]("rnk"),
      r.getAs[Long]("vec_id"))).toSeq ==
      fused.map(r => (r.getAs[Long]("label"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vec_id"))).toSeq)
    assert(msdLane.forall(_.isNullAt(6)))
  }

  test("q195 above the int64 edge: the UNFORCED guard swaps lanes where the exact fold truly wraps (r17 order 2)") {
    // components of ±10⁶ quantize to ±10⁹: exactDistSafe(3, 10⁹, 2)
    // fails (dims·(2n·max|q|)² = 7.2·10¹⁹ ≫ Long.MaxValue/2), so the
    // DEFAULT lane choice — no forcing — must pick the msd carrier.
    // Hand-computed msd ranking with n=3, s=(10⁹, 10⁹):
    //   b: dev (−4·10⁹, −10⁹) → 17·10¹⁸/9 (the exact int64 fold WRAPS
    //      negative here — 17·10¹⁸ > Long.MaxValue)
    //   c: dev (2·10⁹, 2·10⁹) → 8·10¹⁸/9
    //   a: dev (2·10⁹, −10⁹) → 5·10¹⁸/9
    val emb = Seq(
      (0L, 0, Seq(1e6f, 0f)), (1L, 0, Seq(-1e6f, 0f)),
      (2L, 0, Seq(1e6f, 1e6f)))
      .toDF("vec_id", "label", "embedding")
    val rows = SimilarityOps.embeddingOutliersOf(emb).collect()
    // default guard chose the msd lane: exact keys are NULL
    assert(rows.forall(_.isNullAt(4)))
    // and the ranking is the true one (b farthest, then c, then a)
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 0L))
    assert(math.abs(rows.head.getAs[Double]("msd") - 17e18 / 9) <=
      1e-6 * 17e18 / 9)
    // the forced exact lane on the same data demonstrates the hazard
    // the guard prevents: the wrapped key misranks the true outlier
    val wrapped = SimilarityOps
      .embeddingOutliersOf(emb, forceExactLane = Some(true)).collect()
    assert(wrapped.head.getAs[Long]("vec_id") != 1L)
  }

  test("plan ratchet: q196/q197 run on the literal-matrix kernels, never a centroid grid (r18)") {
    // the crossJoin-against-centroids form read 122 s/sf10 = 24×/decade
    // (PERF.md r18); this pins the cure so a rewrite can't silently
    // bring the grid back — no nested-loop join anywhere in the plan,
    // and the codegen'd kernels present
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }
    val sf = TestSpark.sf
    val p196 = plan(SimilarityOps.q196LabelMargin(spark, sf))
    val p197 = plan(SimilarityOps.q197EmbeddingTrust(spark, sf))
    Seq(p196, p197).foreach { p =>
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
      assert(!p.contains("CartesianProduct"), p.take(2000))
      assert(p.contains("min_other_msd"), p.take(2000))
      assert(p.contains("scaled_sq_dist_i64"), p.take(2000))
    }
    // q195's own-centroid fold rides the same exact kernel
    assert(plan(SimilarityOps.q195EmbeddingOutliers(spark, sf))
      .contains("scaled_sq_dist_i64"))
  }

  test("q198 hygiene screen: zero vector lands in bucket -1, norm buckets are exact floor-log2") {
    // hand-computed on the millis grid: (1,0) → norm² 10⁶ → bucket 19;
    // (0,0) → zero vector → bucket −1; (.0316,0) → q=32 → 1024 → bucket
    // 10 (power-of-two boundary); (.5,.5) → 500000 → bucket 18
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(0f, 0f)),
      (2L, 0, Seq(0.0316f, 0f)), (3L, 1, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val rows = SimilarityOps.embeddingHygieneOf(emb).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_vecs"), r.getAs[Long]("min_norm2"),
        r.getAs[Long]("max_norm2"))).toSeq
    assert(rows == Seq(
      (0L, -1L, 1L, 0L, 0L),
      (0L, 10L, 1L, 1024L, 1024L),
      (0L, 19L, 1L, 1000000L, 1000000L),
      (1L, 18L, 1L, 500000L, 500000L)))
  }

  test("q198 norm bound: a component past sqrt(Long.MaxValue/2/dims) raises loudly instead of wrapping (r19, ADVICE r18)") {
    // d=2: per-component bound = floor(sqrt(Long.MaxValue/2/2)) ≈
    // 1.5186e9 milli-units. Just below (q = 1.4e9): exact norm² =
    // 1.96e18 < Long.MaxValue, bucket = floor-log2 = 60. Past it
    // (q = 1.6e9) the fold would reach 2.56e18 here but wraps for any
    // second such component — the screen must fail loudly, not bucket
    // a wrapped negative via two's-complement bin().
    val below = Seq((0L, 0, Seq(1.4e6f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val ok = SimilarityOps.embeddingHygieneOf(below).collect()
    assert(ok.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("max_norm2")))
      .toSeq == Seq((60L, 1960000000000000000L)))
    val past = Seq((0L, 0, Seq(1.6e6f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[Exception] {
      SimilarityOps.embeddingHygieneOf(past).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("exact-int64 norm bound"))
  }

  test("q195-q198 null contract: NULL/empty embeddings neither shape centroids nor count toward n (r19, ADVICE r18)") {
    // Before r19, n was the max per-dim posexplode count: a NULL or
    // empty embedding silently shrank n below the oracle's count(*)
    // and every n·q_i − s_i deviation diverged cross-engine. Now both
    // engines filter un-embeddable rows at ingestion, so a corpus with
    // junk rows must answer exactly like the clean corpus.
    val clean = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 0, Seq(0f, 1f)),
      (10L, 1, Seq(0f, 1f)), (11L, 1, Seq(0f, 1f)), (12L, 1, Seq(0f, 1f)))
    val junk = Seq(
      (90L, 0, null.asInstanceOf[Seq[Float]]), (91L, 0, Seq.empty[Float]),
      (92L, 1, null.asInstanceOf[Seq[Float]]))
    val cleanDf = clean.toDF("vec_id", "label", "embedding")
    val dirtyDf = (clean ++ junk).toDF("vec_id", "label", "embedding")
    def dump(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.toList).toList
    // the stats frame itself: n counts only embeddable rows
    val stats = SimilarityOps.labelCentroidStats(dirtyDf).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("n")).toMap
    assert(stats == Map(0 -> 4L, 1 -> 3L))
    // all four screens are junk-blind
    assert(dump(SimilarityOps.embeddingOutliersOf(dirtyDf).collect()) ==
      dump(SimilarityOps.embeddingOutliersOf(cleanDf).collect()))
    assert(dump(SimilarityOps.labelMarginOf(dirtyDf).collect()) ==
      dump(SimilarityOps.labelMarginOf(cleanDf).collect()))
    assert(dump(SimilarityOps.embeddingTrustOf(dirtyDf).collect()) ==
      dump(SimilarityOps.embeddingTrustOf(cleanDf).collect()))
    assert(dump(SimilarityOps.embeddingHygieneOf(dirtyDf).collect()) ==
      dump(SimilarityOps.embeddingHygieneOf(cleanDf).collect()))
  }

  test("q147 ann recall: rows well-formed, hits bounded by panel size") {
    val rows = SimilarityOps.q147AnnRecall(spark, TestSpark.sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 5L, 10L))
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0L && hits <= 20L * k)
      assert(math.abs(r.getAs[Double]("recall") - hits.toDouble / (20L * k)) < 1e-9)
    }
    // probing 2 cells can only help: recall is positive on this fixture
    assert(rows.map(_.getAs[Long]("hits")).sum > 0L)
  }

  test("q159 dup evidence: rarest shared shingles, rank order, top-3 cap") {
    import graft.operators.DedupOps
    // docs 1/2 are exact dups (every shared trigram df=2, rank by shingle
    // string); doc 3 disjoint. 60 words → 58 trigrams → the cap must trim
    // the evidence to exactly 3 rows for the one pair.
    def txt(tag: String) = (1 to 60).map(i => s"$tag$i").mkString(" ")
    val docs = Seq((1L, txt("a")), (2L, txt("a")), (3L, txt("z")))
      .toDF("doc_id", "text")
    val rows = DedupOps.dupEvidenceOf(docs).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
      assert(r.getAs[Double]("jaccard") == 1.0)
      assert(r.getAs[Long]("df") == 2L)
    }
    // rank follows (df, shingle) — all dfs equal here, so shingle order
    val shingles = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[String]("shingle"))
    assert(shingles.toSeq == shingles.sorted.toSeq)
  }

  test("q148 lsh eval: planted exact dup scores perfect recall and precision") {
    import graft.operators.DedupOps
    def txt150(tag: String) = (1 to 60).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, txt150("a")), (2L, txt150("a")), // exact dup pair: truth AND candidate
      (3L, txt150("b")), (4L, txt150("c"))) // disjoint vocab: neither
      .toDF("doc_id", "text")
    val r = DedupOps.lshEvalOf(docs).collect().head
    assert(r.getAs[Long]("n_truth") == 1L)
    assert(r.getAs[Long]("n_cand") == 1L)
    assert(r.getAs[Long]("n_hit") == 1L)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Double]("precision") == 1.0)
  }

  test("q148 lsh eval on the fixture: hits bounded, ratios consistent") {
    val r = graft.operators.DedupOps.q148LshEval(spark, TestSpark.sf).collect().head
    val (t, c, h) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"))
    assert(h <= math.min(t, c))
    if (t > 0) assert(r.getAs[Double]("recall") == h.toDouble / t)
    if (c > 0) assert(r.getAs[Double]("precision") == h.toDouble / c)
  }

  test("q137 knn graph refuses an oversized cell with guidance") {
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (1L, 0, Seq(0f, 1f)), (2L, 0, Seq(1f, 1f))
    ).toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnGraphOf(emb, 3, 2L).collect()
    }
    assert(e.getMessage.contains("O(cell^2)"))
  }

  test("q163 scaled semdedup: deterministic hash sample, pruned assign, twins pruned") {
    val dir = TestSpark.scratch("semdedup-scaled")
    // 4 well-separated clusters of 16 + one exact twin of vec 0; with
    // kCap=4 and samplePerCentroid=4 the sampling modulus is
    // 65/(4·4) = 4 — a REAL subsample (the regime the driver corpus
    // never reaches), and the super layer is ceil(sqrt(4)) = 2 cells.
    val rows = (for { c <- 0 until 4; i <- 0 until 16 } yield {
      val v = Array.fill(4)(0.0f)
      v(c) = 10.0f
      v((c + 1 + i % 3) % 4) += 3.0f
      ((c * 16 + i).toLong, v.toSeq, c)
    }) :+ ((100L, Seq(10.0f, 3.0f, 0.0f, 0.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def run() = operators.SimilarityOps.semanticDedupScaled(spark, dir,
      tau = 0.85, kCap = 4, samplePerCentroid = 4)
      .as[(Long, Long, Long, Double)].collect().toList
    val out1 = run()
    // no RNG state anywhere: a rerun regenerates the identical result
    assert(out1 == run())
    // prune semantics hold under the pruned assignment: keep-earliest,
    // τ respected, and the planted exact twin is always dropped to an
    // identical (cos 1.0) earlier vector
    out1.foreach { case (vecId, _, keptId, cos) =>
      assert(keptId < vecId && cos >= 0.85)
    }
    val twin = out1.find(_._1 == 100L).get
    assert(twin._4 == 1.0)
  }

  test("q180 span excision: 50% boilerplate doc keeps exactly its novel half, first owner keeps all") {
    // boiler = b1..b10 shared verbatim; doc0 = boiler+novelA (first
    // owner — keeps everything), doc1 = boiler+novelB. doc1's windows
    // fully inside the boilerplate (pos 1..6) are doc0-owned → one
    // island [1,10]; the bridging windows (pos 7..10 contain a z-token)
    // are doc1's own → the tail tokens 11..20 survive as ONE fragment.
    val boiler = (1 to 10).map(i => s"b$i")
    val novelA = (1 to 10).map(i => s"a$i")
    val novelB = (1 to 10).map(i => s"z$i")
    val docs = Seq(
      (0L, (boiler ++ novelA).mkString(" "), "en", "src", 1L),
      (1L, (boiler ++ novelB).mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.spanExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (0L, 20L, 0L, 20L, 0L, 1L, 1.0),
      (1L, 20L, 10L, 10L, 0L, 1L, 0.5)))
  }

  test("q180 span excision: disjoint islands, sub-min fragment dropped, conservation invariant") {
    // docX owns run1 c-pad run2; docY = run1 g1 g2 run2 tail5 →
    // two islands [1,5],[8,12], the 2-token gap (g1 g2) is below
    // MinFragTokens=3 and drops, the 5-token tail keeps.
    val run1 = (1 to 5).map(i => s"r$i")
    val run2 = (1 to 5).map(i => s"s$i")
    val docs = Seq(
      (0L, (run1 ++ (1 to 5).map(i => s"c$i") ++ run2).mkString(" "), "en", "src", 1L),
      (1L, (run1 ++ Seq("g1", "g2") ++ run2 ++ (1 to 5).map(i => s"t$i"))
        .mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.spanExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (0L, 15L, 0L, 15L, 0L, 1L, 1.0),
      (1L, 17L, 10L, 5L, 2L, 1L, 5.0 / 17.0)))
    // per-doc conservation: excised + kept + dropped = n_tokens
    out.foreach { case (_, n, exc, kept, drop, _, _) =>
      assert(exc + kept + drop == n)
    }
  }

  test("q180 span excision: exact copy fully excised; window-less docs keep or drop whole by min length") {
    val a = (1 to 20).map(i => s"a$i")
    val docs = Seq(
      (0L, a.mkString(" "), "en", "src", 1L),
      (1L, a.mkString(" "), "en", "src", 1L), // verbatim re-ingest
      (2L, "x1 x2 x3", "en", "src", 1L),      // no windows, >= MinFrag
      (3L, "y1 y2", "en", "src", 1L))         // no windows, < MinFrag
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.spanExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (0L, 20L, 0L, 20L, 0L, 1L, 1.0),
      (1L, 20L, 20L, 0L, 0L, 0L, 0.0),
      (2L, 3L, 0L, 3L, 0L, 1L, 1.0),
      (3L, 2L, 0L, 0L, 2L, 0L, 0.0)))
  }

  test("q181 excise fragments: emits exactly the novel text, fully-excised docs vanish") {
    // doc0 owns everything (one whole-doc fragment); doc1 = boiler+novel
    // keeps only its novel tail as text; doc2 = verbatim copy of doc0
    // emits NO rows; doc3's 2-token gap between excised runs is sub-min
    // and emits nothing while its 5-token tail does.
    val boiler = (1 to 10).map(i => s"b$i")
    val novelB = (1 to 10).map(i => s"z$i")
    val docs = Seq(
      (0L, (boiler ++ (1 to 10).map(i => s"a$i")).mkString(" "), "en", "src", 1L),
      (1L, (boiler ++ novelB).mkString(" "), "en", "src", 1L),
      (2L, (boiler ++ (1 to 10).map(i => s"a$i")).mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.exciseFragments(docs)
      .as[(Long, Long, Long, Long, String)].collect().toList
    assert(out == List(
      (0L, 1L, 1L, 20L, (boiler ++ (1 to 10).map(i => s"a$i")).mkString(" ")),
      (1L, 1L, 11L, 10L, novelB.mkString(" "))))
  }

  test("q181 fragments reconcile with q180's ledger: per-doc sums and counts match") {
    val run1 = (1 to 5).map(i => s"r$i")
    val run2 = (1 to 5).map(i => s"s$i")
    val docs = Seq(
      (0L, (run1 ++ (1 to 5).map(i => s"c$i") ++ run2).mkString(" "), "en", "src", 1L),
      (1L, (run1 ++ Seq("g1", "g2") ++ run2 ++ (1 to 5).map(i => s"t$i"))
        .mkString(" "), "en", "src", 1L),
      (2L, "x1 x2 x3", "en", "src", 1L),
      (3L, "y1 y2", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frags = operators.DedupOps.exciseFragments(docs)
      .as[(Long, Long, Long, Long, String)].collect().toList
    // doc1's sub-min g1 g2 gap is absent; only the 5-token tail survives
    assert(frags.filter(_._1 == 1L) == List((1L, 1L, 13L, 5L, "t1 t2 t3 t4 t5")))
    // sub-min whole doc (doc3) emits nothing
    assert(!frags.exists(_._1 == 3L))
    val ledger = operators.DedupOps.spanExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    ledger.foreach { case (id, _, _, kept, _, nFrag, _) =>
      val f = frags.filter(_._1 == id)
      assert(f.map(_._4).sum == kept, s"doc $id kept_tokens mismatch")
      assert(f.size.toLong == nFrag, s"doc $id n_fragments mismatch")
      // fragment text length reconciles token count under the
      // single-space contract
      f.foreach { case (_, _, _, n, text) =>
        assert(text.split(" ").length.toLong == n)
      }
    }
  }

  test("q182 decontam excision: benchmark trigrams cut, clean remainder keeps, bench docs emit nothing") {
    // doc 0 is the benchmark panel side (doc_id < BenchPanel). doc 10
    // embeds its head trigram → island [1,3], novel tail survives;
    // doc 11 is clean → whole-doc fragment; doc 12 is a verbatim copy
    // of the benchmark doc → fully excised, zero fragments.
    val bench = (1 to 10).map(i => s"e$i")
    val docs = Seq(
      (0L, bench.mkString(" "), "en", "src", 1L),
      (10L, (Seq("e3", "e4", "e5") ++ (1 to 10).map(i => s"n$i")).mkString(" "), "en", "src", 1L),
      (11L, (1 to 5).map(i => s"w$i").mkString(" "), "en", "src", 1L),
      (12L, bench.mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.decontamExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (10L, 13L, 3L, 10L, 0L, 1L, 10.0 / 13.0),
      (11L, 5L, 0L, 5L, 0L, 1L, 1.0),
      (12L, 10L, 10L, 0L, 0L, 0L, 0.0)))
    assert(!out.exists(_._1 < 10L)) // the eval panel is not training data
  }

  test("q182 decontam excision: no first-owner exemption, corpus-only dups stay, sub-min gap drops") {
    // Two benchmark runs land in doc 10 with a 2-token gap between them
    // (sub-MinFragTokens → dropped); docs 11 and 12 BOTH contain the q
    // run — both lose it (unlike q180, no first owner keeps a copy) —
    // while their shared c run is corpus-internal duplication and is
    // NOT decontamination's business (q180's job, not q182's).
    val docs = Seq(
      (0L, "q1 q2 q3", "en", "src", 1L),
      (1L, "r1 r2 r3", "en", "src", 1L),
      (10L, "q1 q2 q3 g1 g2 r1 r2 r3 t1 t2 t3", "en", "src", 1L),
      (11L, ("q1 q2 q3 " + (1 to 5).map(i => s"c$i").mkString(" ")), "en", "src", 1L),
      (12L, ((1 to 5).map(i => s"c$i").mkString(" ") + " q1 q2 q3"), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.decontamExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (10L, 11L, 6L, 3L, 2L, 1L, 3.0 / 11.0),
      (11L, 8L, 3L, 5L, 0L, 1L, 5.0 / 8.0),
      (12L, 8L, 3L, 5L, 0L, 1L, 5.0 / 8.0)))
    out.foreach { case (_, n, exc, kept, drop, _, _) =>
      assert(exc + kept + drop == n)
    }
  }

  test("q185 unified excision: a remainder that survives each remover alone dies against the union") {
    // doc 11 = dup run (r1..r5, owned by doc 10) + 2-token gap + the
    // benchmark trigram. Against q180 alone its 5-token tail
    // "y1 y2 x1 x2 x3" clears MinFragTokens; against q182 alone its
    // 7-token head clears it; against BOTH, the remainder collapses to
    // the 2-token gap and drops — only the union ledger prices this.
    val docs = Seq(
      (0L, "x1 x2 x3", "en", "src", 1L),
      (10L, "r1 r2 r3 r4 r5 x1 x2 x3 s1 s2 s3 s4 s5", "en", "src", 1L),
      (11L, "r1 r2 r3 r4 r5 y1 y2 x1 x2 x3", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.unifiedExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (10L, 13L, 3L, 10L, 0L, 2L, 10.0 / 13.0),
      (11L, 10L, 8L, 0L, 2L, 0L, 0.0)))
    // the single-source removers each keep a piece of doc 11
    val dupOnly = operators.DedupOps
      .spanExcise(docs.filter($"doc_id" >= 10L))
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .find(_._1 == 11L).get
    assert(dupOnly._4 == 5L) // q180 alone keeps the 5-token tail
    val decontamOnly = operators.DedupOps.decontamExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .find(_._1 == 11L).get
    assert(decontamOnly._4 == 7L) // q182 alone keeps the 7-token head
  }

  test("q185 unified excision: degenerates to q180 without a panel and to q182 without dups") {
    // no benchmark docs → unified == spanExcise on the same corpus
    val dupDocs = Seq(
      (10L, ((1 to 10).map(i => s"b$i") ++ (1 to 10).map(i => s"a$i")).mkString(" "), "en", "src", 1L),
      (11L, ((1 to 10).map(i => s"b$i") ++ (1 to 10).map(i => s"z$i")).mkString(" "), "en", "src", 1L),
      (12L, "w1 w2 w3 w4", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val uniA = operators.DedupOps.unifiedExcise(dupDocs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    val spanA = operators.DedupOps.spanExcise(dupDocs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(uniA == spanA)
    // no cross-corpus dups → unified == decontamExcise
    val benchDocs = Seq(
      (0L, "e1 e2 e3 e4 e5", "en", "src", 1L),
      (10L, (Seq("e2", "e3", "e4") ++ (1 to 8).map(i => s"n$i")).mkString(" "), "en", "src", 1L),
      (11L, (1 to 6).map(i => s"v$i").mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val uniB = operators.DedupOps.unifiedExcise(benchDocs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    val deconB = operators.DedupOps.decontamExcise(benchDocs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    assert(uniB == deconB)
    assert(uniB.exists(r => r._1 == 10L && r._3 == 3L)) // the cut is live
  }

  test("q188 incremental decontam: only delta-touched changed docs emit; old-only and clean docs stay silent") {
    // doc 0 = old benchmark, doc 5 = the newly-landed suite. doc 10 is
    // newly contaminated (0→3 excised); doc 11 was already excised by
    // the OLD panel and the delta doesn't touch it — no row; doc 12's
    // old island EXTENDS (adjacent b-window merges in, [1,3]→[1,6]);
    // doc 13 is clean.
    val docs = Seq(
      (0L, "a1 a2 a3", "en", "src", 1L),
      (5L, "b1 b2 b3", "en", "src", 1L),
      (10L, "b1 b2 b3 n1 n2 n3 n4", "en", "src", 1L),
      (11L, "a1 a2 a3 m1 m2 m3", "en", "src", 1L),
      (12L, "a1 a2 a3 b1 b2 b3 t1 t2 t3", "en", "src", 1L),
      (13L, "u1 u2 u3 u4 u5", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.incrementalDecontam(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (10L, 0L, 3L, 3L, 7L, 4L),
      (12L, 3L, 6L, 3L, 6L, 3L)))
  }

  test("q187-adjacent: fragment intervals reconcile with the q180 ledger on the excised corpus") {
    // exciseFragIntervals is q187's (and q181's) shared core: per doc,
    // Σ frag_tokens must equal q180's kept_tokens on any fixture.
    val boiler = (1 to 10).map(i => s"b$i")
    val docs = Seq(
      (0L, (boiler ++ (1 to 10).map(i => s"a$i")).mkString(" "), "en", "src", 1L),
      (1L, (boiler ++ (1 to 4).map(i => s"z$i")).mkString(" "), "en", "src", 1L),
      (2L, "y1 y2", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val toks = docs.select($"doc_id", split($"text", " ").as("t"))
    val frags = operators.DedupOps.exciseFragIntervals(toks)
      .as[(Long, Long, Long)].collect().toList
    val ledger = operators.DedupOps.spanExcise(docs)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toList
    ledger.foreach { case (id, _, _, kept, _, _, _) =>
      assert(frags.filter(_._1 == id).map(_._3).sum == kept, s"doc $id")
    }
  }

  test("q172 dup-span coverage: planted shared run covered exactly, unique doc zero") {
    // docA = a1..a20; docB embeds a1..a10 at positions 6..15; docC unique.
    // Every 5-window fully inside the shared run is cross-doc duplicated:
    // docA windows 1..6 (union covers tokens 1..10), docB windows 6..11
    // (union covers tokens 6..15) — 10 covered tokens each, coverage 0.5.
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 5).map(i => s"b$i") ++ (1 to 10).map(i => s"a$i") ++
      (6 to 10).map(i => s"b$i")
    val c = (1 to 8).map(i => s"c$i")
    val docs = Seq(
      (0L, a.mkString(" "), "en", "src", 1L),
      (1L, b.mkString(" "), "en", "src", 1L),
      (2L, c.mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.dupSpanCoverage(docs)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toList
    assert(out == List(
      (0L, 20L, 16L, 6L, 10L, 0.5),
      (1L, 20L, 16L, 6L, 10L, 0.5),
      (2L, 8L, 4L, 0L, 0L, 0.0)))
  }

  test("q172 interval union folds overlapping and disjoint dup runs") {
    // docD shares TWO disjoint 5-runs with docE (positions 1..5 and
    // 11..15 in both): one dup window each, no overlap folding needed;
    // covered = 10 of 15.
    val run1 = (1 to 5).map(i => s"x$i")
    val run2 = (1 to 5).map(i => s"y$i")
    val mid1 = (1 to 5).map(i => s"m$i")
    val mid2 = (1 to 5).map(i => s"n$i")
    val docs = Seq(
      (0L, (run1 ++ mid1 ++ run2).mkString(" "), "en", "src", 1L),
      (1L, (run1 ++ mid2 ++ run2).mkString(" "), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.dupSpanCoverage(docs)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toList
    out.foreach { case (_, nTok, nWin, dupWin, covered, cov) =>
      assert((nTok, nWin, dupWin, covered) == (15L, 11L, 2L, 10L))
      assert(cov == 10.0 / 15.0)
    }
  }

  test("q175 novelty: first owner keeps 1.0, verbatim re-ingest scores 0.0") {
    // doc0 = a1..a20 (first, fully novel); doc1 = exact copy (novelty 0);
    // doc2 = half copied from doc0, half fresh; doc3 too short for any
    // window (NULL novelty).
    val a = (1 to 20).map(i => s"a$i")
    val mix = (1 to 10).map(i => s"a$i") ++ (1 to 10).map(i => s"z$i")
    val docs = Seq(
      (0L, a.mkString(" "), "en", "src", 1L),
      (1L, a.mkString(" "), "en", "src", 1L),
      (2L, mix.mkString(" "), "en", "src", 1L),
      (3L, "x1 x2 x3", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.DedupOps.noveltyProfile(docs).collect().toList
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_grams"), r.getAs[Long]("novel_grams"),
        Option(r.getAs[java.lang.Double]("novelty")).map(_.doubleValue))).toMap
    assert(byId(0L) == ((16L, 16L, Some(1.0))))
    assert(byId(1L) == ((16L, 0L, Some(0.0))))
    // doc2 has 16 windows; those fully inside a1..a10 (positions 1..6)
    // were first seen in doc0; the other 10 contain a z-token → novel
    assert(byId(2L) == ((16L, 10L, Some(10.0 / 16.0))))
    assert(byId(3L) == ((0L, 0L, None)))
  }

  test("q174 sketch calibration: exact copies land in the est16=16 bin with gap 0") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (100 to 160).map(i => s"alt$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src", 1L),
      (1L, base, "en", "src", 1L),
      (2L, other, "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sh = operators.DedupOps.shingledFrom(docs)
    val out = operators.DedupOps.sketchCalibration(sh).collect().toList
    // only the identical pair collides in any band; its agreement is
    // necessarily 16/16 and the measured Jaccard exactly 1
    assert(out.map(_.getAs[Long]("est16")) == List(16L))
    val r = out.head
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Double]("est_jaccard") == 1.0)
    assert(r.getAs[Double]("act_jaccard") == 1.0)
    assert(r.getAs[Double]("gap") == 0.0)
  }

  test("q178 calibrated dedup: exact copies ride the sketch path, ambiguous pairs verify") {
    val rows = DedupOps.q178CalibratedDedup(spark, docDir).collect().toSeq
    // the exact-copy pair agrees on all 16 lanes DETERMINISTICALLY →
    // fast-accepted without touching the shingle sets
    val fast = rows.find(r =>
      r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 2L).get
    assert(fast.getAs[String]("path") == "sketch")
    assert(fast.getAs[Long]("est16") == 16L)
    assert(fast.isNullAt(fast.fieldIndex("jaccard")))
    // path/bar/jaccard invariants hold row-by-row
    rows.foreach { r =>
      val sketch = r.getAs[String]("path") == "sketch"
      // on this fixture the in-line calibration finds no failing bin ≥
      // the floor, so the runtime bar sits exactly AT the floor
      assert(sketch == (r.getAs[Long]("est16") >= DedupOps.FastAcceptFloor))
      assert(sketch == r.isNullAt(r.fieldIndex("jaccard")))
      if (!sketch) assert(r.getAs[Double]("jaccard") >= 0.5)
    }
    // the unrelated docs never appear on either path
    assert(!rows.exists(r =>
      r.getAs[Long]("doc_a") >= 3L || r.getAs[Long]("doc_b") >= 3L))
    // on a fixture where every fast-accept is a true dup, the accepted
    // pair set coincides with q21's fully-verified set — the fast path
    // changed the COST of the decision, not the decision
    val q21Keys = DedupOps.q21MinhashLsh(spark, docDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val q178Keys = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(q178Keys == q21Keys)
  }

  test("q178 verified band: sub-bar candidate verifies exactly; sub-threshold candidate is dropped") {
    // deterministic plants (the md5 hash family makes est16 a FIXED
    // number per text pair — found by offline search, pinned here):
    //   doc1 changes tokens {1,5}        → LSH candidate, est16=11 < bar,
    //                                      J=27/31 ≈ 0.871 → verified accept
    //   doc2 changes {2,8,14,20,26,32,38} → LSH candidate, est16=12 < bar,
    //                                      J=19/39 ≈ 0.487 → verify REJECTS
    def variant(changed: Set[Int]): String =
      (1 to 60).map(i => if (changed(i)) s"chg$i" else s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, variant(Set.empty[Int]), "en", "src", 1L),
      (1L, variant(Set(1, 5)), "en", "src", 1L),
      (2L, variant(Set(2, 8, 14, 20, 26, 32, 38)), "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = DedupOps.calibratedDedup(DedupOps.shingledFrom(docs))
      .collect().toSeq
    val va = rows.find(r =>
      r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L).get
    assert(va.getAs[String]("path") == "verified")
    assert(va.getAs[Long]("est16") == 11L)
    assert(math.abs(va.getAs[Double]("jaccard") - 27.0 / 31.0) < 1e-12)
    // the J<0.5 candidate is dropped by the exact verify, not fast-accepted
    assert(!rows.exists(r =>
      r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 2L))
  }

  test("q189 candidate monitor: occurrence-counted novel-gram hits; known-gram delta docs contribute nothing") {
    import graft.operators.DedupOps
    // q188's id convention: <5 old panel, 5..9 delta panel, >=10 corpus
    val docs = Seq(
      0L -> "alpha beta gamma delta",       // old panel
      5L -> "foo bar baz qux",              // delta: 2 novel grams
      6L -> "alpha beta gamma",             // delta: entirely KNOWN
      7L -> "foo bar baz",                  // delta: repeats doc 5's gram
      10L -> "pre foo bar baz qux mid foo bar baz post1 post2",
      11L -> "alpha beta gamma delta only plus filler words here",
      12L -> "nothing shared at all with any panel today"
    ).toDF("doc_id", "text")
    val got = DedupOps.decontamTouchedBatch(docs)
      .as[(Long, Long)].collect().toMap
    // doc 10 grams: (foo bar baz) at pos 2 and 7, (bar baz qux) at 3.
    // novel occurrences: doc5 → {fbb, bbq}, doc7 → {fbb} (occurrence
    // kept, no dedup). hits = fbb(2 novel occ × 2 corpus occ = 4)
    //                       + bbq(1 × 1) = 5
    assert(got == Map(10L -> 5L))
  }

  test("q192 dedup impact: keep-first charges dups to the LATER doc's source; rates and token mass exact") {
    import graft.operators.DedupOps
    val docs = Seq(
      (1L, "srcA", "alpha beta gamma"),      // original (3 tokens)
      (2L, "srcB", "alpha beta gamma"),      // dup of 1 → charged to srcB
      (3L, "srcB", "unique text here now"),  // original (4 tokens)
      (4L, "srcA", "alpha beta gamma"),      // dup of 1 → charged to srcA
      (5L, "srcB", "unique text here now")   // dup of 3 → charged to srcB
    ).toDF("doc_id", "source", "text")
    val got = DedupOps.dedupImpactOf(docs)
      .as[(String, Long, Long, Double, Long, Long)].collect().toList
    assert(got == List(
      ("srcA", 2L, 1L, 0.5, 6L, 3L),
      ("srcB", 3L, 2L, 2.0 / 3.0, 11L, 7L)))
    // the digest is grouping-internal: the default (xxhash64, length)
    // engine lane and the md5 lane the DuckDB twin uses must agree
    // row-for-row (r16 verdict order 8)
    val md5Lane = DedupOps.dedupImpactOf(docs, md5Lane = true)
      .as[(String, Long, Long, Double, Long, Long)].collect().toList
    assert(md5Lane == got)
  }
}
