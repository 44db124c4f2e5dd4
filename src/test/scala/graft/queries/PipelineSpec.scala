package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.TextHashFunctions

class PipelineSpec extends AnyFunSuite with SparkTestBase {

  private def run(name: String) =
    Catalog.queries(name)(spark, sfDir)

  /** The catalog's shared normalization (space-trim, collapse
    * whitespace, lowercase, split on single spaces), as plain Scala —
    * the sequential-recompute tests all tokenize through this one
    * mirror so a tokenizer change breaks them together, loudly.
    */
  private def seqToks(text: String): Array[String] =
    text.replaceAll("^ +| +$", "").replaceAll("\\s+", " ")
      .toLowerCase.split(" ", -1)

  test("composed pipeline == standalone: priming sharedLshPairs and " +
    "running consumers over its warm caches changes execution only, " +
    "never results (the graft.CurationPipeline identity claim). No " +
    "cache release here — EntryCaches is process-global and parallel " +
    "suites' plan pins depend on it; result equality across cache " +
    "states is exactly what this pins") {
    def sortedRows(name: String): Seq[String] =
      run(name).collect().map(_.toString).sorted.toSeq
    val consumers = Seq("p23_dedup_clusters", "p54_minhash_calibration",
      "p66_split_leakfree", "p67_leakage_audit",
      "p71_split_contamination", "p87_longest_common_run")
    val before = consumers.map(n => n -> sortedRows(n))
    val pairs = Pipeline.sharedLshPairs(spark, sfDir)
    assert(pairs.count() > 0, "shared pair list must be non-empty")
    for ((name, want) <- before) {
      val got = sortedRows(name)
      assert(got === want, s"$name diverged under the composed run")
    }
  }

  test("minhash-LSH finds the high-Jaccard pairs and estimates well") {
    val exact = run("p03_dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val est = run("p04_dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "expected near-dup pairs in the corpus")
    val strong = exact.filter(_._2 >= 0.8).keySet
    val found = strong.intersect(est.keySet)
    assert(found.size >= (strong.size * 0.9).toInt,
      s"minhash missed too many strong pairs: ${found.size}/${strong.size}")
    found.foreach { pair =>
      assert(math.abs(exact(pair) - est(pair)) < 0.25,
        s"pair $pair exact=${exact(pair)} est=${est(pair)}")
    }
  }

  test("simhash: identical -> distance 0; near-identical -> small distance") {
    import spark.implicits._
    val df = Seq(
      ("a b c d e f g h i j k l m n o p", "a b c d e f g h i j k l m n o p"),
      ("a b c d e f g h i j k l m n o p", "a b c d e f g h i j k l m n o X"),
      ("a b c d e f g h i j k l m n o p", "z y x w v u t s r q p9 o8 n7 m6 l5 k4"))
      .toDF("t1", "t2")
      .select(
        TextHashFunctions.simhash64(split(col("t1"), " ")).as("s1"),
        TextHashFunctions.simhash64(split(col("t2"), " ")).as("s2"))
      .select(bit_count(col("s1").bitwiseXOR(col("s2"))).as("ham"))
      .collect().map(_.getInt(0))
    assert(df(0) === 0)
    assert(df(1) <= 16, s"near-identical hamming was ${df(1)}")
    assert(df(2) > df(1), "unrelated text should be farther than near-dup")
  }

  test("rolling fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val fps = Seq("a b c d e", "e d c b a", "a b c d e")
      .toDF("t")
      .select(TextHashFunctions.rolling_fingerprint(split(col("t"), " ")).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) !== fps(1)) // order matters
    assert(fps(0) === fps(2)) // deterministic
  }

  test("LSH ANN: deterministic, subset of true sims, nontrivial recall") {
    val exactTop = run("p07_sim_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann1 = run("p08_sim_ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann2 = run("p08_sim_ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann1 === ann2, "LSH must be deterministic")
    assert(ann1.nonEmpty)
    val recall = exactTop.intersect(ann1).size.toDouble / exactTop.size
    assert(recall >= 0.1, s"LSH recall vs brute force was $recall")
  }

  test("dedup survivors = docs minus duplicate copies") {
    val total = graft.sources.Tables.table(spark, sfDir, "documents").count()
    val dupGroups = run("p01_dedup_exact").collect()
    val extraCopies = dupGroups.map(r => r.getLong(1) - 1).sum
    val survivors = run("p02_dedup_keep_first").count()
    assert(survivors === total - extraCopies)
  }

  test("IVF ANN: nprobe=2 recall >= nprobe=1, nontrivial vs brute force") {
    val exactTop = run("p07_sim_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(np: Int): Double = {
      val got = Pipeline.ivfTopK(spark, sfDir, np).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exactTop.intersect(got).size.toDouble / exactTop.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r2 >= r1, s"widening the probe reduced recall: $r1 -> $r2")
    assert(r2 >= 0.1, s"IVF nprobe=2 recall vs brute force was $r2")
  }

  test("p03 df cap: hot shingle (df > cap) generates zero candidates; " +
    "rare shingle still pairs") {
    import spark.implicits._
    // 70 docs (> P03DfCap = 64) all sharing ONE hot shingle; each doc's
    // remaining shingles contain a doc-unique token, so the hot shingle
    // is the only shared one -> uncapped would emit 70*69/2 pairs
    val hot = (1L to 70L).map(i =>
      (i, s"hot1 hot2 hot3 hot4 hot5 u${i}a u${i}b u${i}c u${i}d"))
    // two docs sharing only a RARE shingle (df = 2) -> must survive
    val rare = Seq(
      (1001L, "r1 r2 r3 r4 r5 xa xb xc xd"),
      (1002L, "r1 r2 r3 r4 r5 ya yb yc yd"))
    val d = (hot ++ rare).toDF("doc_id", "text")
    val got = Pipeline.shingleCandidates(d, Pipeline.P03DfCap)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1001L, 1002L)),
      s"expected only the rare-shingle pair, got $got")
  }

  test("p03 df cap is above corpus max df: capped == uncapped output") {
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
    val capped = Pipeline.shingleCandidates(d, Pipeline.P03DfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val uncapped = Pipeline.shingleCandidates(d, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(capped === uncapped,
      "df cap changed candidate pairs at test SF — raise P03DfCap")
  }

  test("p04 sentinel clique closed: <5-token docs generate zero pairs") {
    import spark.implicits._
    // short docs (< 5 tokens -> empty shingle set) used to share the
    // constant sentinel signature and band into one hot bucket with
    // mutual est_jaccard 1.0; they must now be excluded entirely
    val d = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "c"), (4L, "p q r s"),
      (5L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (6L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    val pairs = Pipeline.minhashLshPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((5L, 6L, 1.0)),
      s"expected only the identical long-doc pair, got ${pairs.toSeq}")
  }

  test("p04 bucket cap: no-op at the test SF, and a degenerate " +
    "replicated bucket is skipped (bounded candidate volume)") {
    import spark.implicits._
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
    // no-op pin: the cap removes zero pairs on the real corpus, so
    // every oracle row is unchanged by the candidate-volume bound
    val capped = Pipeline.minhashLshPairs(d).count()
    val uncapped = Pipeline.minhashLshPairs(d, bucketCap = Long.MaxValue)
      .count()
    assert(capped === uncapped,
      "bucket cap changed candidate pairs at test SF — raise LshBucketCap")
    // degenerate corpus: one boilerplate string replicated past the cap
    // bands identically in ALL 16 bands -> every bucket is over cap ->
    // zero candidates (vs n^2/2 = 4950 uncapped); under the cap the
    // full clique must still be found
    val boiler = (1L to (Pipeline.LshBucketCap + 36L))
      .map(i => (i, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    assert(Pipeline.minhashLshPairs(boiler).count() === 0L,
      "over-cap boilerplate bucket must be skipped, not exploded")
    val small = (1L to 10L)
      .map(i => (i, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    assert(Pipeline.minhashLshPairs(small).count() === 45L,
      "under-cap clique must still pair completely")
  }

  test("p05 segment cap: no-op at the test SF, and a degenerate " +
    "replicated segment bucket is skipped (bounded candidate volume)") {
    import spark.implicits._
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
    val capped = Pipeline.simhashPairs(d).count()
    val uncapped = Pipeline.simhashPairs(d, segCap = Long.MaxValue).count()
    assert(capped === uncapped,
      "segment cap changed pairs at test SF — raise LshBucketCap")
    // identical docs share the signature, hence all 4 segment buckets:
    // over cap -> every bucket skipped -> zero pairs (vs n^2/2); under
    // cap the full hamming-0 clique must survive
    val boiler = (1L to (Pipeline.LshBucketCap + 36L))
      .map(i => (i, "s1 s2 s3 s4 s5 s6 s7 s8")).toDF("doc_id", "text")
    assert(Pipeline.simhashPairs(boiler).count() === 0L,
      "over-cap segment bucket must be skipped, not exploded")
    val small = (1L to 10L)
      .map(i => (i, "s1 s2 s3 s4 s5 s6 s7 s8")).toDF("doc_id", "text")
    assert(Pipeline.simhashPairs(small).count() === 45L,
      "under-cap clique must still pair completely")
  }

  test("p97 cap audit: healthy (n_over_cap=0) at test SF, and a " +
    "degenerate boilerplate cluster is REPORTED, not silent") {
    import spark.implicits._
    // healthy reading on the real corpus — the same fact the two cap
    // no-op pins above establish, now visible as data
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
    val healthy = Pipeline.lshCapAudit(d).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(healthy === Map("minhash" -> 0L, "simhash" -> 0L),
      s"cap fired at test SF — no-op pins and audit disagree: $healthy")
    // the ADVICE scenario: a boilerplate cluster hot enough to
    // overflow every band/segment drops ALL its pairs; the audit is
    // the signal that replaces silent recall loss. n = cap + 36
    // identical docs -> every minhash band bucket and every simhash
    // segment bucket holds n members: 16 (bands) resp. 4 (segments)
    // over-cap buckets, n members and n*(n-1)/2 skipped pairs each.
    val n = Pipeline.LshBucketCap + 36L
    val boiler = (1L to n)
      .map(i => (i, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    val rows = Pipeline.lshCapAudit(boiler).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val pairsPerBucket = n * (n - 1) / 2
    assert(rows("minhash") === ((16L, n, 16L, 16L * n, 16L * pairsPerBucket)),
      s"minhash audit mismatch: ${rows("minhash")}")
    assert(rows("simhash") === ((4L, n, 4L, 4L * n, 4L * pairsPerBucket)),
      s"simhash audit mismatch: ${rows("simhash")}")
  }

  test("p20 two-phase prefix sum == naive single-window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
    val twoPhase = Pipeline.packSequences(d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    // the plan that dies at scale but is trivially correct: one global
    // window over everything
    val naive = d
      .select(col("doc_id"), size(split(lower(regexp_replace(trim(col("text")),
        "\\s+", " ")), " ")).cast("long").as("n_toks"))
      .withColumn("start_tok", coalesce(sum(col("n_toks")).over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect()
      .map { r =>
        val start = r.getLong(2)
        val off = start % Pipeline.PackBudget
        (r.getLong(0), (r.getLong(1), start / Pipeline.PackBudget, off,
          off + r.getLong(1) > Pipeline.PackBudget))
      }.toMap
    assert(twoPhase === naive)
  }

  test("int8 quantized top-k keeps high recall vs exact float top-k") {
    def topk(name: String): Map[Long, Set[Long]] =
      run(name).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topk("p07_sim_topk")
    val quant = topk("p26_sim_topk_int8")
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (q, ex) =>
      quant(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"int8 quantization lost too much recall: $mean")
  }

  test("kmv sketch: k smallest distinct, order/partition independent, " +
    "exact below k") {
    import graft.functions.SketchFunctions.kmv_sketch
    import spark.implicits._
    // 1000 values with duplicates, shuffled; k smallest distinct = 0..9
    val vals = (0L until 500L) ++ (0L until 500L)
    val shuffled = new scala.util.Random(7).shuffle(vals)
    Seq(1, 7).foreach { parts =>
      val sk = shuffled.toDF("h").repartition(parts)
        .agg(kmv_sketch(col("h"), 10).as("sk"))
        .head().getSeq[Long](0)
      assert(sk == (0L until 10L), s"parts=$parts got $sk")
    }
    // fewer than k distinct values: the sketch IS the distinct set
    val small = Seq(5L, 3L, 5L, 9L).toDF("h")
      .agg(kmv_sketch(col("h"), 10).as("sk")).head().getSeq[Long](0)
    assert(small == Seq(3L, 5L, 9L))
    // p24 bench split never leaks into the flagged output
    val contaminated = run("p24_contamination")
      .filter(col("doc_id") % 100 === 0).count()
    assert(contaminated == 0, "benchmark docs must not be flagged")
  }

  test("kmv sketch state round-trips through serialization") {
    // the exchange between partial and final aggregation ships the
    // buffer through serialize/deserialize — pin that path directly
    val sk = graft.functions.KmvSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 4)
    val buf = sk.createAggregationBuffer()
    Seq(9L, 2L, 7L, 2L, 5L, 1L).foreach(buf.add(_))
    val restored = sk.deserialize(sk.serialize(buf))
    assert(restored.equals(buf))
    val merged = sk.merge(sk.createAggregationBuffer(), restored)
    // merge respects the k bound: 6 distinct in, 4 smallest kept
    assert(sk.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq == Seq(1L, 2L, 5L, 7L))
  }

  test("p34 bloom: one-sided error — every exact hit is a bloom hit") {
    val rows = run("p34_contam_bloom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, bloom, exact, fp) =>
      assert(bloom >= exact, s"doc $doc: false negative ($bloom < $exact)")
      assert(fp === bloom - exact, s"doc $doc: fp accounting broken")
      assert(bloom <= n, s"doc $doc: more hits than shingles")
    }
    assert(rows.map(_._4).sum > 0, "corpus should have real contamination")
    // bench split itself never appears on the probe side
    assert(rows.forall(_._1 % 100 != 0), "benchmark docs must not be probed")
  }

  test("text stats sanity: ttr in (0,1], avg token len positive") {
    val rows = run("p09_text_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ttr = r.getDouble(4)
      assert(ttr > 0 && ttr <= 1.0)
      assert(r.getDouble(3) > 0)
      assert(r.getLong(2) <= r.getLong(1)) // uniq <= total
    }
  }

  test("p36 winnowing == independent sequential winnow; density bound") {
    import java.security.MessageDigest
    def h60(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    // sequential reference: same normalization (space-trim, collapse
    // whitespace, lowercase), 3-gram h60 stream, window w=4 min with
    // rightmost tie-break — written as the obvious loop, no packing
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().flatMap { r =>
        val tk = seqToks(r.getString(1))
        if (tk.length < 6) Seq.empty[(Long, Long, Long)]
        else {
          val grams =
            Array.tabulate(tk.length - 2)(i => h60(tk.slice(i, i + 3).mkString(" ")))
          (0 until grams.length - 3).map { i0 =>
            var bj = i0
            var j = i0 + 1
            while (j <= i0 + 3) { if (grams(j) <= grams(bj)) bj = j; j += 1 }
            (r.getLong(0), (bj + 1).toLong, grams(bj))
          }
        }
      }.toSet
    val got = run("p36_winnowing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // the winnowing guarantee: every window of 4 consecutive gram
    // positions contains a selected fingerprint
    got.groupBy(_._1).values.foreach { s =>
      val ps = s.map(_._2).toSeq.sorted
      assert(ps.head <= 4, s"first pick too late: ${ps.head}")
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= 4, s"gap $a -> $b exceeds w")
        case _         =>
      }
    }
  }

  test("p98 winnow containment == brute recompute from the p36 " +
    "fingerprint sets (df cap + full-size denominator + threshold)") {
    val fps = run("p36_winnowing").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet[(Long, Long)]
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // df cap on the POSTINGS, full set size in the DENOMINATOR —
    // recomputed the obvious way from the entry p98 consumes
    val df = fps.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size).toMap
    val surviving = fps.view.mapValues(_.filter(df(_) <= 64L)).toMap
    val docs = fps.keys.toSeq.sorted
    val expected = (for {
      i <- docs.indices.iterator
      j <- (i + 1 until docs.length).iterator
      a = docs(i); b = docs(j)
      common = (surviving(a) & surviving(b)).size
      if common > 0
      cont = BigDecimal(common.toDouble /
        math.min(fps(a).size, fps(b).size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cont >= 0.5
    } yield (a, b) -> ((common.toLong, cont))).toMap
    val got = run("p98_winnow_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty, "corpus should have winnow-containment pairs")
    assert(got === expected)
  }

  test("p37 containment >= jaccard on every strong-jaccard pair " +
    "(same candidate generator, asymmetric measure dominates)") {
    val jac = run("p03_dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = run("p37_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.nonEmpty, "corpus should have containment pairs")
    val strong = jac.filter(_._2 >= 0.8)
    assert(strong.keySet.subsetOf(cont.keySet),
      s"missing: ${strong.keySet -- cont.keySet}")
    strong.foreach { case (k, j) =>
      assert(cont(k) >= j - 1e-6, s"pair $k containment ${cont(k)} < jaccard $j")
    }
  }

  test("p39 domain mixing: weights normalize, low-resource strata get " +
    "higher rates, hash sample stays within stratum bounds") {
    val rows = run("p39_domain_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4,
      "alpha weights must normalize")
    rows.foreach { case (l, n, _, rate, sampled) =>
      assert(rate > 0 && rate <= 1.0, s"$l rate $rate")
      assert(sampled <= n, s"$l sampled $sampled of $n")
    }
    // alpha = 0.7 < 1 flattens the distribution: among uncapped strata
    // the per-doc rate is strictly non-increasing in stratum size
    rows.filter(_._4 < 1.0).sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._4 >= b._4 - 1e-9, s"$a then $b")
      case _           =>
    }
  }

  test("p40 repetition == sequential recompute of top n-gram coverage") {
    def rnd6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val got = run("p40_repetition").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    val exp = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().flatMap { r =>
        val tk = seqToks(r.getString(1))
        if (tk.length < 3) None
        else {
          val n = tk.length.toLong
          def top(k: Int): Long = tk.sliding(k).map(_.mkString(" ")).toSeq
            .groupBy(identity).values.map(_.size).max.toLong
          val (t2, t3) = (top(2), top(3))
          val (f2, f3) = (rnd6(t2 * 2.0 / n), rnd6(t3 * 3.0 / n))
          Some(r.getLong(0) -> ((n, t2, f2, t3, f3, f2 > 0.2 || f3 > 0.18)))
        }
      }.toMap
    assert(got === exp)
    assert(got.values.exists(_._6), "corpus should flag some repetition")
  }

  test("p41 LM quality == sequential bigram-LM recompute") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def micro(x: Double): Long =
      JBD.valueOf(x * 1e6).setScale(0, RM.HALF_UP).longValue()
    def rnd6(x: Double): Double =
      JBD.valueOf(x).setScale(6, RM.HALF_UP).doubleValue()
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        seqToks(r.getString(2))))
    val posts = rows.flatMap { case (id, lang, tk) =>
      if (tk.length < 2) Nil
      else tk.sliding(2).map(p => (id, lang, p(0), p(1))).toSeq
    }
    val c2 = posts.groupBy(p => (p._2, p._3, p._4)).view.mapValues(_.length)
    val c1 = posts.groupBy(p => (p._2, p._3)).view.mapValues(_.length)
    val vocab = posts.flatMap(p => Seq((p._2, p._3), (p._2, p._4)))
      .distinct.groupBy(_._1).view.mapValues(_.length)
    // the libm-free term: iln6(c2+1) - iln6(c1+v) through the shared
    // kernel mirror of the in-plan integer algorithm
    val li = c2.toMap.map { case (k @ (lang, w1, _), n2) =>
      k -> (graft.kernel.IntLn.iln6(n2 + 1L) -
        graft.kernel.IntLn.iln6(c1((lang, w1)).toLong + vocab(lang)))
    }
    val exp = posts.groupBy(p => (p._1, p._2)).map { case ((id, lang), ps) =>
      val s = ps.map(p => li((lang, p._3, p._4))).sum
      val n = ps.length.toLong
      // exact HALF_UP micro average, mirroring the in-plan fold
      (id, lang) -> ((n, -(((-s) + n / 2) / n).toDouble / 1e6))
    }
    val got = run("p41_lm_quality").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === exp)
  }

  test("p42 CDC chunks == sequential recompute; chunks tile the doc") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val exp = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().flatMap { r =>
        val tk = seqToks(r.getString(1))
        val bs = tk.indices.filter(i => h32(tk(i)) % 16 == 0).map(_ + 1)
        val starts = 1 +: bs.map(_ + 1)
        val ends = bs :+ tk.length
        starts.zip(ends).filter { case (s0, e) => s0 <= e }
          .zipWithIndex.map { case ((s0, e), k) =>
            (r.getLong(0), (k + 1).toLong, s0.toLong, (e - s0 + 1).toLong,
              h60(tk.slice(s0 - 1, e).mkString(" ")))
          }
      }.toSet
    val got = run("p42_cdc_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === exp)
    // chunks tile each token stream exactly: starts contiguous, lengths
    // sum to the token count
    got.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.toSeq.sortBy(_._2)
      assert(sorted.head._3 === 1L, s"doc $id first chunk not at 1")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 === a._3 + a._4,
          s"doc $id gap between chunks ${a._2} and ${b._2}")
        case _         =>
      }
    }
  }

  test("p43 crossmodal check covers exactly the strong text pairs, " +
    "with the flag equal to the cosine threshold") {
    val strong = run("p03_dedup_ngram_jaccard").collect()
      .filter(_.getDouble(2) >= 0.8)
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = run("p43_crossmodal_check").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet === strong.keySet,
      "one consistency row per strong text pair")
    got.foreach { case (k, (j, c, f)) =>
      assert(j === strong(k), s"pair $k jaccard")
      assert(c >= -1.0 - 5e-7 && c <= 1.0 + 5e-7, s"pair $k cosine $c")
      assert(f === (c >= 0.5), s"pair $k flag")
    }
  }

  test("p35 semdedup: sound subset of the exact all-pairs cosine set, " +
    "with matching similarity values") {
    val got = run("p35_semdedup").collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty, "corpus should have near-dup embedding pairs")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val dot = (a: String, b: String) =>
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
    val exact = e.toDF("a", "ea").crossJoin(e.toDF("b", "eb"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(expr(s"${dot("ea", "eb")} / (sqrt(${dot("ea", "ea")}) * " +
          s"sqrt(${dot("eb", "eb")}))"), 6).as("c"))
      .filter(col("c") >= 0.4 - 1e-6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case (k, c) =>
      assert(exact.contains(k), s"pair $k not in the exact >=0.4 set")
      assert(math.abs(exact(k) - c) <= 2e-6, s"pair $k: $c vs ${exact(k)}")
    }
  }

  test("p44 duplicated-span coverage == sequential recompute; " +
    "whole-doc exact dups have full coverage") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> seqToks(r.getString(1)))
    val perDoc = rows.flatMap { case (id, tk) =>
      tk.sliding(8).filter(_.length == 8).map(g => (id, g.mkString(" ")))
        .toSeq.groupBy(identity).map { case ((i, g), ps) =>
          (i, g, ps.size.toLong)
        }
    }
    val df = perDoc.groupBy(_._2).view.mapValues(_.size).toMap
    val exp = perDoc.groupBy(_._1).map { case (id, gs) =>
      val total = gs.map(_._3).sum
      val dup = gs.filter(g => df(g._2) >= 2).map(_._3).sum
      id -> ((total, dup, dup.toDouble / total))
    }
    val got = run("p44_dupspan").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === exp)
    // the corpus's boilerplate overlap (p03 finds strong pairs) must
    // show up as shared spans
    assert(got.values.exists(_._2 > 0), "expected duplicated spans")
    // every doc that is an exact whole-text duplicate of another doc
    // must have dup_frac 1.0 — span coverage dominates whole-doc dedup
    // (the test corpus may have no such docs; the property is pinned
    // whenever they exist)
    rows.groupBy(_._2.mkString(" ")).values
      .filter(_.length >= 2).flatMap(_.map(_._1))
      .filter(got.contains) // docs with >= 8 tokens
      .foreach { id =>
        assert(got(id)._3 === 1.0, s"exact-dup doc $id not fully covered")
      }
  }

  test("p45 DSIR weights == sequential recompute; target-source docs " +
    "score higher on average than the rest") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    import java.security.MessageDigest
    def micro(x: Double): Long =
      JBD.valueOf(x * 1e6).setScale(0, RM.HALF_UP).longValue()
    def h32(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        seqToks(r.getString(2)).map(t => h32(t) % 4096)))
    val cr = new scala.collection.mutable.HashMap[Long, Long]()
    val ct = new scala.collection.mutable.HashMap[Long, Long]()
    rows.foreach { case (_, src, bs) =>
      bs.foreach { b =>
        cr(b) = cr.getOrElse(b, 0L) + 1
        if (src == "src0") ct(b) = ct.getOrElse(b, 0L) + 1
      }
    }
    val nr = cr.values.sum; val nt = ct.values.sum
    val li = cr.keys.map(b => b -> micro(math.log(
      ((ct.getOrElse(b, 0L) + 1.0) * (nr + 4096)) /
        ((cr(b) + 1.0) * (nt + 4096))))).toMap
    val exp = rows.map { case (id, _, bs) =>
      id -> ((bs.length.toLong,
        bs.map(li).sum.toDouble / 1e6 / bs.length))
    }.toMap
    val got = run("p45_dsir_weight").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === exp)
    // the importance weight must separate the target domain: src0 docs
    // average strictly higher than non-src0 docs
    val bySrc = rows.map { case (id, src, _) => id -> src }.toMap
    val (t, o) = got.partition { case (id, _) => bySrc(id) == "src0" }
    def mean(xs: Iterable[Double]): Double = xs.sum / xs.size
    assert(mean(t.values.map(_._2)) > mean(o.values.map(_._2)),
      "target-domain docs should have higher mean importance weight")
  }

  test("p46 Zipf slope == exact BigInt sequential recompute; " +
    "slopes are negative and Zipf-ish") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def micro(x: Double): Long =
      JBD.valueOf(x * 1e6).setScale(0, RM.HALF_UP).longValue()
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), seqToks(r.getString(1))))
    val exp = rows.groupBy(_._1).map { case (lang, ds) =>
      val cnt = ds.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      val ranked = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      val pts = ranked.map { case ((_, c), i) =>
        (BigInt(micro(math.log(i + 1.0))), BigInt(micro(math.log(c))))
      }
      val n = BigInt(pts.length)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      lang -> ((pts.length.toLong,
        (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble))
    }
    val got = run("p46_zipf_slope").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === exp)
    got.values.foreach { case (_, slope) =>
      assert(slope < 0.0, "rank-frequency slope must be negative")
      assert(slope > -3.0 && slope < -0.05, s"implausible Zipf slope $slope")
    }
  }

  test("p47 CMS: one-sided error (est >= true always), true counts == " +
    "sequential recompute, rows are the true top-30") {
    val got = run("p47_cms_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 30)
    got.foreach { case (t, cnt, est, over) =>
      assert(est >= cnt, s"token '$t': CMS must never under-count")
      assert(over === est - cnt, s"token '$t' overcount column")
    }
    // true counts + top-30 membership from the sequential tokenizer
    val trueCnt = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .flatMap(r => seqToks(r.getString(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top30 = trueCnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(30)
    assert(got.map(g => (g._1, g._2)).toSeq === top30,
      "result must be exactly the true top-30 by (count desc, token)")
  }

  /** First 8 hex chars of md5 as a long — the Scala mirror of
    * HashScheme.h32Spark/h32Duck for sequential recomputes.
    */
  private def h32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString, 16)

  /** Sequential mirror of Pipeline.ivfSeedCents' id choice: the IvfK
    * ids with the smallest salted h60 — shared by the p15/p35/p55/p63/
    * p81 recomputes so the fixed-k convention is pinned in ONE place.
    */
  private def ivfSeedIds(ids: Iterable[Long]): Set[Long] = {
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15), 16)
    ids.toSeq.sortBy(id => (h60(s"$id:ivfseed"), id))
      .take(Pipeline.IvfK).toSet
  }

  test("p48 JL projection == exact integer sequential recompute; " +
    "projected cosine tracks exact cosine on sample pairs") {
    val got = run("p48_jl_project").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 1e6) " +
          "as bigint)) as x6")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val sgn = Array.tabulate(64, 16)((i, j) =>
      if (h32(s"jl:$i:$j") % 2 == 0) 1L else -1L)
    val expected = vecs.flatMap { case (id, x6) =>
      (0 until 16).map(j =>
        (id, j.toLong) -> x6.indices.map(i => sgn(i)(j) * x6(i)).sum)
    }
    assert(got === expected)
    // JL sanity: on sampled pairs, the 16-dim projected cosine must
    // correlate with the exact 64-dim cosine (loose bound; k=16)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum) /
        math.sqrt(b.map(x => x * x).sum)
    }
    val ids = vecs.keys.toSeq.sorted.take(40)
    val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
    val (ex, pr) = pairs.map { case (a, b) =>
      val pa = (0 until 16).map(j => got((a, j.toLong)).toDouble).toArray
      val pb = (0 until 16).map(j => got((b, j.toLong)).toDouble).toArray
      (cos(vecs(a).map(_.toDouble), vecs(b).map(_.toDouble)), cos(pa, pb))
    }.unzip
    val mx = ex.sum / ex.size; val mp = pr.sum / pr.size
    val corr = ex.zip(pr).map { case (x, y) => (x - mx) * (y - mp) }.sum /
      math.sqrt(ex.map(x => (x - mx) * (x - mx)).sum) /
      math.sqrt(pr.map(y => (y - mp) * (y - mp)).sum)
    assert(corr > 0.5, f"JL projection lost the geometry: corr=$corr%.3f")
  }

  test("p49 inverted index == sequential recompute; df cap honored") {
    val got = run("p49_inverted_index").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val tk = seqToks(r.getString(1))
        tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))
          .toSeq.distinct.map(bg => bg -> r.getLong(0))
      }
      .groupBy(_._1).view
      .mapValues(ps => (ps.length.toLong, ps.map(_._2).sorted.mkString(",")))
      .filter(_._2._1 <= 5).toMap
    assert(got === expected)
    assert(got.nonEmpty, "corpus should have rare bigrams")
    got.values.foreach { case (df, ps) =>
      assert(ps.split(",").length.toLong === df, "df == postings length")
    }
  }

  test("p50 shard manifest == sequential recompute; positions are " +
    "dense 1..n per shard; shards are hash-balanced") {
    val got = run("p50_shard_manifest").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.map(id => (id, h32(s"$id:shard") % 64,
        h32(s"$id:ord")))
      .groupBy(_._2).view.mapValues(_.sortBy(r => (r._3, r._1))
        .zipWithIndex.map { case ((id, sh, _), i) =>
          id -> ((sh, (i + 1).toLong)) }).values.flatten.toMap
    assert(got === expected)
    // dense positions per shard
    got.values.groupBy(_._1).foreach { case (sh, rs) =>
      assert(rs.map(_._2).toSeq.sorted === (1L to rs.size).toSeq,
        s"shard $sh positions not dense")
    }
    // no empty and no pathologically hot shard at 500 docs / 64 shards
    val sizes = got.values.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.values.max <= 25, s"hot shard: ${sizes.values.max}")
  }

  test("p51 curriculum: quartiles are balanced and score-monotone; " +
    "keep decisions == salted-hash recompute") {
    val got = run("p51_curriculum").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val rates = Map(1L -> 1000L, 2L -> 700L, 3L -> 400L, 4L -> 100L)
    got.foreach { case (id, _, _, bucket, rate, keep) =>
      assert(rates(bucket) === rate, s"doc $id rate")
      assert(keep === (h32(s"$id:cur") % 1000 < rate), s"doc $id keep")
    }
    got.groupBy(_._2).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._4).view.mapValues(_.size)
      assert(sizes.keySet === Set(1L, 2L, 3L, 4L), s"$lang buckets")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang quartiles unbalanced: $sizes")
      // monotone: every bucket-k score >= every bucket-(k+1) score
      (1L to 3L).foreach { b =>
        val lo = rs.filter(_._4 === b).map(_._3).min
        val hi = rs.filter(_._4 === b + 1).map(_._3).max
        assert(lo >= hi, s"$lang bucket $b not score-monotone")
      }
    }
  }

  test("p52 pagerank == exact integer sequential recompute; connected " +
    "docs outrank isolated ones; mass stays within the floor-leak bound") {
    val got = run("p52_pagerank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = run("p04_dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = nodes.map(_ -> 1000000L).toMap
    (1 to 5).foreach { _ =>
      val cin = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        rank(u) * 85 / (100 * deg(u))
      }.sum).toMap
      rank = nodes.map(n => n -> (150000L + cin.getOrElse(n, 0L))).toMap
    }
    assert(got === rank)
    val connected = edges.map(_._1).toSet
    if (connected.nonEmpty && connected.size < nodes.length) {
      val isolatedRank = 150000L
      assert(connected.forall(n => got(n) > isolatedRank),
        "every connected doc must outrank the isolated baseline")
      nodes.filterNot(connected).foreach(n =>
        assert(got(n) === isolatedRank, s"isolated $n must sit at base"))
    }
    // damped mass: N·0.15e6 <= total <= N·1e6 (floor only leaks down)
    val total = got.values.sum
    assert(total >= nodes.length * 150000L && total <= nodes.length * 1000000L,
      s"total rank mass $total outside bounds")
  }

  test("p53 novelty == sequential first-bearer recompute; the lowest " +
    "doc_id is fully novel") {
    val got = run("p53_novelty").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val grams = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        seqToks(r.getString(1)).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet)
      .filter(_._2.nonEmpty).toMap
    val firstSeen = grams.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = grams.map { case (id, gs) =>
      id -> ((gs.size.toLong, gs.count(g => firstSeen(g) == id).toLong))
    }
    assert(got === expected)
    val minId = grams.keys.min
    assert(got(minId)._1 === got(minId)._2,
      "the first document must be 100% novel")
  }

  test("p54 calibration: buckets partition the LSH pair set, bucket " +
    "means sit inside their bucket, gap is |est - true| on average") {
    val got = run("p54_minhash_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val pairCount = Pipeline.minhashLshPairs(
      spark.read.parquet(s"$sfDir/documents.parquet")).count()
    assert(got.map(_._2).sum === pairCount,
      "n_pairs must sum to the LSH candidate-pair count")
    got.foreach { case (bucket, n, meanEst, meanTrue, gap) =>
      assert(n > 0)
      // est >= 0.5 -> est64 in [32, 64] -> bucket in [4, 8]
      assert(bucket >= 4L && bucket <= 8L, s"bucket $bucket out of range")
      assert(meanEst >= bucket * 8 / 64.0 - 1e-9 &&
        meanEst < (bucket + 1) * 8 / 64.0 + 1e-9,
        s"bucket $bucket mean_est $meanEst outside its bin")
      assert(meanTrue >= 0.0 && meanTrue <= 1.0)
      assert(gap >= math.abs(meanEst - meanTrue) - 1e-6,
        "mean |gap| can never undercut |mean gap|")
    }
  }

  test("p55 k-means == sequential Lloyd recompute (3 iterations, " +
    "integer-exact); refinement does not worsen the objective") {
    val got = run("p55_kmeans_refine").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(cast(embedding as array<double>), " +
          "x -> cast(round(x*1000000) as bigint)) as ei")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignAll(cents: Map[Long, Array[Long]]) = vecs.map {
      case (id, ei) =>
        id -> cents.toSeq
          .map { case (c, ci) => (c, d2(ei, ci)) }
          .minBy { case (c, dd) => (dd, c) }
    }
    val seedIds = ivfSeedIds(vecs.keys)
    var cents = vecs.collect { case (id, ei) if seedIds(id) => id -> ei }
      .toMap
    val initialObjective = assignAll(cents).values.map(_._2).sum
    (1 to 3).foreach { _ =>
      val byCell = assignAll(cents).toSeq.groupBy(_._2._1)
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case None => cid -> old // emptied cell keeps its centroid
          case Some(members) =>
            val eis = members.map(m => vecs(m._1))
            cid -> Array.tabulate(old.length) { d =>
              val s = eis.map(e => BigInt(e(d))).sum
              // same op order AND rounding as both engines: exact sum ->
              // double division -> HALF_UP (Math.round would round
              // negative halves toward +inf instead of away from zero)
              java.math.BigDecimal.valueOf(s.toDouble / eis.length)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            }
        }
      }
    }
    val fin = assignAll(cents)
    val sizes = fin.values.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = fin.map { case (id, (cid, dd)) =>
      id -> ((cid, dd, sizes(cid)))
    }
    assert(got === expected)
    assert(sizes.size > 1, "clustering must use more than one cell")
    assert(fin.values.map(_._2).sum <= initialObjective,
      "3 Lloyd rounds must not worsen the seed objective")
  }

  test("p56 fair survivor: exactly one keep per content group, the " +
    "min-draw member; dup groups can out-vote the first copy") {
    val got = run("p56_dedup_fair_survivor").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val byHash = got.groupBy(_._2)
    byHash.values.foreach { g =>
      assert(g.count(_._5) === 1, "one survivor per content group")
      val winner = g.minBy(r => (r._4, r._1))
      assert(winner._5, "the survivor is the (draw, doc_id) minimum")
      g.foreach(r => assert(r._3 === g.length.toLong, "n_copies"))
    }
    // the fairness point: where dup groups exist (sf0.01+ — the spec
    // corpus at sf0.001 has none, the driver oracle covers them), at
    // least one survivor is NOT the smallest doc_id (else this is p02
    // again). Pinned here on a synthetic dup frame via the same
    // (draw, doc_id) rule.
    val dupGroups = byHash.values.filter(_.length > 1)
    if (dupGroups.nonEmpty)
      assert(dupGroups.exists(g => !g.minBy(_._1)._5),
        "hash draw must sometimes pick a non-first survivor")
    def h32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)
    val draws = (0L to 40L).map(id => id -> h32(s"$id:fair"))
    assert(draws.minBy(_._2)._1 !== draws.map(_._1).min,
      "over 41 synthetic ids the min draw must not be id 0 " +
        "(fairness would be broken if draw order tracked id order)")
  }

  test("p57 label dispersion == brute-force pairwise recompute; tight " +
    "cohorts read near their mean square norm") {
    val got = run("p57_label_dispersion").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("label",
        "transform(cast(embedding as array<double>), " +
          "x -> cast(round(x * 1e6) as bigint)) as v6")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def div6(num: BigInt, den: BigInt): Double = {
      // the query's shifted HALF_UP floor-div, exactly
      val k = BigInt(8000000)
      (((num + k * den + den / 2) / den) - k).toDouble / 1e6
    }
    val expected = vecs.collect { case (label, vs) if vs.length >= 2 =>
      val n = vs.length
      // the O(n²) definition the query's Gram identity replaces
      val pairSum = (for {
        i <- vs.indices; j <- vs.indices if i != j
      } yield vs(i).zip(vs(j)).map { case (a, b) => BigInt(a) * b }.sum)
        .sum
      val sqSum = vs.map(v => v.map(x => BigInt(x) * x).sum).sum
      label -> ((n.toLong,
        div6(pairSum, BigInt(1000000) * n * (n - 1)),
        (((sqSum + BigInt(500000) * n) / (BigInt(1000000) * n)).toDouble
          / 1e6)))
    }
    assert(got === expected)
    got.values.foreach { case (n, pd, msn) =>
      assert(n >= 2L)
      // a mean pairwise dot can never exceed the mean square norm
      assert(pd <= msn + 1e-9)
    }
  }

  test("p58 BM25 == sequential recompute (exact integer term " +
    "contributions, Lucene idf); ranks are dense and self is excluded") {
    val got = run("p58_bm25_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> seqToks(r.getString(1)).toSeq).toMap
    val nDocs = docs.size.toLong
    val aToks = docs.values.map(_.length.toLong).sum
    val df = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def idf6(d: Long): Long =
      math.round(math.log((nDocs + 1.0) / (d + 0.5)) * 1e6)
    val scores = for {
      (q, qt) <- docs.toSeq if q % 100 == 0
      (d, dt) <- docs.toSeq if d != q
      shared = qt.distinct.toSet.intersect(dt.distinct.toSet)
      if shared.nonEmpty
    } yield {
      val dl = dt.length.toLong
      val s6 = shared.toSeq.map { t =>
        val tf = dt.count(_ == t).toLong
        val den = BigInt(10) * tf * aToks + BigInt(3) * aToks +
          BigInt(9) * dl * nDocs
        val num = BigInt(idf6(df(t))) * 22 * tf * aToks
        ((num + den / 2) / den).toLong
      }.sum
      (q, d, shared.size.toLong, s6)
    }
    val expected = scores.groupBy(_._1).flatMap { case (q, cands) =>
      cands.sortBy(c => (-c._4, c._2)).take(5).zipWithIndex.map {
        case ((_, d, nt, s6), i) =>
          (q, d) -> ((nt, s6.toDouble / 1e6, i + 1L))
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
    got.keys.foreach { case (q, d) => assert(q != d, "self-retrieval") }
  }

  test("p59 PQ == sequential recompute (codebook, codes, ADC); codes " +
    "index real centroids and self is excluded") {
    val got = run("p59_pq_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(cast(embedding as array<double>), " +
          "x -> cast(round(x * 1e6) as bigint)) as v6")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val M = Pipeline.PqM; val sub = Pipeline.PqSub
    def subv(v: Array[Long], m: Int): Array[Long] =
      v.slice(m * sub, (m + 1) * sub)
    val cents = vecs.keys
      .filter(id => id % 31 == 0 && id < Pipeline.PqSeedBound).toSeq.sorted
    assert(cents.nonEmpty)
    // encode: per (vec, m) the (d2, cid)-min centroid
    val codes = for ((id, v) <- vecs.toSeq; m <- 0 until M) yield {
      val best = cents.map { c =>
        val cs = subv(vecs(c), m)
        val d2 = subv(v, m).zip(cs)
          .map { case (a, b) => (a - b) * (a - b) }.sum
        (d2, c)
      }.min
      ((id, m), best._2)
    }
    val codeMap = codes.toMap
    val queries = vecs.keys.filter(_ % 50 == 0).toSeq
    val scores = for (q <- queries; (d, _) <- vecs.toSeq if d != q) yield {
      val s = (0 until M).map { m =>
        val c = codeMap((d, m))
        subv(vecs(q), m).zip(subv(vecs(c), m))
          .map { case (a, b) => a * b }.sum
      }.sum
      (q, d, s)
    }
    val expected = scores.groupBy(_._1).flatMap { case (q, cands) =>
      cands.sortBy(c => (-c._3, c._2)).take(5).zipWithIndex.map {
        case ((_, d, s), i) =>
          (q, d) -> ((s, s.toDouble / 1e12, i + 1L))
      }
    }
    assert(got === expected)
    got.keys.foreach { case (q, d) => assert(q != d) }
    assert(got.nonEmpty)
  }

  test("p60 hybrid RRF == sequential fusion of the two top-10 lists; " +
    "every fused hit is in at least one list") {
    def rnd6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val got = run("p60_hybrid_rrf").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getDouble(4),
          r.getLong(5)))).toMap
    // lexical side: the p58 sequential BM25, top-10 per query
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> seqToks(r.getString(1)).toSeq).toMap
    val nDocs = docs.size.toLong
    val aToks = docs.values.map(_.length.toLong).sum
    val df = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def idf6(d: Long): Long =
      math.round(math.log((nDocs + 1.0) / (d + 0.5)) * 1e6)
    val lexRank: Map[(Long, Long), Long] = docs.keys.filter(_ % 100 == 0)
      .flatMap { q =>
        val qt = docs(q).distinct.toSet
        val cands = docs.toSeq.filter(_._1 != q).flatMap { case (d, dt) =>
          val shared = qt.intersect(dt.distinct.toSet)
          if (shared.isEmpty) None
          else {
            val dl = dt.length.toLong
            val s6 = shared.toSeq.map { tk =>
              val tf = dt.count(_ == tk).toLong
              val den = BigInt(10) * tf * aToks + BigInt(3) * aToks +
                BigInt(9) * dl * nDocs
              ((BigInt(idf6(df(tk))) * 22 * tf * aToks + den / 2) / den)
                .toLong
            }.sum
            Some((d, s6))
          }
        }
        cands.sortBy(c => (-c._2, c._1)).take(10).zipWithIndex
          .map { case ((d, _), i) => (q, d) -> (i + 1L) }
      }.toMap
    // dense side: CosineSim's exact double-op order, round(6), top-10
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      var na = 0.0; i = 0
      while (i < a.length) { na += a(i) * a(i); i += 1 }
      var nb = 0.0; i = 0
      while (i < a.length) { nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val denseRank: Map[(Long, Long), Long] = vecs.keys.filter(_ % 100 == 0)
      .flatMap { q =>
        vecs.toSeq.filter(_._1 != q)
          .map { case (d, v) => (d, rnd6(cos(vecs(q), v))) }
          .sortBy(c => (-c._2, c._1)).take(10).zipWithIndex
          .map { case ((d, _), i) => (q, d) -> (i + 1L) }
      }.toMap
    val expected = (lexRank.keySet ++ denseRank.keySet).groupBy(_._1)
      .flatMap { case (q, keys) =>
        keys.toSeq.map { k =>
          val rrf6 = lexRank.get(k).map(r => 1000000L / (60 + r))
            .getOrElse(0L) +
            denseRank.get(k).map(r => 1000000L / (60 + r)).getOrElse(0L)
          (k._2, rrf6)
        }.sortBy(c => (-c._2, c._1)).take(5).zipWithIndex.map {
          case ((d, rrf6), i) =>
            (q, d) -> ((lexRank.contains((q, d)), denseRank.contains((q, d)),
              rrf6.toDouble / 1e6, i + 1L))
        }
      }
    assert(got === expected)
    got.foreach { case (_, (inL, inD, rrf, _)) =>
      assert(inL || inD, "fused hit must come from a list")
      assert(rrf > 0.0)
    }
  }

  test("p61 incremental dedup == sequential recompute over the two " +
    "splits; canonicals resolve and prior content never re-pairs") {
    val got = run("p61_dedup_incremental").collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    def normStr(t: String): String =
      t.trim.replaceAll("\\s+", " ").toLowerCase
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> normStr(r.getString(1)))
    val prior = all.filter(_._1 % 7 != 0)
    val batch = all.filter(_._1 % 7 == 0)
    val priorMin = prior.groupBy(_._2).view.mapValues(_.map(_._1).min)
    val batchMin = batch.groupBy(_._2).view.mapValues(_.map(_._1).min)
    val expected = batch.map { case (id, txt) =>
      priorMin.get(txt) match {
        case Some(p) => id -> (("dup_prior", p))
        case None if batchMin(txt) < id => id -> (("dup_batch", batchMin(txt)))
        case None => id -> (("new", id))
      }
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
    // every canonical must resolve to a real doc that is not itself a
    // later duplicate
    val canon = got.values.map(_._2).toSet
    canon.foreach { c =>
      assert(got.get(c).forall(_._1 == "new") ||
        prior.exists(_._1 == c), s"canonical $c must be prior or 'new'")
    }
  }

  test("p62 label audit == sequential recompute; the cross_lingual " +
    "flag fires on an injected mislabeled duplicate") {
    def normStr(t: String): String =
      t.trim.replaceAll("\\s+", " ").toLowerCase
    val got = run("p62_dup_lang_consistency").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getBoolean(5)))).toMap
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), normStr(r.getString(1)), r.getString(2)))
    val expectedSize = all.map(_._2).distinct.length
    assert(got.size === expectedSize)
    val byText = all.groupBy(_._2)
    byText.foreach { case (_, rows) =>
      val langs = rows.map(_._3).distinct.sorted
      val hit = got.values.find(v =>
        v._2 === rows.map(_._1).min && v._1 === rows.length.toLong)
      assert(hit.isDefined, s"group of ${rows.map(_._1).min} missing")
      assert(hit.get._4 === langs.mkString(","))
      assert(hit.get._5 === (langs.length > 1))
    }
    // the corpus has no cross-lingual groups — inject one and pin the
    // flag through the exposed audit core
    import spark.implicits._
    val synth = Seq(
      (1L, "same exact content here", "en"),
      (2L, "same exact content here", "fr"),
      (3L, "different content", "en"))
      .toDF("doc_id", "text", "lang")
    val audited = Pipeline.dupLangAudit(synth).collect()
      .map(r => r.getLong(2) -> ((r.getLong(1), r.getString(4),
        r.getBoolean(5)))).toMap
    assert(audited(1L) === ((2L, "en,fr", true)))
    assert(audited(3L) === ((1L, "en", false)))
    assert(got.values.forall(!_._5), "real corpus: no cross-lingual")
  }

  test("p63 IVFPQ == sequential recompute (coarse assign, residual " +
    "codebook, ADC = centroid dot + LUT sum over probed cells); self " +
    "excluded") {
    val got = run("p63_sim_ivfpq").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(cast(embedding as array<double>), " +
          "x -> cast(round(x * 1e6) as bigint)) as v6")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val M = Pipeline.PqM; val sub = Pipeline.PqSub
    def subv(v: Array[Long], m: Int): Array[Long] =
      v.slice(m * sub, (m + 1) * sub)
    def d2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val coarse = ivfSeedIds(vecs.keys).toSeq.sorted
    assert(coarse.nonEmpty)
    // (d2, ccid)-ranked cells: head = assignment, take(2) = probes
    val probes: Map[Long, Seq[Long]] = vecs.map { case (id, v) =>
      id -> coarse.map(c => (d2(v, vecs(c)), c)).sorted.take(2).map(_._2)
    }
    val res: Map[Long, Array[Long]] = vecs.map { case (id, v) =>
      id -> v.zip(vecs(probes(id).head)).map { case (x, y) => x - y }
    }
    val cents = vecs.keys
      .filter(id => id % 31 == 0 && id < Pipeline.PqSeedBound).toSeq.sorted
    assert(cents.nonEmpty)
    val codeMap = (for ((id, _) <- vecs.toSeq; m <- 0 until M) yield {
      val best = cents.map(c =>
        (d2(subv(res(id), m), subv(res(c), m)), c)).min
      ((id, m), best._2)
    }).toMap
    val queries = vecs.keys.filter(_ % 50 == 0).toSeq
    val scores = for {
      q <- queries
      cell <- probes(q)
      (d, _) <- vecs.toSeq
      if d != q && probes(d).head == cell
    } yield {
      val adot = dot(vecs(q), vecs(cell)) +
        (0 until M).map(m =>
          dot(subv(vecs(q), m), subv(res(codeMap((d, m))), m))).sum
      (q, d, adot)
    }
    val expected = scores.groupBy(_._1).flatMap { case (q, cands) =>
      cands.sortBy(c => (-c._3, c._2)).take(5).zipWithIndex.map {
        case ((_, d, s), i) =>
          (q, d) -> ((s, s.toDouble / 1e12, i + 1L))
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
    got.keys.foreach { case (q, d) => assert(q != d, "self-retrieval") }
  }

  test("p64 PII scrub == sequential Java-regex recompute (counts, " +
    "redacted md5/len); patterns fire exactly on the injection rule") {
    val got = run("p64_pii_scrub").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))).toMap
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phone = "\\b555-[0-9]{4}\\b"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val body = text +
        (if (id % 7 == 0) s" contact user$id@example.com now" else "") +
        (if (id % 11 == 0) s" from 10.${id % 256}.${id % 200}.7" else "") +
        (if (id % 13 == 0) f" call 555-${id % 10000}%04d" else "")
      val red = body.replaceAll(email, "<EMAIL>")
        .replaceAll(ipv4, "<IP>").replaceAll(phone, "<PHONE>")
      val exp = (email.r.findAllIn(body).length.toLong,
        ipv4.r.findAllIn(body).length.toLong,
        phone.r.findAllIn(body).length.toLong,
        md5hex(red), red.length.toLong)
      assert(got(id) === exp, s"doc $id")
      // the injection rule IS the expected count profile
      assert(exp._1 === (if (id % 7 == 0) 1L else 0L), s"doc $id email")
      assert(exp._2 === (if (id % 11 == 0) 1L else 0L), s"doc $id ip")
      assert(exp._3 === (if (id % 13 == 0) 1L else 0L), s"doc $id phone")
      // nothing PII-shaped survives redaction
      assert(email.r.findFirstIn(red).isEmpty &&
        ipv4.r.findFirstIn(red).isEmpty && phone.r.findFirstIn(red).isEmpty,
        s"doc $id residual PII")
    }
    assert(docs.count { case (id, _) => id % 7 == 0 } > 0,
      "corpus must exercise the email branch")
  }

  test("p65 dedup savings == recompute from the p04 pair set; counts " +
    "and savings are monotone non-increasing in the threshold") {
    val got = run("p65_dedup_savings").collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    val pairs = run("p04_dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nToks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> seqToks(r.getString(1)).length.toLong)
      .toMap
    val tot = nToks.values.sum
    val expected = Seq(0.5, 0.7, 0.9).map { thr =>
      val fired = pairs.filter(_._3 >= thr)
      val rm = fired.map(_._2).distinct
      val toks = rm.map(nToks).sum
      thr -> ((fired.length.toLong, rm.length.toLong, toks,
        ((toks * 1000000L + tot / 2) / tot).toDouble / 1e6))
    }.toMap
    assert(got === expected)
    assert(got.size === 3)
    val byThr = got.toSeq.sortBy(_._1).map(_._2)
    byThr.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo._1 >= hi._1 && lo._2 >= hi._2 && lo._3 >= hi._3,
        "raising the threshold cannot fire more")
    }
    assert(got(0.5)._1 === pairs.length.toLong,
      "0.5 is the pair generator's own floor: everything fires")
  }

  test("p66 leakage-free split: no cluster straddles splits; singleton " +
    "docs keep p31's assignment; rehomed flags exactly the moved docs") {
    val got = run("p66_split_leakfree").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3),
        r.getBoolean(4)))).toMap
    val clusters = run("p23_dedup_clusters").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val p31 = run("p31_split_assign").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got.size === p31.size)
    // same cluster -> same split, for every cluster
    got.values.groupBy(_._1).foreach { case (cid, members) =>
      assert(members.map(_._2).toSet.size === 1,
        s"cluster $cid spans splits")
    }
    got.foreach { case (doc, (cid, split, rehomed)) =>
      assert(cid === clusters(doc)._1, s"doc $doc cluster drift vs p23")
      if (clusters(doc)._2 === 1L) {
        // singleton: cluster_id == doc_id -> identical to the p31 rule
        assert(cid === doc)
        assert(split === p31(doc), s"doc $doc singleton split")
        assert(!rehomed, s"doc $doc singleton cannot be rehomed")
      }
      // rehomed <=> the per-doc rule would have placed it elsewhere
      assert(rehomed === (p31(doc) != split), s"doc $doc rehomed flag")
    }
    // the corpus's near-dup clusters must actually exercise the rehome
    // path (clusters whose members hash to different per-doc splits)
    // OR every cluster happens to agree — assert only consistency, and
    // that multi-doc clusters exist at all
    assert(clusters.values.exists(_._2 > 1L), "expected non-singletons")
  }

  test("p67 leakage audit: recomputes from the shared pair set and the " +
    "two split rules; cluster-keyed straddles are zero by construction") {
    val r = run("p67_leakage_audit").collect()
    assert(r.length === 1)
    val (nPairs, sDoc, sCluster, frac) =
      (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2),
        r.head.getDouble(3))
    // recompute from the published p04 pair set and p31/p66 splits
    val pairs = run("p04_dedup_minhash_lsh").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val p31 = run("p31_split_assign").collect()
      .map(x => x.getLong(0) -> x.getString(3)).toMap
    val p66 = run("p66_split_leakfree").collect()
      .map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(nPairs === pairs.length.toLong)
    assert(sDoc ===
      pairs.count { case (a, b) => p31(a) != p31(b) }.toLong,
      "per-doc straddle count must match the p31 rule over p04 pairs")
    assert(sCluster === 0L,
      "the cluster-keyed split may never straddle a near-dup pair")
    assert(sCluster ===
      pairs.count { case (a, b) => p66(a) != p66(b) }.toLong)
    val want =
      if (pairs.isEmpty) 0.0
      else (sDoc * 1000000L + nPairs / 2) / nPairs / 1e6
    assert(frac === want, "HALF_UP micro leak fraction")
    // the audit must have teeth on this corpus: the per-doc rule leaks
    assert(sDoc > 0L, "expected real leakage under the per-doc split")
  }

  test("p68 mixture budget == sequential water-filling recompute; " +
    "budget conserves; 3 rounds reach the fixed point on this corpus") {
    val out = run("p68_mixture_budget").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.nonEmpty)
    val t = out.map { case (s, v) => s -> v._1 }
    val total = t.values.sum
    val budget = total * 9 / 10
    // sequential water-fill, 3 rounds
    var remaining = budget
    var unsat = t.keySet
    val satRound = collection.mutable.Map.empty[String, Long]
    (1 to 3).foreach { round =>
      if (unsat.nonEmpty) {
        val q = remaining / unsat.size
        val newlySat = unsat.filter(s => t(s) <= q)
        newlySat.foreach { s =>
          satRound(s) = round.toLong
          remaining -= t(s)
        }
        unsat = unsat -- newlySat
      }
    }
    val q4 = if (unsat.isEmpty) 0L else remaining / unsat.size
    out.foreach { case (s, (ts, alloc, sr, slack, rate)) =>
      val wantAlloc = if (satRound.contains(s)) t(s) else q4
      assert(alloc === wantAlloc, s"$s alloc")
      assert(sr === satRound.getOrElse(s, 0L), s"$s sat_round")
      assert(alloc <= ts, s"$s alloc may never exceed its mass")
      assert(slack === remaining - unsat.size * q4, s"$s slack")
      val wantRate =
        if (ts > 0) ((alloc * 1000000L + ts / 2) / ts) / 1e6 else 0.0
      assert(rate === wantRate, s"$s HALF_UP rate")
      if (satRound.contains(s)) assert(rate === 1.0, s"$s saturated rate")
    }
    // conservation: allocations + slack == the declared budget
    assert(out.values.map(_._2).sum + (remaining - unsat.size * q4)
      === budget, "budget conservation")
    // corpus must exercise redistribution AND converge by round 3:
    assert(satRound.nonEmpty, "expected saturated sources")
    assert(unsat.forall(s => t(s) > q4),
      "3 rounds must reach the water-filling fixed point here")
  }

  test("p69 ANN recall report == set intersection of the p07 and p15 " +
    "catalog outputs; recall is imperfect but nonzero at nprobe=2") {
    val exact = run("p07_sim_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ivf = run("p15_sim_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = run("p69_ann_recall").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val byQuery = exact.groupBy(_._1)
    assert(out.keySet === byQuery.keySet)
    byQuery.foreach { case (q, neighbors) =>
      val hits = neighbors.count(ivf.contains).toLong
      val n = neighbors.length.toLong
      val (nExact, nHits, recall) = out(q)
      assert(nExact === n, s"q$q n_exact")
      assert(nHits === hits, s"q$q n_hits")
      assert(recall === ((hits * 1000000L + n / 2) / n) / 1e6,
        s"q$q HALF_UP recall")
    }
    val recalls = out.values.map(_._3)
    assert(recalls.exists(_ > 0.0), "nprobe=2 must find something")
    assert(recalls.exists(_ < 1.0),
      "an honest approximate index misses something here")
  }

  test("p70 chunk-dup census == sequential recompute from the p29 " +
    "chunk list; cross-doc duplicated chunks exist in this corpus") {
    val chunks = run("p29_chunk_stride").collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    val srcOf = run("p31_split_assign").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docsPerHash = chunks.groupBy(_._2)
      .map { case (h, rs) => h -> rs.map(_._1).distinct.size }
    val bySource = chunks.groupBy { case (d, _) => srcOf(d) }
    val out = run("p70_chunk_dup_census").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out.keySet === bySource.keySet)
    bySource.foreach { case (src, rs) =>
      val n = rs.length.toLong
      val dup = rs.count { case (_, h) => docsPerHash(h) > 1 }.toLong
      val (gotN, gotDup, gotFrac) = out(src)
      assert(gotN === n, s"$src n_chunks")
      assert(gotDup === dup, s"$src n_dup")
      assert(gotFrac === ((dup * 1000000L + n / 2) / n) / 1e6,
        s"$src dup_frac")
    }
    assert(out.values.exists(_._2 > 0L),
      "expected cross-doc duplicated chunks (the corpus has exact dups)")
    assert(out.values.exists(v => v._2 < v._1),
      "not everything may be duplicated")
  }

  test("p71 per-split contamination == recompute from the p24 and p66 " +
    "catalog outputs; every split is represented and contaminated here") {
    val contam = run("p24_contamination").collect()
      .map(_.getLong(0)).toSet
    val splits = run("p66_split_leakfree").collect()
      .map(r => r.getLong(0) -> r.getString(3))
      .filter { case (d, _) => d % 100 != 0 }
    val out = run("p71_split_contamination").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val bySplit = splits.groupBy(_._2)
    assert(out.keySet === bySplit.keySet)
    assert(out.keySet === Set("train", "val", "test"),
      "all three splits must appear in this corpus")
    bySplit.foreach { case (sp, docs) =>
      val n = docs.length.toLong
      val c = docs.count { case (d, _) => contam(d) }.toLong
      val (gotN, gotC, gotF) = out(sp)
      assert(gotN === n, s"$sp n_docs")
      assert(gotC === c, s"$sp n_contam")
      assert(gotF === ((c * 1000000L + n / 2) / n) / 1e6, s"$sp frac")
      assert(c > 0L, s"$sp must show contamination on this corpus")
    }
  }

  test("p72 dataset card == recompute from the p09/p31/p01 surfaces; " +
    "split sizes partition the corpus") {
    val r = run("p72_dataset_card").collect()
    assert(r.length === 1)
    val card = r.head
    val splits = run("p31_split_assign").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(3)))
    val nDocs = splits.length.toLong
    assert(card.getLong(0) === nDocs, "n_docs")
    // token total from the per-doc stats query (same tokenizer)
    val nTokens = run("p09_text_stats").collect()
      .map(_.getLong(1)).sum
    assert(card.getLong(1) === nTokens, "n_tokens")
    assert(card.getLong(2) === splits.map(_._2).distinct.length.toLong,
      "n_sources")
    val bySplit = splits.groupBy(_._3).map { case (k, v) =>
      k -> v.length.toLong
    }
    assert(card.getLong(4) === bySplit.getOrElse("train", 0L), "n_train")
    assert(card.getLong(5) === bySplit.getOrElse("val", 0L), "n_val")
    assert(card.getLong(6) === bySplit.getOrElse("test", 0L), "n_test")
    assert(card.getLong(4) + card.getLong(5) + card.getLong(6) === nDocs,
      "splits must partition the corpus")
    assert(card.getLong(7) === splits.count(_._1 % 100 == 0).toLong,
      "n_bench")
    // exact-dup mass from the p01 groups (keeper + copies)
    val dupMass = run("p01_dedup_exact").collect()
      .map(_.getLong(1)).sum
    assert(card.getLong(8) === dupMass, "n_dup_docs")
    assert(card.getDouble(9) ===
      ((dupMass * 1000000L + nDocs / 2) / nDocs) / 1e6, "dup_frac")
  }

  test("p73 doc-length quantiles: buckets bracket the exact order " +
    "statistic per source, in token units") {
    val lens = run("p09_text_stats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)) // (doc_id, n_tokens)
    val srcOf = run("p31_split_assign").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySource = lens.groupBy { case (d, _) => srcOf(d) }
      .map { case (s, rs) => s -> rs.map(_._2).sorted }
    val out = run("p73_doclen_quantiles").collect()
    assert(out.length === bySource.size * 2)
    out.foreach { r =>
      val (src, q, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (lo, hi) = (r.getLong(4), r.getLong(5))
      val xs = bySource(src)
      assert(n === xs.length.toLong, s"$src n")
      val exact = xs(((n * q + 99) / 100 - 1).toInt)
      assert(lo <= exact && exact <= hi,
        s"$src q$q: exact $exact outside [$lo, $hi]")
    }
  }
  test("p74 excision == sequential recompute: covered tokens cut " +
    "exactly, untouched docs hash to their normalized text") {
    val got = run("p74_decontam_excise").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def normText(t: String): String =
      t.replaceAll("^ +| +$", "").replaceAll("\\s+", " ").toLowerCase
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val benchGrams = raw.collect { case (id, t) if id % 100 == 0 => t }
      .flatMap { t =>
        val tk = seqToks(normText(t))
        if (tk.length < 3) Seq.empty
        else (0 to tk.length - 3).map(i => tk.slice(i, i + 3).mkString(" "))
      }.toSet
    val train = raw.filter { case (id, _) => id % 100 != 0 }
    assert(got.keySet === train.keySet)
    var contaminatedSeen = 0
    train.foreach { case (id, t) =>
      val nt = normText(t)
      val tk = seqToks(nt)
      val hitStarts =
        if (tk.length < 3) Seq.empty[Int]
        else (0 to tk.length - 3).filter(i =>
          benchGrams.contains(tk.slice(i, i + 3).mkString(" ")))
      val covered = hitStarts.flatMap(i => i until i + 3).toSet
      val spans = covered.toSeq.sorted.count(p => !covered.contains(p - 1))
      val cleaned =
        if (covered.isEmpty) nt
        else tk.zipWithIndex.collect {
          case (tok, i) if !covered.contains(i) => tok }.mkString(" ")
      val (nHits, nRemoved, nSpans, md) = got(id)
      assert(nHits === hitStarts.size.toLong, s"doc $id n_hits")
      assert(nRemoved === covered.size.toLong, s"doc $id n_removed")
      assert(nSpans === spans.toLong, s"doc $id n_spans")
      assert(md === md5hex(cleaned), s"doc $id cleaned_md5")
      if (hitStarts.nonEmpty) contaminatedSeen += 1
    }
    assert(contaminatedSeen > 0,
      "corpus must contain at least one contaminated training doc " +
        "for this pin to bite")
  }

  // Spark's round(x) / round(x, s): BigDecimal.valueOf + HALF_UP —
  // the exact rule the p76/p78 mirrors must share
  private def sparkRound(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue
  private def micro(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  private def loadEmbs(): Array[(Long, Long, Array[Double])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy(_._1)

  test("p76 k-center == sequential Gonzalez recompute; selection " +
    "distance non-increasing over rounds") {
    val vecs = loadEmbs().map { case (id, _, emb) =>
      id -> emb.map(micro) }
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val byId = vecs.toMap
    // round 1: min vec_id; rounds 2..8: farthest (max d2min, tie min id)
    val seedId = vecs.head._1
    val chosen = scala.collection.mutable.ArrayBuffer(
      (1L, seedId, 0L))
    val d2min = scala.collection.mutable.Map(
      vecs.map { case (id, ei) => id -> d2(ei, byId(seedId)) }: _*)
    for (r <- 2 to 8) {
      val cands = vecs.filter { case (id, _) => d2min(id) > 0 }
      val (nid, _) = cands.maxBy { case (id, _) => (d2min(id), -id) }
      chosen += ((r.toLong, nid, d2min(nid)))
      vecs.foreach { case (id, ei) =>
        d2min(id) = math.min(d2min(id), d2(ei, byId(nid))) }
    }
    // assignment: nearest center, tie -> min center id
    val centers = chosen.map { case (_, id, _) => id -> byId(id) }
    val asg = vecs.map { case (id, ei) =>
      centers.map { case (cid, ci) => (d2(ei, ci), cid) }.min }
    val cells = asg.groupBy(_._2)
      .map { case (cid, xs) => cid -> ((xs.length.toLong, xs.map(_._1).max)) }
    val want = chosen.map { case (r, cid, seld2) =>
      val (n, rad) = cells(cid)
      (r, cid, seld2, n, rad,
        sparkRound(math.sqrt(rad.toDouble) / 1e6, 6))
    }.sortBy(_._1)
    val got = run("p76_coreset_kcenter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1).toSeq
    assert(got === want.toSeq)
    // Gonzalez invariant: the farthest-point distance shrinks (weakly)
    val selD2 = got.drop(1).map(_._3)
    assert(selD2.zip(selD2.drop(1)).forall { case (a, b) => b <= a },
      s"selection distances must be non-increasing: $selD2")
    assert(selD2.forall(_ > 0))
  }

  test("p77 source-overlap == sequential bottom-k recompute; " +
    "estimator within sketch tolerance of true 5-gram Jaccard") {
    val K = 128
    def h32(sh: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(sh.getBytes("UTF-8")).take(4)
          .map("%02x".format(_)).mkString, 16)
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    def grams(t: String): Seq[String] = {
      val tk = seqToks(t)
      if (tk.length < 5) Seq.empty
      else (0 to tk.length - 5).map(i => tk.slice(i, i + 5).mkString(" "))
    }
    val bySrc = rows.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap(x => grams(x._2)).toSet }
    val sketches = bySrc.collect {
      case (s, g) if g.nonEmpty =>
        s -> g.map(h32).toSeq.sorted.take(K).toSet
    }
    val want = (for {
      (sa, ska) <- sketches; (sb, skb) <- sketches if sa < sb
    } yield {
      val union = (ska ++ skb).toSeq.sorted.take(K)
      val kUsed = union.size.toLong
      val nBoth = union.count(h => ska(h) && skb(h)).toLong
      (sa, sb, kUsed, nBoth,
        sparkRound(nBoth.toDouble / kUsed.toDouble, 6))
    }).toSeq.sorted
    val got = run("p77_source_overlap_kmv").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq.sorted
    assert(got === want)
    // sketch estimate vs TRUE Jaccard: within the ~1/sqrt(K) band
    got.foreach { case (sa, sb, _, _, est) =>
      val (ga, gb) = (bySrc(sa), bySrc(sb))
      val truth = ga.intersect(gb).size.toDouble / ga.union(gb).size
      assert(math.abs(est - truth) <= 3.0 / math.sqrt(K.toDouble) + 1e-9,
        s"($sa,$sb) est=$est true=$truth")
    }
  }

  test("p78 hard negatives == sequential recompute; negatives differ " +
    "in label; sentinel only for singleton labels") {
    val vecs = loadEmbs()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      var na = 0.0; i = 0
      while (i < a.length) { na += a(i) * a(i); i += 1 }
      var nb = 0.0; i = 0
      while (i < b.length) { nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.filter(_._1 % 50 == 0).flatMap {
      case (qid, qlab, qemb) =>
        val sims = vecs.filter(_._1 != qid).map { case (nid, nlab, ne) =>
          (nid, nlab, sparkRound(cos(qemb, ne), 6)) }
        val posSim = sims.filter(_._2 == qlab).map(_._3)
          .reduceOption(_ max _).getOrElse(-2.0)
        sims.filter(_._2 != qlab)
          .sortBy { case (nid, _, c) => (-c, nid) }.take(3).zipWithIndex
          .map { case ((nid, _, c), i) =>
            (qid, nid, (i + 1).toLong, c, posSim,
              sparkRound(posSim - c, 6)) }
    }.toSeq.sorted
    val got = run("p78_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq.sorted
    assert(got === want)
    val labels = vecs.map(v => v._1 -> v._2).toMap
    val labelCounts = vecs.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    got.foreach { case (qid, nid, rk, _, pos, _) =>
      assert(labels(nid) !== labels(qid), s"negative $nid shares label")
      assert(rk >= 1 && rk <= 3)
      assert((pos == -2.0) === (labelCounts(labels(qid)) == 1),
        s"query $qid sentinel mismatch")
    }
  }

  test("p79 BPE merges == sequential Sennrich recompute; merge " +
    "frequency non-increasing across rounds") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().foreach { r =>
        seqToks(r.getString(0)).foreach { w =>
          counts(w) = counts.getOrElse(w, 0L) + 1L } }
    var state: Map[String, (Long, Vector[String])] =
      counts.toSeq.sortBy { case (w, c) => (-c, w) }
        .take(Pipeline.BpeVocabCap)
        .map { case (w, c) => w -> ((c, w.map(_.toString).toVector)) }
        .toMap
    val want = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long, Long)]
    for (round <- 1 to Pipeline.BpeRounds) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (_, (c, syms)) =>
        (0 until syms.length - 1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c } }
      if (pc.nonEmpty) {
        val ((l, rr), n) = pc.toSeq
          .minBy { case ((a, b), m) => (-m, a, b) }
        var mergedN = 0L
        var symsAfter = 0L
        state = state.map { case (w, (c, syms)) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
              out += l + rr; i += 2
            } else { out += syms(i); i += 1 }
          }
          mergedN += c * (syms.length - out.length)
          symsAfter += c * out.length
          w -> ((c, out.toVector))
        }
        want += ((round.toLong, l, rr, l + rr, n, mergedN, symsAfter))
      }
    }
    val got = run("p79_bpe_merges").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toSeq
    assert(got === want.toSeq)
    assert(got.nonEmpty, "corpus must learn at least one merge")
    // a merged pair's count can never beat an earlier round's winner
    val ns = got.map(_._5)
    assert(ns.zip(ns.drop(1)).forall { case (a, b) => b <= a },
      s"top-pair counts must be non-increasing: $ns")
  }

  test("p80 BPE apply == sequential application of the p79 merges " +
    "over every distinct word; symbols-per-token inside (1, max-len)") {
    val merges = run("p79_bpe_merges").collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    def bpe(word: String): Vector[String] = {
      var syms = word.map(_.toString).toVector
      merges.foreach { case (l, rr) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
            out += l + rr; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms
    }
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        seqToks(r.getString(2)).toSeq))
    val want = rows.groupBy(_._1).map { case (src, xs) =>
      val toks = xs.flatMap(_._3)
      val nSym = toks.map(w => bpe(w).length.toLong).sum
      (src, xs.map(_._2).distinct.length.toLong, toks.length.toLong, nSym,
        sparkRound(nSym.toDouble / toks.length, 6))
    }.toSeq.sorted
    val got = run("p80_bpe_apply").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq.sorted
    assert(got === want)
    // 6 merges on this corpus must actually compress every source
    got.foreach { case (src, _, nt, nsym, c) =>
      assert(nsym < nt * 8 && c < 8.0, s"$src compression $c")
      assert(nsym > nt, s"$src: symbols can't undercut one per token")
    }
  }

  test("p81 semantic decontamination == sequential IVF recompute; " +
    "every hit is a true tau-pair and cell recall is sane") {
    val vecs = loadEmbs()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val micros = vecs.map { case (id, _, e) => id -> e.map(micro) }.toMap
    val seedIds = ivfSeedIds(micros.keys)
    val cents = vecs.collect { case (id, _, _) if seedIds(id) =>
      id -> micros(id) }
    assert(cents.nonEmpty, "corpus must provide centroids")
    // nearest cells by exact integer d2, deterministic (d2, cid) order
    def cells(id: Long, n: Int): Seq[Long] = {
      val ei = micros(id)
      cents.map { case (cid, ci) =>
        var d2 = 0L; var i = 0
        while (i < ei.length) {
          val d = ei(i) - ci(i); d2 += d * d; i += 1
        }
        (d2, cid)
      }.sorted.take(n).map(_._2).toSeq
    }
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val tests = vecs.collect { case (id, _, _) if id % 50 == 0 =>
      id -> cells(id, 2) }
    val want = (for {
      (cid, _, _) <- vecs if cid % 50 != 0
      corpusCell = cells(cid, 1).head
      (tid, tcells) <- tests if tcells.contains(corpusCell)
      c6 = sparkRound(cos(byId(cid), byId(tid)), 6) if c6 >= 0.2
    } yield (corpusCell, cid, tid, c6)).toSeq.sorted
    val got = run("p81_contam_semantic").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got === want)
    // soundness: every reported hit really clears the threshold against
    // the raw embeddings (no approximation on the similarity itself)
    got.foreach { case (_, cid, tid, c6) =>
      assert(c6 >= 0.2 && cid % 50 != 0 && tid % 50 == 0)
      assert(math.abs(c6 - cos(byId(cid), byId(tid))) < 1e-6)
    }
    // the cell restriction is the only approximation: hits must be a
    // subset of the brute-force tau-pairs, and if any tau-pair shares
    // a cell it must be reported
    val brute = (for {
      (cid, _, _) <- vecs if cid % 50 != 0
      (tid, _) <- tests
      c6 = sparkRound(cos(byId(cid), byId(tid)), 6) if c6 >= 0.2
    } yield (cid, tid)).toSet
    assert(got.map(h => (h._2, h._3)).toSet.subsetOf(brute))
  }

  test("p82 HLL == sequential register recompute; estimate within the " +
    "canonical 1.04/sqrt(m) band of the exact count on every source") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), seqToks(r.getString(1))))
    val want = rows.groupBy(_._1).map { case (src, xs) =>
      val hs = xs.flatMap(_._2).map(h60)
      val regs = new Array[Int](64)
      hs.foreach { h =>
        val bucket = (h >> 54).toInt
        val w = h & ((1L << 54) - 1)
        val rho = if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(bucket)) regs(bucket) = rho
      }
      val s = regs.map(m => 1L << (55 - m)).sum
      val zeros = regs.count(_ == 0)
      val raw = 0.709 * 4096 * 3.6028797018963968e16 / s.toDouble
      val est =
        if (zeros > 0 && raw <= 160.0)
          graft.functions.HllSketch.LcTable(zeros - 1)
        else sparkRound(raw, 6)
      (src, hs.distinct.length.toLong, s, zeros.toLong, est)
    }.toSeq.sorted
    val got = run("p82_distinct_hll").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq.sorted
    assert(got === want)
    // estimator quality: the classic HLL error bound is 1.04/sqrt(64)
    // = 13%; allow 3 sigma. Also: zero registers only when the source
    // carries fewer distinct tokens than could touch all 64 buckets.
    got.foreach { case (src, exact, _, _, est) =>
      assert(exact > 0, s"$src has no tokens")
      assert(math.abs(est - exact) <= 3 * 0.13 * exact + 3.0,
        s"$src exact=$exact est=$est outside 3-sigma HLL band")
    }
  }

  test("p83 source TV-divergence matrix == sequential recompute; " +
    "metric bounds and empty-overlap convention hold") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), seqToks(r.getString(1))))
    val counts: Map[String, Map[String, Long]] =
      rows.groupBy(_._1).map { case (src, xs) =>
        val m = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        xs.foreach(_._2.foreach(t => m(t) += 1L))
        src -> m.toMap
      }
    val totals = counts.map { case (s, m) => s -> m.values.sum }
    val srcs = counts.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      a = srcs(i); b = srcs(j)
      na = totals(a); nb = totals(b)
      shared = counts(a).keySet.intersect(counts(b).keySet)
      sMin = shared.toSeq
        .map(t => math.min(counts(a)(t) * nb, counts(b)(t) * na)).sum
    } yield (a, b, na, nb, shared.size.toLong,
      sparkRound((na * nb - sMin).toDouble / (na * nb).toDouble, 6)))
      .toSeq.sorted
    val got = run("p83_source_divergence").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq.sorted
    assert(got === want)
    // metric sanity: strict upper-triangle pair grid, TV in [0, 1],
    // zero shared vocabulary forces the TV = 1 convention, and a
    // corpus of distinct sources shows SOME distributional distance
    assert(got.size === srcs.size * (srcs.size - 1) / 2)
    got.foreach { case (a, b, _, _, sh, tv) =>
      assert(a < b)
      assert(tv >= 0.0 && tv <= 1.0, s"($a,$b) tv=$tv out of range")
      if (sh == 0) assert(tv === 1.0)
    }
    assert(got.exists(_._6 > 0.0),
      "all-zero TV would mean every source has the identical distribution")
  }

  test("p84 split parity == sequential recompute over p31's split rule; " +
    "pair grid complete and TV bounded") {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map { r =>
        val split = h32(s"${r.getLong(0)}:split") % 100 match {
          case b if b < 90 => "train"
          case b if b < 95 => "val"
          case _ => "test"
        }
        (split, r.getString(1), r.getString(2), r.getLong(3) / 100)
      }
    val totals = rows.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val feats: Map[String, String => Map[String, Long]] = Map(
      "lang" -> (sp => rows.filter(_._1 == sp).groupBy(_._2)
        .map { case (v, xs) => v -> xs.length.toLong }),
      "source" -> (sp => rows.filter(_._1 == sp).groupBy(_._3)
        .map { case (v, xs) => v -> xs.length.toLong }),
      "len_bucket" -> (sp => rows.filter(_._1 == sp).groupBy(_._4.toString)
        .map { case (v, xs) => v -> xs.length.toLong }))
    val splits = totals.keys.toSeq.sorted
    val want = (for {
      i <- splits.indices; j <- (i + 1) until splits.length
      a = splits(i); b = splits(j)
      f <- Seq("lang", "source", "len_bucket")
      ca = feats(f)(a); cb = feats(f)(b)
      na = totals(a); nb = totals(b)
      sharedVals = ca.keySet.intersect(cb.keySet)
      sMin = sharedVals.toSeq.map(v => math.min(ca(v) * nb, cb(v) * na)).sum
    } yield (a, b, f, na, nb, sharedVals.size.toLong,
      sparkRound((na * nb - sMin).toDouble / (na * nb).toDouble, 6)))
      .toSeq.sorted
    val got = run("p84_split_parity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toSeq.sorted
    assert(got === want)
    assert(got.size === 9, "3 split pairs x 3 features")
    got.foreach { case (a, b, _, _, _, _, tv) =>
      assert(a < b)
      assert(tv >= 0.0 && tv <= 1.0)
    }
  }

  test("p85 vocab coverage curve == sequential recompute; monotone, " +
    "clamped past the vocabulary, ends at full mass") {
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().flatMap(r => seqToks(r.getString(0)))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val cums = ranked.scanLeft(0L)(_ + _._2).drop(1)
    val total = cums.last
    val vocab = ranked.size.toLong
    val want = Seq(1L, 2L, 4L, 8L, 16L, 32L).map { r =>
      val cum = cums(math.min(r, vocab).toInt - 1)
      (r, vocab, cum, total, sparkRound(cum.toDouble / total.toDouble, 6))
    }.sorted
    val got = run("p85_vocab_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq.sorted
    assert(got === want)
    // curve shape: coverage non-decreasing in r, positive from rank 1,
    // and any probe at or past the vocab size captures ALL the mass
    val byR = got.sortBy(_._1)
    assert(byR.map(_._5) === byR.map(_._5).sorted)
    assert(byR.head._5 > 0.0)
    byR.filter(t => t._1 >= t._2).foreach { t =>
      assert(t._3 === t._4 && t._5 === 1.0,
        s"rank ${t._1} >= vocab ${t._2} must cover everything")
    }
  }

  test("p86 HLL union-growth curve == sequential merged-register " +
    "recompute; exact cumulative monotone and conserved") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), seqToks(r.getString(1)).map(h60)))
    val bySrc = rows.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap(_._2)
    }
    val srcs = bySrc.keys.toSeq.sorted
    val regs = new Array[Int](64)
    val seen = scala.collection.mutable.Set[Long]()
    var prevCum = 0L
    val want = srcs.map { src =>
      bySrc(src).foreach { h =>
        val bucket = (h >> 54).toInt
        val w = h & ((1L << 54) - 1)
        val rho = if (w == 0) 55
          else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(bucket)) regs(bucket) = rho
      }
      val newToks = bySrc(src).filterNot(seen).distinct.length.toLong
      seen ++= bySrc(src)
      val sReg = regs.map(m => 1L << (55 - m)).sum
      val zeros = regs.count(_ == 0).toLong
      val raw = 0.709 * 4096 * 3.6028797018963968e16 / sReg.toDouble
      val est =
        if (zeros > 0 && raw <= 160.0)
          graft.functions.HllSketch.LcTable(zeros.toInt - 1)
        else sparkRound(raw, 6)
      (src, newToks, seen.size.toLong, est)
    }
    val got = run("p86_vocab_growth").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(got === want)
    // conservation: cumulative counts are the running sum of new
    // tokens and end at the corpus-wide distinct count
    got.foreach { case (_, nt, cum, _) =>
      assert(cum === prevCum + nt); prevCum = cum
    }
    assert(got.last._3 ===
      rows.flatMap(_._2).distinct.length.toLong)
  }

  test("p87 longest common run == true DP longest-common-substring on " +
    "every LSH pair (exact at >= 8 tokens, 0 below resolution)") {
    val toksById = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> seqToks(r.getString(1))).toMap
    val pairs = run("p04_dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must surface LSH pairs")
    def lcsSub(a: Array[String], b: Array[String]): Int = {
      // classic O(|a||b|) suffix table for longest common SUBSTRING
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best) best = dp(i)(j)
        }
      best
    }
    def grams(a: Array[String]): Seq[String] =
      if (a.length < 8) Seq.empty
      else (0 to a.length - 8).map(i => a.slice(i, i + 8).mkString(" "))
    val want = pairs.map { case (da, db) =>
      val (ta, tb) = (toksById(da), toksById(db))
      val l = lcsSub(ta, tb)
      val ga = grams(ta)
      val gbSet = grams(tb).groupBy(identity).view.mapValues(_.size).toMap
      val matched = ga.map(g => gbSet.getOrElse(g, 0).toLong).sum
      (da, db, if (l >= 8) l.toLong else 0L, matched)
    }.toSeq.sorted
    val got = run("p87_longest_common_run").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got === want)
    // evidence sanity: a certified run implies at least one matched
    // gram, and lcs below the 8-gram resolution reports 0, never 1..7
    got.foreach { case (_, _, lcs, mg) =>
      assert(lcs == 0L || lcs >= 8L)
      assert((lcs >= 8L) == (mg > 0L))
    }
    assert(got.exists(_._3 >= 8L),
      "near-dup corpus should certify at least one verbatim span")
  }

  test("p88 exact-k sample == sequential bottom-k recompute; exactly " +
    "min(k, stratum) per source; growth-stable membership") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val k = 20
    val want = rows.groupBy(_._2).toSeq.flatMap { case (src, xs) =>
      xs.sortBy(x => (h60(s"${x._1}:sample"), x._1)).take(k)
        .zipWithIndex.map { case ((id, _, lang), i) =>
          (src, (i + 1).toLong, id, lang)
        }
    }.sorted
    val got = run("p88_sample_exact_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq.sorted
    assert(got === want)
    got.groupBy(_._1).foreach { case (src, xs) =>
      val stratum = rows.count(_._2 == src)
      assert(xs.size === math.min(k, stratum),
        s"$src must yield exactly min(k, stratum) rows")
    }
    // growth stability (the bottom-k property p21's rate filter lacks
    // in the exact-k setting): dropping any doc NOT in the sample
    // leaves the sample identical
    val sampled = got.map(_._3).toSet
    val victim = rows.map(_._1).filterNot(sampled).head
    val shrunk = rows.filterNot(_._1 == victim).groupBy(_._2).toSeq
      .flatMap { case (src, xs) =>
        xs.sortBy(x => (h60(s"${x._1}:sample"), x._1)).take(k)
          .zipWithIndex.map { case ((id, _, lang), i) =>
            (src, (i + 1).toLong, id, lang)
          }
      }.sorted
    assert(shrunk === want)
  }

  test("p89 dup flow == recompute from the p04 pair list; pair mass " +
    "conserved and matrix keys oriented") {
    val srcById = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = run("p04_dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    val want = pairs.map { case (a, b, est) =>
      val (sa, sb) = (srcById(a), srcById(b))
      ((if (sa <= sb) sa else sb, if (sa <= sb) sb else sa, sa == sb),
        math.round(est * 64))
    }.groupBy(_._1).toSeq.map { case ((sx, sy, in), xs) =>
      val n = xs.length.toLong
      val sk = xs.map(_._2).sum
      (sx, sy, in, n, sparkRound(sk.toDouble / (64.0 * n), 6))
    }.sorted
    val got = run("p89_dup_flow").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getDouble(4))).toSeq.sorted
    assert(got === want)
    // conservation: the matrix accounts for every pair exactly once
    assert(got.map(_._4).sum === pairs.length.toLong)
    got.foreach { case (sx, sy, internal, _, avg) =>
      assert(sx <= sy)
      assert(internal == (sx == sy))
      // every surfaced pair cleared the generator's 0.5 gate
      assert(avg >= 0.5 && avg <= 1.0)
    }
  }

  test("p90 curation decision == composition of its three oracled " +
    "components; keep iff no flag; benchmark docs never kept") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val surv = run("p02_dedup_keep_first").collect()
      .map(_.getLong(0)).toSet
    val qualKeep = run("p30_quality_filter").collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val contam = run("p24_contamination").collect()
      .map(_.getLong(0)).toSet
    val want = corpus.map { case (id, src) =>
      val fd = !surv(id)
      val fq = !qualKeep(id)
      val fc = contam(id)
      val fb = id % 100 == 0
      (id, src, fd, fq, fc, fb, !fd && !fq && !fc && !fb)
    }.toSeq.sorted
    val got = run("p90_curation_decision").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6))).toSeq.sorted
    assert(got === want)
    assert(got.size === corpus.length, "every doc gets a decision")
    got.foreach { case (id, _, fd, fq, fc, fb, keep) =>
      assert(keep == !(fd || fq || fc || fb),
        s"doc $id: keep must mean zero flags")
      if (fb) assert(!keep, s"benchmark doc $id must never train")
    }
    // the decision is non-trivial on this corpus: some kept, some
    // dropped, and more than one flag type fires
    assert(got.exists(_._7) && got.exists(!_._7))
    assert(Seq(got.exists(_._3), got.exists(_._4), got.exists(_._5))
      .count(identity) >= 2, "at least two flag families should fire")
  }

  test("p91 waterfall == first-flag attribution over p90; stages " +
    "partition the corpus in docs AND mass") {
    val charsById = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decisions = run("p90_curation_decision").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    val want = decisions.map { case (id, src, fd, fq, fc, fb) =>
      val stage =
        if (fb) "1_benchmark" else if (fd) "2_duplicate"
        else if (fq) "3_quality" else if (fc) "4_contaminated"
        else "5_kept"
      (src, stage, id)
    }.groupBy(t => (t._1, t._2)).toSeq.map { case ((src, st), xs) =>
      (src, st, xs.length.toLong, xs.map(x => charsById(x._3)).sum)
    }.sorted
    val got = run("p91_curation_waterfall").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    assert(got === want)
    // the funnel partitions the corpus exactly, in both units
    assert(got.map(_._3).sum === decisions.length.toLong)
    assert(got.map(_._4).sum === decisions.map(d => charsById(d._1)).sum)
    assert(got.exists(_._2 == "5_kept"))
  }

  test("p92 embedding split parity == sequential centroid recompute; " +
    "distances symmetric-free, nonneg, and small vs the label spread") {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val vecs = loadEmbs()
    val tagged = vecs.map { case (id, label, e) =>
      val b = h32(s"$id:esplit") % 100
      val split = if (b < 90) "train" else if (b < 95) "val" else "test"
      (split, label, e.map(micro))
    }
    val groups = tagged.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      val dims = xs.head._3.length
      val sums = Array.tabulate(dims)(d => xs.map(_._3(d)).sum)
      k -> (sums, xs.length.toLong)
    }
    val splits = tagged.map(_._1).distinct.sorted
    val labels = tagged.map(_._2).distinct.sorted
    val want = (for {
      i <- splits.indices; j <- (i + 1) until splits.length
      l <- labels
      ka = (splits(i), l); kb = (splits(j), l)
      if groups.contains(ka) && groups.contains(kb)
    } yield {
      val (sa, na) = groups(ka); val (sb, nb) = groups(kb)
      val ss = sa.indices.map { d =>
        val diff = BigInt(sa(d) * nb - sb(d) * na)
        diff * diff
      }.sum
      (splits(i), splits(j), l, na, nb,
        sparkRound(math.sqrt(ss.toDouble) / (na.toDouble * nb * 1e6), 6))
    }).toSeq.sorted
    val got = run("p92_split_emb_parity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
    got.foreach { case (a, b, _, na, nb, d) =>
      assert(a < b && na > 0 && nb > 0 && d >= 0.0)
    }
  }

  test("p93 byte-frame near-dup == sequential frame-set recompute; " +
    "capped candidates are a subset of true frame-Jaccard pairs") {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
    val hexd = "0123456789ABCDEF"
    val frames: Map[Long, Set[String]] = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val hx = r.getString(1).getBytes("UTF-8")
          .flatMap(b => Seq(hexd((b & 0xFF) >> 4), hexd(b & 0xF)))
          .mkString
        r.getLong(0) -> hx.grouped(128)
          .map(s => md5hex(s.getBytes("UTF-8"))).toSet
      }.filter(_._2.nonEmpty).toMap
    val dfc = frames.toSeq.flatMap { case (id, fs) => fs.map(_ -> id) }
      .groupBy(_._1).filter(_._2.size <= 40).keySet
    val ids = frames.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      shared = frames(a).intersect(frames(b)).filter(dfc)
      if shared.nonEmpty // candidate iff a df-capped frame is shared
      common = shared.size.toLong
      na = frames(a).size.toLong; nb = frames(b).size.toLong
      jac = sparkRound(common.toDouble / (na + nb - common), 6)
      if jac >= 0.25
    } yield (a, b, common, na, nb, jac)).toSeq.sorted
    val got = run("p93_mm_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty, "near-dup corpus should share byte frames")
    // soundness: every reported pair's jaccard uses FULL set sizes
    got.foreach { case (a, b, c, na, nb, jac) =>
      assert(c <= math.min(na, nb) && jac >= 0.25 && jac <= 1.0)
      assert(c === frames(a).intersect(frames(b)).count(dfc).toLong,
        s"($a,$b): common must be the df-capped shared-frame count")
    }
  }

  test("p94 epoch schedule == sequential WFQ recompute; partitions the " +
    "kept set; every prefix is weight-fair within 2 docs") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val kept = run("p90_curation_decision").collect()
      .filter(_.getBoolean(6)).map(r => (r.getLong(0), r.getString(1)))
    val w = kept.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val ranked = kept.groupBy(_._2).toSeq.flatMap { case (src, xs) =>
      xs.sortBy(x => (h60(s"${x._1}:epoch"), x._1)).zipWithIndex
        .map { case ((id, _), i) => (id, src, (i + 1).toLong) }
    }
    val want = ranked
      .sortBy { case (id, src, k) => (k.toDouble / w(src), src, id) }
      .zipWithIndex
      .map { case ((id, src, k), i) => ((i + 1).toLong, id, src, k) }
    val got = run("p94_epoch_schedule").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got === want)
    // the schedule is a permutation of exactly the kept set
    assert(got.map(_._2).toSet === kept.map(_._1).toSet)
    assert(got.map(_._1) === (1L to kept.length.toLong))
    // prefix fairness: at every position L, each source has been
    // served within 2 of its ideal share L*w/W
    val total = kept.length.toDouble
    val counts = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    got.foreach { case (pos, _, src, _) =>
      counts(src) += 1
      w.keys.foreach { s0 =>
        val ideal = pos * w(s0) / total
        assert(math.abs(counts(s0) - ideal) <= 2.0,
          s"prefix $pos: source $s0 served ${counts(s0)}, ideal $ideal")
      }
    }
  }

  test("p95 dup-loss mask == sequential interval-union recompute; " +
    "masked iff p44 sees dup spans") {
    val got = run("p95_dup_loss_mask").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id",
        "lower(regexp_replace(trim(text), '\\\\s+', ' ')) AS nt")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .toMap
    val grams: Map[Long, Seq[(Long, String)]] = docs.map { case (id, tk) =>
      id -> (if (tk.length >= 8)
        (0 to tk.length - 8).map(i =>
          ((i + 1).toLong, tk.slice(i, i + 8).mkString(" ")))
      else Seq.empty)
    }
    val df = grams.toSeq
      .flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    for ((id, tk) <- docs) {
      val dups = grams(id).collect {
        case (s0, g) if df(g) >= 2 => (s0, s0 + 7L) }.sorted
      var isls = List.empty[(Long, Long)]
      for ((s0, e0) <- dups) isls = isls match {
        case (a, b) :: rest if s0 <= b + 1 =>
          (a, math.max(b, e0)) :: rest
        case other => (s0, e0) :: other
      }
      val masked = isls.map { case (a, b) => b - a + 1 }.sum
      assert(got(id) === ((tk.length.toLong, masked, isls.size.toLong,
        masked.toDouble / tk.length)), s"doc $id")
    }
    // consistency: a doc is masked iff p44's span signal fires on it
    val p44 = run("p44_dupspan").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((id, (_, masked, _, _)) <- got)
      assert((masked > 0) === (p44.getOrElse(id, 0L) > 0),
        s"p44/p95 disagree on doc $id")
  }

  test("md5_simhash60 native expression == the SQL token-fold the " +
    "oracle runs, over the whole corpus incl. empty/short docs") {
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "split(lower(regexp_replace(trim(text), '\\\\s+', ' ')), ' ') " +
          "AS toks")
    val both = d.select(col("doc_id"),
      graft.functions.TextHashFunctions.md5_simhash60(col("toks"))
        .as("native"),
      expr(Pipeline.simhashSql("toks")).as("sqlfold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"doc ${r.getLong(0)}: native ${r.getLong(1)} != sql ${r.getLong(2)}"))
  }

  test("md5_h60_ngrams native expression == the SQL hex form, over " +
    "the corpus at n=1 and n=3 (incl. shorter-than-n docs)") {
    import graft.functions.{HashScheme => H}
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "split(lower(regexp_replace(trim(text), '\\\\s+', ' ')), ' ') " +
          "AS toks")
    for (n <- Seq(1, 3)) {
      val both = d.select(col("doc_id"),
        graft.functions.TextHashFunctions.md5_h60_ngrams(col("toks"), n)
          .as("native"),
        expr(s"""CASE WHEN size(toks) >= $n THEN
            transform(sequence(1, size(toks) - $n + 1), i ->
              ${H.h60Spark(s"concat_ws(' ', slice(toks, i, $n))")})
          ELSE cast(array() as array<bigint>) END""").as("sqlform"))
        .collect()
      both.foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"n=$n doc ${r.getLong(0)}"))
    }
  }

  test("ivfSeedCents: fixed K, bottom-k by salted hash, graceful on " +
    "tiny corpora (n < K returns all n)") {
    import spark.implicits._
    val big = (0L until 200L).map(i => (i, Seq(i, i + 1))).toDF("vec_id", "v")
    val cents = Pipeline.ivfSeedCents(big, "v").collect()
      .map(r => r.getLong(0))
    assert(cents.length === Pipeline.IvfK, "K must not scale with n")
    assert(cents.toSet === ivfSeedIds(0L until 200L),
      "seed choice must be the bottom-K by salted h60")
    val tiny = (0L until 5L).map(i => (i, Seq(i))).toDF("vec_id", "v")
    assert(Pipeline.ivfSeedCents(tiny, "v").count() === 5L,
      "n < K corpora keep all vectors as centroids")
  }

  test("p96 pack efficiency == groupBy recompute over the p20 manifest") {
    val b = Pipeline.PackBudget
    val p20 = run("p20_pack_sequences").collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    val want = p20.groupBy(_._1).map { case (pack, rows) =>
      val overflow = rows.map { case (_, n, off) =>
        math.max(0L, off + n - b) }.sum
      val started = rows.map(_._2).sum
      pack -> ((rows.length.toLong,
        rows.count { case (_, n, off) => off + n > b }.toLong,
        started, overflow, overflow.toDouble / started))
    }
    val got = run("p96_pack_efficiency").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === want)
    // every pack except possibly the last is exactly full under the
    // span policy, so overflow == next packs' imported tokens; sanity:
    // spanning implies positive overflow
    for ((pack, (_, spanning, _, overflow, _)) <- got)
      assert((spanning > 0) === (overflow > 0), s"pack $pack")
  }
}

