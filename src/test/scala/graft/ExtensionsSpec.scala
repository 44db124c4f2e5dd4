package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashFunctions
import graft.kernel.{Anomalyzer, AnomalyzerConf}
import graft.streaming.StreamingDetector

/** SQL-surface registration: every graft function resolves in plain SQL
  * and matches its Column-API twin / the sequential kernel.
  */
class ExtensionsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val registered: Unit = GraftExtensions.register(spark)

  test("text hash functions resolve in SQL and match the Column API") {
    registered
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT graft_simhash64(split(text, ' ')) AS sh,
               graft_rolling_fingerprint(split(text, ' ')) AS fp,
               graft_ngram_hashes(split(text, ' '), 3) AS nh,
               graft_word_ngrams(split(text, ' '), 3) AS wg,
               graft_minhash(split(text, ' '), 3, 16) AS mh,
               graft_md5_h60_ngrams(split(text, ' '), 3) AS hg,
               graft_md5_simhash60(split(text, ' ')) AS s60
        FROM ext_docs""").collect().head
    val viaCol = spark.table("ext_docs").select(
      TextHashFunctions.simhash64(split(col("text"), " ")).as("sh"),
      TextHashFunctions.rolling_fingerprint(split(col("text"), " ")).as("fp"),
      TextHashFunctions.ngram_hashes(split(col("text"), " "), 3).as("nh"),
      TextHashFunctions.word_ngrams(split(col("text"), " "), 3).as("wg"),
      TextHashFunctions.minhash_signature(split(col("text"), " "), 3, 16).as("mh"),
      TextHashFunctions.md5_h60_ngrams(split(col("text"), " "), 3).as("hg"),
      TextHashFunctions.md5_simhash60(split(col("text"), " ")).as("s60"))
      .collect().head
    assert(viaSql.getLong(0) === viaCol.getLong(0))
    assert(viaSql.getLong(1) === viaCol.getLong(1))
    assert(viaSql.getSeq[Long](2) === viaCol.getSeq[Long](2))
    assert(viaSql.getSeq[String](3) === viaCol.getSeq[String](3))
    assert(viaSql.getSeq[Long](4) === viaCol.getSeq[Long](4))
    assert(viaSql.getSeq[Long](5) === viaCol.getSeq[Long](5))
    assert(viaSql.getLong(6) === viaCol.getLong(6))
  }

  test("graft_kmv_sketch resolves in SQL and matches the Column API") {
    registered
    import spark.implicits._
    (0L until 100L).toDF("h").createOrReplaceTempView("ext_hashes")
    val viaSql = spark.sql(
      "SELECT graft_kmv_sketch(h, 5) AS sk FROM ext_hashes")
      .collect().head.getSeq[Long](0)
    val viaCol = spark.table("ext_hashes")
      .agg(graft.functions.SketchFunctions.kmv_sketch(col("h"), 5).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(viaSql === viaCol && viaSql === (0L until 5L))
  }

  test("graft_anomaly_prob in SQL equals the sequential kernel") {
    registered
    import spark.implicits._
    val data = Array(0.1, 2.05, 1.5, 2.5, 2.6, 2.55, 8.0)
    Seq((data, "s1", 7L)).toDF("w", "series", "rk")
      .createOrReplaceTempView("ext_win")
    val p = spark.sql(
      """SELECT graft_anomaly_prob(w, xxhash64(series), rk,
                                   1, 4, 100, 'magnitude,cdf') AS p
        FROM ext_win""").collect().head.getDouble(0)
    val conf = AnomalyzerConf(activeSize = 1, nSeasons = 4, permCount = 100,
      methods = Seq("magnitude", "cdf"))
    val a = new Anomalyzer(conf, StreamingDetector.seriesHash("s1"))
    data.dropRight(1).foreach(a.push)
    assert(p === a.push(8.0))
  }

  test("non-literal config argument is rejected at analysis") {
    registered
    import spark.implicits._
    Seq((Array(1.0), 1L)).toDF("w", "n").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT graft_anomaly_prob(w, 1L, 1L, cast(n AS INT), 4, 10,
                                     'magnitude') FROM ext_bad""").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("embedding and md5-minhash functions resolve in SQL and match " +
    "the Column API") {
    registered
    import spark.implicits._
    Seq((Array(1.0, 2.0, 3.0, 4.0), Array(4.0, 3.0, 2.0, 1.0),
        "a b c d e f g"))
      .toDF("va", "vb", "text").createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT graft_cosine_sim(va, vb) AS cs,
               graft_cosine_lsh_bucket(va, 8, 7) AS bk,
               graft_md5_minhash(split(text, ' ')) AS mh
        FROM ext_emb""").collect().head
    val viaCol = spark.table("ext_emb").select(
      graft.functions.VectorOps.cosine(col("va"), col("vb")).as("cs"),
      graft.functions.VectorOps
        .cosine_lsh_bucket(col("va"), 8, 7L).as("bk"),
      graft.functions.TextHashFunctions
        .md5_minhash(split(col("text"), " ")).as("mh"))
      .collect().head
    assert(viaSql.getDouble(0) === viaCol.getDouble(0))
    assert(viaSql.getInt(1) === viaCol.getInt(1))
    assert(viaSql.getSeq[Long](2) === viaCol.getSeq[Long](2))
    assert(viaSql.getSeq[Long](2).length === 64)
  }

  test("graft_iln6 resolves in SQL, matches the kernel, stays in " +
    "whole-stage codegen, and nulls out-of-domain input") {
    registered
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 127L, 1000000L, 0L, -5L).toDF("n")
    df.createOrReplaceTempView("iln_t")
    val rows = spark
      .sql("SELECT n, graft_iln6(n) AS l FROM iln_t").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    Seq(1L, 2L, 3L, 127L, 1000000L).foreach { n =>
      assert(rows(n) === Some(graft.kernel.IntLn.iln6(n)),
        s"graft_iln6($n) must equal the kernel")
    }
    assert(rows(0L).isEmpty && rows(-5L).isEmpty,
      "out-of-domain input must be NULL, not an error")
    // the static-call codegen keeps the projection fused
    val plan = spark
      .sql("SELECT graft_iln6(n) FROM iln_t WHERE n > 0")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("series kernels match the interpreted lambda forms they replace " +
    "and resolve in SQL") {
    registered
    import spark.implicits._
    // windows with ties, negatives, monotone and constant stretches —
    // every branch of both kernels
    val arrs = Seq(
      (1 to 20).map(_.toLong),                       // strictly up
      (1 to 20).map(i => (21 - i).toLong),           // strictly down
      Seq.fill(20)(7L),                              // all tied
      Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L,
        5L, 8L, 9L, 7L, 9L, 3L, 2L, 3L, 8L, 4L),     // mixed ties
      (1 to 20).map(i => if (i % 3 == 0) -i.toLong else (i % 5).toLong))
    val df = arrs.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("id", "arr")
    df.createOrReplaceTempView("sk_t")
    val native = spark.sql(
      """SELECT id, graft_mann_kendall_stats(arr).s_stat AS s,
                graft_mann_kendall_stats(arr).tie_term AS t
         FROM sk_t ORDER BY id""").collect()
    val lambda = spark.sql(
      """SELECT id,
           aggregate(sequence(1, 19), 0L, (acc, i) ->
             acc + aggregate(sequence(i + 1, 20), 0L, (a2, j) ->
               a2 + (case when element_at(arr, j) > element_at(arr, i)
                            then 1L
                          when element_at(arr, j) < element_at(arr, i)
                            then -1L else 0L end))) AS s,
           aggregate(array_distinct(arr), 0L, (acc, v) ->
             acc + cast(size(filter(arr, x -> x = v)) as bigint) *
                   (size(filter(arr, x -> x = v)) - 1) *
                   (2 * size(filter(arr, x -> x = v)) + 5)) AS t
         FROM sk_t ORDER BY id""").collect()
    native.zip(lambda).foreach { case (n, l) =>
      assert(n.getLong(1) === l.getLong(1), s"s_stat id=${n.getInt(0)}")
      assert(n.getLong(2) === l.getLong(2), s"tie_term id=${n.getInt(0)}")
    }
    // Column API == SQL surface
    val viaCol = df.orderBy("id").select(
      graft.functions.SeriesKernelFunctions
        .mann_kendall_stats(col("arr")).as("mk")).collect()
    native.zip(viaCol).foreach { case (n, c) =>
      val r = c.getStruct(0)
      assert(n.getLong(1) === r.getLong(0) && n.getLong(2) === r.getLong(1))
    }

    // scaled L1: pair every window with every other (incl. itself)
    val pairs = df.select(col("id").as("ia"), col("arr").as("a"),
        expr("aggregate(arr, 0L, (x, y) -> x + y)").as("sa"))
      .crossJoin(df.select(col("id").as("ib"), col("arr").as("b"),
        expr("aggregate(arr, 0L, (x, y) -> x + y)").as("sb")))
    pairs.createOrReplaceTempView("sk_pairs")
    val nd = spark.sql(
      """SELECT ia, ib, graft_scaled_l1_dist(a, b, sa - sb, 16) AS d
         FROM sk_pairs ORDER BY ia, ib""").collect()
    val ld = spark.sql(
      """SELECT ia, ib,
           aggregate(zip_with(a, b, (x, y) ->
             abs(16L * (x - y) - (sa - sb))), 0L, (acc, x) -> acc + x) AS d
         FROM sk_pairs ORDER BY ia, ib""").collect()
    nd.zip(ld).foreach { case (n, l) =>
      assert(n.getLong(2) === l.getLong(2),
        s"d(${n.getInt(0)},${n.getInt(1)})")
    }
    val viaColD = pairs.orderBy("ia", "ib").select(
      graft.functions.SeriesKernelFunctions.scaled_l1_dist(
        col("a"), col("b"), col("sa") - col("sb"), 16).as("d")).collect()
    nd.zip(viaColD).foreach { case (n, c) =>
      assert(n.getLong(2) === c.getLong(0))
    }
    // length mismatch -> NULL, not an error
    val mm = spark.sql(
      """SELECT graft_scaled_l1_dist(array(5L, 6L, 7L), array(1L), 0L, 1)
           AS d1,
         graft_scaled_l1_dist(array(5L), array(1L), 0L, 1) AS d2""")
      .collect().head
    assert(mm.getLong(1) === 4L, s"d2 got ${mm.get(1)}")
    assert(mm.isNullAt(0), s"expected NULL, got ${mm.get(0)}")
  }

  test("int vector kernels match the interpreted lambda forms and null " +
    "length mismatches") {
    registered
    import spark.implicits._
    val df = Seq(
      (1, Seq(1L, -2L, 3L, 0L), Seq(4L, 5L, -6L, 0L)),
      (2, Seq(0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L)),
      (3, Seq(100000000L, -100000000L, 7L, 7L),
        Seq(-100000000L, 100000000L, 7L, -7L)),
      (4, Seq(5L, 5L, 5L, 5L), Seq(5L, 4L, 5L, 4L)))
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("ivk_t")
    val rows = spark.sql(
      """SELECT id,
           graft_int_sq_l2(a, b) AS n_l2,
           aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
             (acc, x) -> acc + x) AS l_l2,
           graft_int_dot(a, b) AS n_dot,
           aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
             (acc, x) -> acc + x) AS l_dot,
           graft_int_eq_count(a, b) AS n_eq,
           aggregate(zip_with(a, b, (x, y) ->
             case when x = y then 1L else 0L end), 0L,
             (acc, x) -> acc + x) AS l_eq
         FROM ivk_t ORDER BY id""").collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"sq_l2 id=${r.getInt(0)}")
      assert(r.getLong(3) === r.getLong(4), s"dot id=${r.getInt(0)}")
      assert(r.getLong(5) === r.getLong(6), s"eq id=${r.getInt(0)}")
    }
    // Column API == SQL surface
    val viaCol = df.orderBy("id").select(
      graft.functions.SeriesKernelFunctions.int_sq_l2(col("a"), col("b")),
      graft.functions.SeriesKernelFunctions.int_dot(col("a"), col("b")),
      graft.functions.SeriesKernelFunctions.int_eq_count(col("a"), col("b")))
      .collect()
    rows.zip(viaCol).foreach { case (r, c) =>
      assert(r.getLong(1) === c.getLong(0) && r.getLong(3) === c.getLong(1)
        && r.getLong(5) === c.getLong(2))
    }
    val mm = spark.sql(
      """SELECT graft_int_sq_l2(array(1L, 2L), array(1L)) AS a,
                graft_int_dot(array(1L, 2L), array(1L)) AS b,
                graft_int_eq_count(array(1L, 2L), array(1L)) AS c""")
      .collect().head
    assert(mm.isNullAt(0) && mm.isNullAt(1) && mm.isNullAt(2))
  }

  test("graft_double_dot and graft_robust_window_stats resolve in SQL " +
    "and match the Column API") {
    registered
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (1 to 50).map(i =>
      (i, Array.fill(25)(rnd.nextDouble() * 4 - 2),
        Array.fill(25)(rnd.nextDouble() * 4 - 2))).toDF("id", "a", "b")
    df.createOrReplaceTempView("dd_t")
    val viaSql = spark.sql(
      """SELECT id, graft_double_dot(a, b) AS dd,
           graft_robust_window_stats(a, 13, 7, 19) AS rs
         FROM dd_t ORDER BY id""").collect()
    val viaCol = df.orderBy("id").select(
      graft.functions.VectorOps.dotNative(col("a"), col("b")).as("dd"),
      graft.functions.SeriesKernelFunctions
        .robust_window_stats(col("a"), 13, 7, 19).as("rs"))
      .collect()
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(bits(s.getDouble(1)) === bits(c.getDouble(0)))
      val (rs, rc) = (s.getStruct(2), c.getStruct(1))
      (0 until 4).foreach { i =>
        assert(bits(rs.getDouble(i)) === bits(rc.getDouble(i)))
      }
    }
    val mm = spark.sql(
      """SELECT graft_double_dot(array(1.0D, 2.0D), array(1.0D)) AS a,
                graft_robust_window_stats(array(1.0D, 2.0D), 13, 7, 19) AS b""")
      .collect().head
    assert(mm.isNullAt(0) && mm.isNullAt(1))
  }

  test("theil-sen kernel matches the flatten/sort/pick lambda pipeline") {
    registered
    import spark.implicits._
    val arrs = Seq(
      (1 to 10).map(_.toLong * 3),                       // constant slope
      Seq(5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L),       // flat
      Seq(1L, 100L, 2L, 3L, 4L, -50L, 6L, 7L, 8L, 9L),   // outliers
      Seq(-3L, 14L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L))
    val df = arrs.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("id", "arr")
    df.createOrReplaceTempView("ts_t")
    val w = 10
    val midIdx = (w * (w - 1) / 2 + 1) / 2
    val rows = spark.sql(
      s"""SELECT id, graft_theil_sen_median_slope(arr) AS n,
            element_at(array_sort(flatten(transform(sequence(1, ${w - 1}),
              i -> transform(sequence(i + 1, $w), j ->
                cast(element_at(arr, j) - element_at(arr, i) as double) /
                cast(j - i as double))))), $midIdx) AS l
          FROM ts_t ORDER BY id""").collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"id=${r.getInt(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
    val nul = spark.sql(
      "SELECT graft_theil_sen_median_slope(array(7L)) AS d").collect().head
    assert(nul.isNullAt(0))
  }

  test("ks grid stat kernel matches the grid-fold lambda pipeline") {
    registered
    import spark.implicits._
    val n1 = 8; val n2 = 2; val w = n1 + n2
    val mAct = 4; val mRef = 1 // lcm(8,2)=8 -> 8/2, 8/8
    val arrs = Seq(
      (1 to 10).map(_.toDouble),
      Seq.fill(10)(3.25),                          // zero step
      Seq(0.1, 0.7, 0.3, 0.9, 0.2, 0.8, 0.4, 0.6, 5.5, 5.6), // shifted tail
      Seq(-4.2, 1.0, 0.5, -0.5, 2.25, -1.75, 3.0, 0.0, 0.125, -2.5))
    val df = arrs.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("id", "arr")
    df.createOrReplaceTempView("ks_t")
    val rows = spark.sql(
      s"""SELECT id, graft_ks_grid_stat_num(arr, $n1, $n2) AS n,
           cast(array_max(transform(
             aggregate(sequence(1, ${w - 1}),
               array(array_min(arr)), (acc, i) -> array_append(acc,
                 element_at(acc, size(acc)) +
                 (array_max(arr) - array_min(arr)) / ${w - 1}.0D)),
             g -> abs($mAct * size(filter(slice(arr, ${n1 + 1}, $n2),
               y -> y <= g)) - $mRef * size(filter(slice(arr, 1, $n1),
               y -> y <= g))))) as long) AS l
         FROM ks_t ORDER BY id""").collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id=${r.getInt(0)}")
    }
    val nul = spark.sql(
      s"SELECT graft_ks_grid_stat_num(array(1.0D, 2.0D), $n1, $n2) AS d")
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("double rank sum kernel matches the aggregate/filter fold") {
    registered
    import spark.implicits._
    val rows = Seq(
      (1, Seq(3.0, 7.0), Seq(1.0, 3.0, 5.0, 7.0, 9.0)),
      (2, Seq(0.0, 0.0), Seq(0.0, 0.0, 0.0)),
      (3, Seq(Double.PositiveInfinity, -2.5),
        Seq(-2.5, 0.0, Double.PositiveInfinity, 4.25)),
      (4, Seq.empty[Double], Seq(1.0, 2.0)))
      .toDF("id", "sub", "full")
    rows.createOrReplaceTempView("rs_t")
    val got = spark.sql(
      """SELECT id, graft_double_rank_sum(sub, full) AS n,
           aggregate(sub, 0L, (s, x) ->
             s + size(filter(full, y -> y < x))) AS l
         FROM rs_t ORDER BY id""").collect()
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id=${r.getInt(0)}")
    }
  }

  test("rademacher LSH bucket matches the nested lambda fold") {
    registered
    import spark.implicits._
    val vecs = Seq(
      (1, (1 to 64).map(i => (i * 37 - 1200).toLong)),
      (2, Seq.fill(64)(0L)),
      (3, (1 to 64).map(i => if (i % 2 == 0) 1000000L else -999999L)),
      (4, (1 to 8).map(_.toLong)))                // non-64-dim
    val df = vecs.toDF("id", "ei")
    df.createOrReplaceTempView("rl_t")
    for (t <- Seq(0, 3, 7)) {
      val rows = spark.sql(
        s"""SELECT id, graft_rademacher_lsh_bucket(ei, $t, 6) AS n,
             aggregate(sequence(0, 5), 0L, (acc, b) -> acc +
               CASE WHEN aggregate(transform(ei, (x, d) -> x *
                   (CASE WHEN ((($t*1000003 + b*8191 + d) * 2654435761L)
                                % 2147483647L) % 2 = 1
                         THEN 1L ELSE -1L END)),
                 0L, (a, x) -> a + x) > 0
               THEN shiftleft(1L, b) ELSE 0L END) AS l
           FROM rl_t ORDER BY id""").collect()
      rows.foreach { r =>
        assert(r.getLong(1) === r.getLong(2), s"t=$t id=${r.getInt(0)}")
      }
    }
  }

  test("bm25 contribution kernel matches the DECIMAL(38) pipeline, " +
    "BigInteger at 100 TB magnitudes, and resolves in SQL") {
    registered
    import spark.implicits._
    // sf-scale magnitudes: verify against the exact DECIMAL(38,0)
    // expression pipeline the kernel replaced (same formula the DuckDB
    // oracle runs in HUGEINT)
    val rows = Seq(
      (1, 9210340L, 3L, 54L, 270658L, 5000L),
      (2, 1L, 1L, 1L, 1L, 1L),
      (3, 36000000L, 120L, 2000L, 270658L, 5000L),
      (4, 14508658L, 1L, 10L, 541316L, 10000L),
      (5, 0L, 5L, 50L, 270658L, 5000L)) // idf6=0 -> c6=0
      .toDF("id", "idf6", "tf", "dl", "a", "n")
    rows.createOrReplaceTempView("bm_t")
    val got = spark.sql(
      """SELECT id, graft_bm25_c6(idf6, tf, dl, a, n) AS k,
           CAST((CAST(idf6 AS DECIMAL(38,0)) * 22 * tf * a +
             (CAST(10 AS DECIMAL(38,0)) * tf * a +
              CAST(3 AS DECIMAL(38,0)) * a +
              CAST(9 AS DECIMAL(38,0)) * dl * n) div 2)
             div (CAST(10 AS DECIMAL(38,0)) * tf * a +
              CAST(3 AS DECIMAL(38,0)) * a +
              CAST(9 AS DECIMAL(38,0)) * dl * n) AS BIGINT) AS d
         FROM bm_t ORDER BY id""").collect()
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id=${r.getInt(0)}")
    }
    // 100 TB magnitudes (a_toks ~ 1e13-1e14, where int64 AND
    // DECIMAL(38) intermediate products both leave the comfortable
    // range): seeded sweep against an exact BigInteger reference
    import java.math.BigInteger
    val rnd = new java.util.Random(42)
    def pick(lim: Long): Long = 1L + ((rnd.nextLong() & Long.MaxValue) % lim)
    (1 to 2000).foreach { i =>
      val idf6 = pick(40000000L); val tf = pick(100000L)
      val dl = pick(1000000L); val a = pick(100000000000000L)
      val n = pick(1000000000000L)
      val bi = (x: Long) => BigInteger.valueOf(x)
      val den = bi(10L).multiply(bi(tf)).multiply(bi(a))
        .add(bi(3L).multiply(bi(a)))
        .add(bi(9L).multiply(bi(dl)).multiply(bi(n)))
      val num = bi(idf6).multiply(bi(22L)).multiply(bi(tf)).multiply(bi(a))
      val want = num.add(den.shiftRight(1)).divide(den).longValueExact()
      val gotK = graft.functions.Bm25Contrib.c6(idf6, tf, dl, a, n)
      assert(gotK === want,
        s"i=$i idf6=$idf6 tf=$tf dl=$dl a=$a n=$n: kernel $gotK != BigInteger $want")
    }
  }

  test("kernel array inputs REJECT NULL elements instead of reading " +
    "them as 0 (KernelInput guard)") {
    registered
    import spark.implicits._
    val df = Seq((1, Seq[java.lang.Double](1.0, null, 3.0)),
      (2, Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("id", "arr")
    df.createOrReplaceTempView("nul_t")
    // clean rows evaluate; the NULL-element row must throw, not return
    val ok = spark.sql(
      "SELECT graft_double_rank_sum(arr, arr) FROM nul_t WHERE id = 2")
      .collect()
    assert(ok.head.getLong(0) === 3L) // strict-less self rank sum of distinct
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_double_rank_sum(arr, arr) FROM nul_t WHERE id = 1")
        .collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("NULL array element")),
      s"expected the KernelInput guard, got: $e")
  }
}
