package tmpverify

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// per-stage cost census for p58 (round-11 task 4): isolate tokenize+post
// build, the 4.5M-row candidate join, the decimal score math, and the agg.
object P58Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32, "p58prof")
    val dir = "/root/testdata/sf0.1"
    val norm = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    def toks = split(norm, " ")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    val dec = (c: Column) => c.cast("decimal(38,0)")

    def time(name: String)(f: => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      f.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s median ${ts.sorted.apply(1)}%6.3f  runs ${ts.map(t => f"$t%5.3f").mkString(" ")}")
    }

    def post = docs
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("tok"))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).as("tf"))
    def scal = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(toks)).cast("long").as("a_toks"))
    def qdim(p: DataFrame) = {
      val dfdim = p.groupBy("tok").agg(count(lit(1)).as("df"))
      p.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("q_id"), col("tok"))
        .join(dfdim, "tok").crossJoin(broadcast(scal))
        .withColumn("idf6", expr("cast(round(ln((n_docs + 1.0D) / " +
          "(df + 0.5D)) * 1e6) as bigint)"))
        .select(col("q_id"), col("tok"), col("idf6"))
    }

    time("post build")(post)
    val p = post.persist(); p.count()
    val q = qdim(p)
    time("qdim (given post)")(q)
    def cand = p.join(broadcast(q), "tok").filter(col("doc_id") =!= col("q_id"))
    time("cand join, count only")(
      cand.groupBy(col("q_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_terms")))
    time("cand + decimal score")(
      cand.crossJoin(broadcast(scal))
        .withColumn("den", dec(lit(10L)) * col("tf") * col("a_toks") +
          dec(lit(3L)) * col("a_toks") +
          dec(lit(9L)) * col("dl") * col("n_docs"))
        .withColumn("num", dec(col("idf6")) * lit(22L) * col("tf") *
          col("a_toks"))
        .withColumn("c6", expr("cast((num + den div 2) div den as bigint)"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("c6")).as("score6"), count(lit(1)).as("n_terms")))
    time("cand + int64 score")(
      cand.crossJoin(broadcast(scal))
        .withColumn("den", lit(10L) * col("tf") * col("a_toks") +
          lit(3L) * col("a_toks") + lit(9L) * col("dl") * col("n_docs"))
        .withColumn("num", col("idf6") * lit(22L) * col("tf") * col("a_toks"))
        .withColumn("c6", expr("cast((num + den div 2) div den as bigint)"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("c6")).as("score6"), count(lit(1)).as("n_terms")))
    // full p58 shape on the decimal path incl. final rank
    time("full p58 (decimal+rank)") {
      val sc = cand.crossJoin(broadcast(scal))
        .withColumn("den", dec(lit(10L)) * col("tf") * col("a_toks") +
          dec(lit(3L)) * col("a_toks") +
          dec(lit(9L)) * col("dl") * col("n_docs"))
        .withColumn("num", dec(col("idf6")) * lit(22L) * col("tf") *
          col("a_toks"))
        .withColumn("c6", expr("cast((num + den div 2) div den as bigint)"))
        .groupBy(col("q_id").as("query_id"), col("doc_id"))
        .agg(sum(col("c6")).as("score6"), count(lit(1)).as("n_terms"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id")
        .orderBy(col("score6").desc, col("doc_id"))
      sc.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
    }
    spark.stop()
  }
}
