package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextHashFunctions
import graft.operators.EntryCaches.TrackedPersist
import org.apache.spark.sql.expressions.Window

object P87Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("local[32]", 32, "p87-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val d = graft.sources.Tables.table(spark, dir, "documents")
    val toks = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
    val pairs = Pipeline.minhashLshPairs(d).select("doc_a", "doc_b").persistTracked()
    time("pairs")(pairs.count())
    val inPairs = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"))).distinct()
    time("inPairs")(inPairs.count())
    val g8 = d.join(inPairs, "doc_id")
      .withColumn("sh", TextHashFunctions.ngram_hashes(toks, 8))
      .select(col("doc_id"), posexplode(col("sh")).as(Seq("pos", "h")))
    time("g8")(g8.count())
    val m = pairs
      .join(g8.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"), col("h")), "doc_a")
      .join(g8.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"), col("h")), Seq("doc_b", "h"))
      .persistTracked()
    time("m")(m.count())
    val wRun = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    val best = m
      .withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("grp", col("pos_a") - row_number().over(wRun))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(count(lit(1)).as("runlen"))
      .groupBy("doc_a", "doc_b").agg(max(col("runlen")).as("maxrun"))
    time("best")(best.count())
    graft.operators.EntryCaches.releaseAll(); spark.catalog.clearCache()
    time("full-entry")(Catalog.queries("p87_longest_common_run")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full-again")(Catalog.queries("p87_longest_common_run")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
