package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ShardWriterSpec extends AnyFunSuite with SparkTestBase {

  test("sharded write conserves rows, bounds every file, routes each " +
    "file to exactly one partition, and prunes on read-back") {
    val out = Files.createTempDirectory("graft-shards").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    val maxPerFile = 40L

    val manifest = ShardWriter
      .writeSharded(spark, docs, out, "lang", maxPerFile)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    // conservation: the manifest accounts for every input row once
    assert(manifest.map(_._3).sum === total)
    // bound: no shard file exceeds the declared size
    manifest.foreach { case (f, _, n) =>
      assert(n <= maxPerFile, s"$f has $n rows > $maxPerFile")
    }
    // routing: a file belongs to exactly one partition value, and the
    // hive-style path encodes it (what gives consumers pruning)
    manifest.groupBy(_._1).foreach { case (f, rows) =>
      assert(rows.map(_._2).distinct.length === 1)
      assert(f.contains(s"lang=${rows.head._2}"),
        s"$f not routed under its partition directory")
    }
    // per-partition totals survive the roundtrip
    val wantByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotByLang = manifest.groupBy(_._2).map { case (l, xs) =>
      l -> xs.map(_._3).sum
    }
    assert(gotByLang === wantByLang)

    // partition pruning: a lang-filtered read lists only that
    // partition's files
    val onelang = wantByLang.keys.head
    val pruned = spark.read.parquet(out)
      .filter(col("lang") === onelang)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(pruned.nonEmpty && pruned.forall(_.contains(s"lang=$onelang")))
  }
}
