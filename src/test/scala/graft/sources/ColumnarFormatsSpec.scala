package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source-format matrix beyond the lake's parquet default: ORC ships
  * inside Spark (no extra dependency) and is the columnar format a
  * migrating warehouse most often brings along. The engine's claims —
  * hive-partitioned layout, predicate pushdown into the scan, column
  * pruning, value-exact round-trips — must hold there too, or "switch
  * your reader" becomes a silent correctness/scan-cost trap.
  */
class ColumnarFormatsSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  test("ORC round-trip is value-exact against the parquet source") {
    val src = spark.read.parquet(docs)
    val path = tmpDir("orc_docs")
    src.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)), "schema must survive")
    val a = src.orderBy("doc_id").collect()
    val b = back.orderBy("doc_id").collect()
    assert(a.sameElements(b), "every value must survive the format change")
  }

  test("ORC scans push filters and prune columns like the parquet path") {
    val path = tmpDir("orc_pushdown")
    spark.read.parquet(docs).write.mode("overwrite").orc(path)
    val q = spark.read.orc(path)
      .filter(col("lang") === "en" && col("n_chars") > 100)
      .select("doc_id", "lang")
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("PushedFilters") && p.contains("EqualTo(lang,en)"),
      s"lang filter must reach the ORC scan:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(!read.contains("text"),
      s"the wide text column must be pruned from a 2-column projection:\n$p")
  }

  test("hive-partitioned ORC: partition pruning skips non-matching directories") {
    val path = tmpDir("orc_partitioned")
    spark.read.parquet(docs)
      .withColumn("shard", pmod(col("doc_id"), lit(4)))
      .write.mode("overwrite").partitionBy("shard").orc(path)
    val pruned = spark.read.orc(path).filter(col("shard") === 2)
    val p = pruned.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters") && p.contains("shard"),
      s"partition predicate must prune directories, not filter rows:\n$p")
    val want = spark.read.parquet(docs).filter(pmod(col("doc_id"), lit(4)) === 2).count()
    assert(pruned.count() == want)
  }
}
