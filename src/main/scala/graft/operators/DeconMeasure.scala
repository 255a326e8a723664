package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Caches, Tables}

/** Reproduction harness for SCALE.md's decon-matrix scale points: the
  * attribution matrix's cost is contamination volume × benchmarks
  * sharing each span, so its scaling depends on the EVAL side's shape,
  * not just the corpus size. Times the matrix at the declared query's
  * saturated fixture split (eval = 10%% of the corpus — the worst
  * case, which the 100×-replicated sf10 fixture inflates further) and
  * at the realistic benchmark-sized split (eval = 0.1%%).
  *
  *   sbt "runMain graft.operators.DeconMeasure /root/testdata/sf0.1"
  */
object DeconMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ARM_ONLY").map(_.split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.GraftSession.initialPartitionNum(cpus.toInt, sfDir).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables(spark, sfDir, "documents")
    d.count() // warm scan

    def time(label: String, evalMod: Int): Unit = {
      if (!only.forall(_.exists(label.contains))) return
      val t0 = System.nanoTime()
      val n = SubstringDedup.deconMatrixOn(
        d.filter(col("doc_id") % evalMod =!= 0),
        d.filter(col("doc_id") % evalMod === 0)).count()
      println(f"DECON $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      Caches.releaseAll()
      spark.catalog.clearCache()
    }
    time("matrix_sat_10pct", 10)
    time("matrix_bench_0.1pct", 1000)
    spark.stop()
  }
}
