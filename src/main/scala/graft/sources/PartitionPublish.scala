package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The one safe partition-replacing publish, shared by every rewrite
  * path (SilverWriter.writeIdempotent, RepairJob.repair). Encapsulates
  * three hazards the call sites each used to handle (or mishandle)
  * separately:
  *
  *  1. **Read-write conflict**: Spark refuses a plan that overwrites a
  *     path it is still reading, so the combined rows are staged
  *     durably first and the overwrite reads only the stage.
  *  2. **Failed-publish data loss**: the stage is deleted only AFTER a
  *     successful overwrite — a publish that dies mid-commit may have
  *     already cleared a partition directory, and then the stage is
  *     the only complete copy of its rows.
  *  3. **Emptied partitions**: dynamic partition overwrite only
  *     rewrites partitions PRESENT in its output. An affected
  *     partition whose rows all moved elsewhere (or were all replaced
  *     away) receives no output rows, so the overwrite leaves its
  *     stale files untouched — the caller's replace silently becomes a
  *     duplicate. After the overwrite, every affected leaf that got no
  *     output rows is deleted explicitly.
  */
object PartitionPublish {

  /** A leaf partition as (partition value per column, None = null). */
  type Leaf = Seq[Option[String]]

  val StageDirName = ".publish_stage"

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  def leafDir(target: String, partitionCols: Seq[String], leaf: Leaf): Path =
    new Path(target, partitionCols.zip(leaf).map { case (c, v) =>
      s"$c=${v.getOrElse(HiveDefaultPartition)}"
    }.mkString("/"))

  /** Publish `rows` into hive-partitioned `target`, REPLACING the given
    * affected leaf partitions: partitions present in `rows` are
    * rewritten via dynamic partition overwrite; affected partitions
    * absent from `rows` are deleted. Partitions outside `affected` are
    * never touched (and `rows` must not contain any — dynamic overwrite
    * would clobber them wholesale). */
  def publish(
      spark: SparkSession,
      target: String,
      rows: DataFrame,
      partitionCols: Seq[String],
      affected: Seq[Leaf]): Unit =
    publishWithHooks(spark, target, rows, partitionCols, affected)

  /** [[publish]] with crash-injection points for tests: the hooks run
    * after the stage write and after the overwrite commit respectively
    * — a hook that throws models a process death at exactly the
    * boundary the hazard analysis names. Production callers use
    * [[publish]]; semantics are identical with no-op hooks. */
  private[graft] def publishWithHooks(
      spark: SparkSession,
      target: String,
      rows: DataFrame,
      partitionCols: Seq[String],
      affected: Seq[Leaf],
      afterStage: () => Unit = () => (),
      afterOverwrite: () => Unit = () => ()): Unit = {
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(target, StageDirName)
    rows.write.mode("overwrite").parquet(stage.toString)
    afterStage()

    val staged = spark.read.parquet(stage.toString)
    val written: Set[Leaf] = staged
      .select(partitionCols.map(col): _*).distinct()
      .collect().map(r => partitionCols.indices.map(i =>
        Option(r.get(i)).map(_.toString)): Leaf).toSet

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      staged
        .repartition(partitionCols.map(col): _*)
        .write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy(partitionCols: _*)
        .parquet(target)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    afterOverwrite()
    // Affected partitions that received no rows: everything they held
    // was replaced away, so clear them (delete tolerates absent dirs).
    affected.filterNot(written.contains)
      .foreach(l => fs.delete(leafDir(target, partitionCols, l), true))
    // Stage removed only now — see hazard 2 in the object doc.
    fs.delete(stage, true)
  }
}
