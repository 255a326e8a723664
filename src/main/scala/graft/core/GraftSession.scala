package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SparkSession factory with the engine's canonical configuration.
  *
  * UTC session time zone (the reference keeps storage in UTC and derives
  * display offsets as columns — reference `README.md:68`), AQE enabled for
  * runtime re-planning (skew joins, partition coalescing at scale), and
  * shuffle partitions sized for the local test harness (a real cluster
  * deployment overrides `spark.sql.shuffle.partitions` per job).
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // parquet TIMESTAMP(NANOS) is otherwise rejected outright; with
      // this flag it reads as a raw long, which Tables.normalizeNanos
      // truncates to a µs timestamp (DuckDB's nanos-read semantics).
      // The testdata has shipped both ns- and µs-encoded `events.ts`
      // over the project's life; keeping the flag means either encoding
      // reads through the same seam (NanosEncodingSpec pins both).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Table loader for the deterministic testdata layout
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, see TESTDATA.md).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNanos(spark.read.parquet(s"$dir/$name.parquet"))

  /** Parquet TIMESTAMP(NANOS) columns arrive as raw long nanos (see the
    * `nanosAsLong` flag in [[GraftSession]]); truncate to µs wall-clock
    * timestamps — identical to DuckDB's nanos→TIMESTAMP read semantics.
    * µs-encoded data (the current testdata era) already reads as
    * `timestamp_ntz` and passes through untouched — both encodings land
    * identically (NanosEncodingSpec). */
  private[graft] def normalizeNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    // The only nanos column in the testdata contract is `events.ts`
    // (FIXTURES.md §A); anything else long-typed stays untouched.
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType && f.name == "ts")
        d.withColumn(f.name,
          timestamp_micros(call_function("div", col(f.name), lit(1000L)))
            .cast("timestamp_ntz"))
      else d
    }
  }
}
