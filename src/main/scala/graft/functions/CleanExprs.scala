package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cleaning / repair expression library.
  *
  * Mirrors the reference's sensor-data hygiene rules (sentinel nulls,
  * GPS-fix detection, speed-deviation metric — reference
  * `streamlit-iot-monitoring-dashboard/streamlit-app.py:143-153`) and the
  * S3-key parsing used by the mispartition repair job (reference
  * `v1-basic-etl/data-cleaner.py:127-142`).
  */
object CleanExprs {

  /** `-9999` means "sensor did not report" in the reference; dashboards map
    * it to `-1` (reference `streamlit-app.py:143-145`). */
  def replaceSentinel(c: Column, sentinel: Double = -9999.0, repl: Double = -1.0): Column =
    when(c === sentinel, repl).otherwise(c)

  /** Latitudes below -8880 encode "no GPS fix" → status string, keeping the
    * reference's string-boolean convention (reference `streamlit-app.py:146-149`). */
  def gpsStatus(gpslat: Column): Column =
    when(gpslat < -8880.0, lit("false")).otherwise(lit("true"))

  /** |gpsspeed - VehicleSpeed| deviation metric (reference `streamlit-app.py:153`). */
  def errorRate(gpsspeed: Column, vehicleSpeed: Column): Column =
    abs(gpsspeed - vehicleSpeed)

  /** Parse an object-store key `jobsite/hiveperiod=D/dstrct_code=C/file`
    * into typed fields (reference `data-cleaner.py:127-138` splitn→struct). */
  def parseKey(key: Column): Column = {
    val parts = split(key, "/", 7)
    // `get` (not getItem) so short keys yield nulls instead of an ANSI
    // out-of-bounds error — repair scans meet ragged keys routinely.
    struct(
      get(parts, lit(0)).as("jobsite"),
      stripPrefix(get(parts, lit(1)), "hiveperiod=").as("hiveperiod"),
      stripPrefix(get(parts, lit(2)), "dstrct_code=").as("dstrct_code"),
      get(parts, lit(3)).as("filename"))
  }

  /** Strip a literal prefix (reference `data-cleaner.py:141`
    * `str.replace("hiveperiod=", "")`). */
  def stripPrefix(c: Column, prefix: String): Column =
    regexp_replace(c, "^" + java.util.regex.Pattern.quote(prefix), "")

  /** Rows whose stored partition disagrees with their event-derived
    * partition — the repair-scan predicate (reference `data-cleaner.py:113`). */
  def mispartitioned(stored: Column, derived: Column): Column =
    stored =!= derived
}
