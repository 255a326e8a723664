package graft

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

/** Reference-shaped bronze fixtures (FIXTURES.md §B1): NDJSON.gz, one
  * file per device per hour, with schema drift, malformed lines, mixed
  * epoch precisions, and an empty file. */
object Fixtures {

  val Base = 1704067200L // 2024-01-01T00:00:00Z

  def row(hb: Long, unit: String, dev: String, gpsspeed: Double,
      extra: String = ""): String =
    s"""{"heartbeat": $hb, "unitno": "$unit", "deviceid": "$dev", "gpsspeed": $gpsspeed,
       | "VehicleSpeed": ${gpsspeed - 1.5}, "gpsnumsat": 11.0, "gpslat": -2.1,
       | "gpslong": 115.4, "speedsource": "GPS", "camcabinstatus": "OK",
       | "camfrontstatus": "OK"$extra}""".stripMargin.replaceAll("\n", "")

  def writeGz(path: String, lines: Seq[String]): String = {
    val f = new File(path)
    f.getParentFile.mkdirs()
    val out = new GZIPOutputStream(new FileOutputStream(f))
    out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    out.close()
    f.toURI.toString
  }

  /** Four files: normal (mixed epoch precisions), drifted schema,
    * one malformed line, and zero rows. Returns (paths, expectedClean,
    * expectedCorrupt). */
  def bronzeBatch(dir: String): (Seq[String], Long, Long) = {
    val f1 = writeGz(s"$dir/site/dev1/2024010100/2024010100.txt.gz", Seq(
      row(Base, "LD772", "SLS30I001", 42.5), // seconds
      row((Base + 60) * 1000, "LD772", "SLS30I001", 43.0), // ms
      row((Base + 120) * 1000000, "LD772", "SLS30I001", 44.0), // µs
      row((Base + 180) * 1000000000, "LD772", "SLS30I001", 45.0))) // ns
    val f2 = writeGz(s"$dir/site/dev2/2024010100/2024010100.txt.gz", Seq(
      // drift: adds fuel_level, drops gpsnumsat
      s"""{"heartbeat": ${Base + 240}, "unitno": "PM1582", "deviceid": "SLS30I002", "gpsspeed": 30.0, "VehicleSpeed": 29.0, "gpslat": -2.2, "gpslong": 115.5, "speedsource": "GPS", "camcabinstatus": "OK", "camfrontstatus": "OK", "fuel_level": 0.82}""",
      // sentinel + no-GPS-fix row
      s"""{"heartbeat": ${Base + 300}, "unitno": "PM1582", "deviceid": "SLS30I002", "gpsspeed": -9999, "VehicleSpeed": -9999, "gpslat": -8881.0, "gpslong": 115.5, "speedsource": "NONE", "camcabinstatus": "BAD", "camfrontstatus": "OK", "fuel_level": 0.81}"""))
    val f3 = writeGz(s"$dir/site/dev3/2024010100/2024010100.txt.gz", Seq(
      row(Base + 360, "LD773", "SLS30I003", 50.0),
      """{"heartbeat": 17040, "unitno": BROKEN JSON""", // malformed
      // late row: event time a day earlier than the batch hour
      row(Base - 86400, "LD773", "SLS30I003", 51.0)))
    val f4 = writeGz(s"$dir/site/dev4/2024010100/2024010100.txt.gz", Seq())
    (Seq(f1, f2, f3, f4), 8L, 1L)
  }
}
