package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CleanExprsSpec extends SparkSpec {
  import spark.implicits._

  test("parseKey splits hive path into typed fields") {
    val got = Seq("siteA/hiveperiod=2024-01-01/dstrct_code=DISTRICTB/2024010100.txt.gz")
      .toDF("key").select(CleanExprs.parseKey(col("key")).as("p"))
      .select("p.jobsite", "p.hiveperiod", "p.dstrct_code", "p.filename")
      .as[(String, String, String, String)].head()
    assert(got == (("siteA", "2024-01-01", "DISTRICTB", "2024010100.txt.gz")))
  }

  test("parseKey on short keys yields nulls, not errors") {
    val got = Seq("only/two").toDF("key")
      .select(CleanExprs.parseKey(col("key")).as("p"))
      .select("p.filename").collect().head
    assert(got.isNullAt(0))
  }

  test("sentinel replacement maps -9999 to -1 and passes other values") {
    val got = Seq(-9999.0, 42.5, -1.0).toDF("v")
      .select(CleanExprs.replaceSentinel(col("v"))).as[Double].collect().toSeq
    assert(got == Seq(-1.0, 42.5, -1.0))
  }

  test("gpsStatus keeps the reference's string-boolean convention") {
    val got = Seq(-8881.0, -2.1).toDF("lat")
      .select(CleanExprs.gpsStatus(col("lat"))).as[String].collect().toSeq
    assert(got == Seq("false", "true"))
  }

  test("stripPrefix only strips at the start") {
    val got = Seq("hiveperiod=2024-01-01", "x_hiveperiod=y").toDF("s")
      .select(CleanExprs.stripPrefix(col("s"), "hiveperiod=")).as[String].collect().toSeq
    assert(got == Seq("2024-01-01", "x_hiveperiod=y"))
  }
}
