package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared session for all suites (one JVM, one SparkSession). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** A fresh path that does NOT yet exist (Spark writers refuse to
    * overwrite an existing dir in default save mode). */
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("out").toString
}
