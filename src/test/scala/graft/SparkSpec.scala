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

  /** Spark jobs started while `body` runs (the event bus posts
    * asynchronously — drained by a short poll; suites share one
    * sequentially-run JVM, so no foreign jobs interleave). */
  def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(1000) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }
}
