package graft.state

import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.{Fixtures, SparkSpec}
import graft.jobs.CompactorJob

class SchemaRegistrySpec extends SparkSpec {

  private def newStore(): JdbcStateStore = {
    val s = new JdbcStateStore(
      s"jdbc:derby:memory:sreg${scala.util.Random.nextInt(1000000)};create=true")
    s.ensureTable()
    s
  }

  test("schemas merge drift by name, keeping first types") {
    val store = newStore()
    val v1 = StructType(Seq(
      StructField("heartbeat", LongType), StructField("gpsspeed", DoubleType)))
    val v2 = StructType(Seq(
      StructField("heartbeat", LongType), StructField("fuel_level", DoubleType)))
    assert(store.loadSchema("d") == None)
    store.mergeSchema("d", v1)
    val merged = store.mergeSchema("d", v2)
    assert(merged.fieldNames.toSeq == Seq("heartbeat", "gpsspeed", "fuel_level"))
    assert(store.loadSchema("d").get == merged)
    store.close()
  }

  test("first compactor batch registers the schema; reruns read without inference") {
    val dir = tmpDir("sreg_bronze")
    val target = tmpDir("sreg_silver")
    val (keys, expectClean, _) = Fixtures.bronzeBatch(dir)
    val store = newStore()
    keys.zipWithIndex.foreach { case (k, i) =>
      store.register(k, "DISTRICTB", new Timestamp(1704067200000L + i))
    }
    assert(store.loadSchema(CompactorJob.SchemaDataset).isEmpty)
    val r1 = CompactorJob.run(spark, store, "r1", "DISTRICTB", target)
    assert(r1.rows == expectClean)
    val learned = store.loadSchema(CompactorJob.SchemaDataset).get
    assert(learned.fieldNames.contains("heartbeat"))
    assert(learned.fieldNames.contains("fuel_level")) // drifted column learned
    assert(!learned.fieldNames.contains("_corrupt_record"))
    assert(!learned.fieldNames.contains("source_file"))

    // second batch of fresh files: read path uses the stored schema
    val k2 = graft.Fixtures.writeGz(s"$dir/site/dev9/2024010101/2024010101.txt.gz", Seq(
      s"""{"heartbeat": ${Fixtures.Base + 3600}, "unitno": "NEW1", "deviceid": "X", "gpsspeed": 10.0}"""))
    store.register(k2, "DISTRICTB", new Timestamp(1704070800000L))
    val r2 = CompactorJob.run(spark, store, "r2", "DISTRICTB", target)
    assert(r2.rows == 1)
    assert(spark.read.parquet(target).count() == expectClean + 1)
    store.close()
  }
}
