package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized-sequence property for [[PartitionPublish]], the one shared
  * partition-mutation primitive (SilverWriter + RepairJob): over any
  * sequence of publishes — arbitrary affected sets, arbitrary emptied
  * partitions, null partition values, crash injection at both stage
  * boundaries followed by a retry — the target always equals the last
  * successful publish of each affected partition plus every untouched
  * partition, and the stage dir never outlives a successful publish.
  */
class PartitionPublishPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Leaves: List[Option[String]] =
    List(Some("a"), Some("b"), Some("c"), Some("d"), None)

  /** crash: 0 = clean, 1 = die after stage write, 2 = die after the
    * overwrite commit (before emptied-partition cleanup). */
  private case class Step(
      affected: List[Option[String]],
      rows: Map[Option[String], List[Long]],
      crash: Int)

  private val stepGen: Gen[Step] = for {
    affectedSel <- Gen.someOf(Leaves)
    affected = if (affectedSel.isEmpty) List(Leaves.head) else affectedSel.toList
    rowLists <- Gen.listOfN(affected.size,
      Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 999999L))))
    fixIdx <- Gen.chooseNum(0, affected.size - 1)
    fixId <- Gen.chooseNum(0L, 999999L)
    crash <- Gen.frequency((2, 0), (1, 1), (1, 2))
  } yield {
    // An all-empty publish would stage a zero-file parquet dir that the
    // re-read can't infer a schema from — a real caller always has at
    // least one row somewhere (emptied partitions still covered by the
    // other affected leaves).
    val lists =
      if (rowLists.forall(_.isEmpty)) rowLists.updated(fixIdx, List(fixId))
      else rowLists
    Step(affected, affected.zip(lists).toMap, crash)
  }

  private def toDf(rows: Seq[(Long, Option[String])]) =
    rows.map { case (id, p) => (id, p.orNull) }.toDF("id", "p")

  private def readState(target: String): Set[(Long, Option[String])] =
    spark.read.parquet(target).collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        Option(r.getAs[String]("p")))).toSet

  test("any publish sequence with crashes+retries converges to the model state") {
    val prop = Prop.forAll(Gen.listOfN(6, stepGen)) { steps =>
      val target = tmpDir("pub_prop")
      // Seed every leaf plus a sentinel partition that no step ever
      // lists as affected — it must survive the whole sequence intact.
      var model: Map[Option[String], Set[Long]] =
        (Leaves.map(_ -> Set(7777L)) :+ (Some("zz") -> Set(-1L))).toMap
      PartitionPublish.publish(spark, target,
        toDf(model.toSeq.flatMap { case (p, ids) => ids.map(_ -> p) }),
        Seq("p"), model.keys.map(List(_)).toSeq)

      steps.forall { step =>
        val rowsDf = toDf(step.affected.flatMap(l => step.rows(l).map(_ -> l)))
        def attempt(crash: Int): Unit = PartitionPublish.publishWithHooks(
          spark, target, rowsDf, Seq("p"), step.affected.map(List(_)),
          afterStage = () => if (crash == 1) throw new RuntimeException("boom:stage"),
          afterOverwrite = () => if (crash == 2) throw new RuntimeException("boom:overwrite"))
        val crashed =
          try { attempt(step.crash); false }
          catch { case e: RuntimeException if e.getMessage.startsWith("boom") => true }
        // A crashed publish is retried (the claim-loop's recovery move);
        // the retry must converge regardless of which boundary died.
        if (crashed) attempt(0)
        model = model ++ step.affected.map(l => l -> step.rows(l).toSet)
        val expect = model.toSeq.flatMap { case (p, ids) => ids.map(_ -> p) }.toSet
        val got = readState(target)
        val stageGone = !new java.io.File(target, PartitionPublish.StageDirName).exists()
        if (got != expect || !stageGone)
          println(s"MISMATCH step=$step crashed=$crashed stageGone=$stageGone " +
            s"missing=${expect -- got} extra=${got -- expect}")
        got == expect && stageGone
      }
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(3)
      .withInitialSeed(Seed(20260812L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
