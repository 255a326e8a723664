package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeExprs
import graft.operators.AsOfJoin

/** Property-style checks (SURVEY §5.3) over seeded random inputs:
  * epoch-normalization invariants, partition round-trip identity,
  * drift-union tolerance, and as-of join vs a naive reference. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("property: the four epoch precisions of one instant normalize identically") {
    val seconds = Seq.fill(200)(946684800L + rnd.nextInt(1500000000)) // 2000..2047
    val df = seconds.toDF("s").select(
      TimeExprs.normalizeEpoch(col("s")).as("a"),
      TimeExprs.normalizeEpoch(col("s") * 1000L).as("b"),
      TimeExprs.normalizeEpoch(col("s") * 1000000L).as("c"),
      TimeExprs.normalizeEpoch(col("s") * 1000000000L).as("d"))
    assert(df.where(col("a") =!= col("b") || col("a") =!= col("c") || col("a") =!= col("d"))
      .count() == 0)
  }

  test("property: partitioned write → read is identity on content") {
    val rows = Seq.fill(300)((rnd.nextLong().abs % 1000000, rnd.nextInt(5),
      rnd.nextDouble() * 100, rnd.nextInt(3).toString))
    val df = rows.toDF("id", "part", "v", "tag")
    val path = tmpDir("roundtrip")
    df.write.partitionBy("part", "tag").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() == 300)
    // content identity: anti-joins empty in both directions
    val key = Seq("id", "part", "v", "tag")
    assert(df.join(back, key, "left_anti").count() == 0)
    assert(back.join(df, key, "left_anti").count() == 0)
  }

  test("property: unionByName tolerates arbitrary column subsets") {
    val cols = Seq("a", "b", "c", "d")
    val full = spark.range(50).select(col("id") +: cols.map(c => col("id").cast("double").as(c)): _*)
    (1 to 10).foreach { _ =>
      val keep = cols.filter(_ => rnd.nextBoolean())
      val sub = full.select((Seq("id") ++ keep).map(col): _*)
      val u = sub.unionByName(full, allowMissingColumns = true)
      assert(u.columns.toSet == full.columns.toSet)
      assert(u.count() == 100)
      val dropped = cols.diff(keep)
      dropped.headOption.foreach { d =>
        assert(u.where(col(d).isNull).count() == 50)
      }
    }
  }

  test("property: as-of join matches a naive per-row lookup") {
    val left = Seq.fill(120)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
    val right = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .groupBy(r => (r._1, r._2)).map(_._2.head) // unique per (key, time)
      .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }.toSeq

    val l = left.toDF("lid", "k", "t", "lv")
    val r = right.toDF("rid", "k", "t", "rv")
    val got = AsOfJoin.asof(l, r, "k", "t", Seq("rid"))
      .select("lid", "r_rid").as[(Long, Option[Long])].collect().toMap

    left.foreach { case (lid, k, t, _) =>
      val expect = right.filter(x => x._2 == k && x._3 <= t)
        .sortBy(x => (x._3, x._1)).lastOption.map(_._1)
      assert(got(lid) == expect, s"left $lid key $k t $t")
    }
  }

  test("property: PageRank conserves mass, floors at teleport, and ignores partitioning") {
    val pairs = Seq.fill(300)((rnd.nextInt(100).toLong, rnd.nextInt(30).toLong)).distinct
    val df = pairs.toDF("l_orderkey", "l_partkey")
    val a = operators.GraphQueries.pageRankOn(df)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.core.Caches.releaseAll()
    val b = operators.GraphQueries.pageRankOn(df.repartition(7))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.core.Caches.releaseAll()
    val n = a.size
    assert(math.abs(a.values.sum - 1.0) < 1e-7, s"mass leaked: ${a.values.sum}")
    assert(a.values.forall(_ >= 0.15 / n - 1e-9), "every node keeps the teleport share")
    assert(a == b, "the DECIMAL contribution sum must make ranks partition-independent")
  }

  test("property: Markov transition probabilities sum to 1 per from-state; pair count is rows minus users") {
    val rows = (1 to 400).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-${1 + rnd.nextInt(28)}%02d 0${rnd.nextInt(10)}:00:00"),
        rnd.nextInt(25).toLong, Seq("a", "b", "c", "d")(rnd.nextInt(4)))
    }
    val got = operators.SessionQueries.transitionsOn(
      rows.toDF("event_id", "ts", "user_id", "event_type")).collect()
    val users = rows.map(_._3).distinct.size
    assert(got.map(_.getLong(2)).sum == 400L - users,
      "every event after a user's first contributes exactly one transition")
    got.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val sp = rs.map(_.getDouble(3)).sum
      assert(math.abs(sp - 1.0) < rs.length * 5e-7 + 1e-9,
        s"from=$from probabilities sum to $sp")
    }
  }

  test("property: PSI is non-negative on arbitrary feeds (each term's factors share a sign)") {
    val rows = (1 to 500).map { i =>
      (Seq("x", "y", "z")(rnd.nextInt(3)),
        java.sql.Timestamp.valueOf(f"2026-02-${1 + rnd.nextInt(28)}%02d 06:00:00"),
        rnd.nextDouble() * 1200.0 - 100.0)
    }
    val psis = operators.AuditQueries.psiDriftOn(rows.toDF("event_type", "ts", "value"))
      .collect().map(_.getDouble(3))
    graft.core.Caches.releaseAll()
    assert(psis.nonEmpty && psis.forall(_ >= 0.0), psis.mkString(","))
  }

  test("property: lerp equals the observation at observed days and stays inside the bracket between them") {
    val rows = (1 to 120).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-${1 + rnd.nextInt(28)}%02d 12:00:00"),
        rnd.nextInt(6).toLong, "purchase", rnd.nextDouble() * 50.0)
    }
    val got = operators.TemporalQueries.lerpOn(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // at observations: lerp == round(obs, 6)
    got.filter(_._3.isDefined).foreach { t =>
      val want = BigDecimal(t._3.get).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(t._4.contains(want), s"series ${t._1} day ${t._2}: ${t._4} != $want")
    }
    // between observations: value within [min, max] of the series' observed range
    val bySeries = got.groupBy(_._1)
    bySeries.foreach { case (s, rs) =>
      val obs = rs.flatMap(_._3)
      if (obs.nonEmpty) {
        val (lo, hi) = (obs.min - 1e-6, obs.max + 1e-6)
        rs.flatMap(_._4).foreach(v =>
          assert(v >= lo && v <= hi, s"series $s interpolant $v outside [$lo, $hi]"))
      }
    }
  }

  test("property: rendezvous shards stay in range and every K→K−1 reshard moves ONLY shard K−1's keys") {
    import graft.operators.LayoutQueries
    val ids = Seq.fill(400)(rnd.nextLong()).distinct.toDF("doc_id")
    (2 to 9).foreach { k =>
      val df = ids.select(col("doc_id"),
        LayoutQueries.hrwShard(col("doc_id"), k).as("sk"),
        LayoutQueries.hrwShard(col("doc_id"), k - 1).as("sk1"))
      assert(df.where(col("sk") < 0 || col("sk") >= k).count() == 0,
        s"K=$k assignment out of range")
      assert(df.where(col("sk1") < 0 || col("sk1") >= k - 1).count() == 0)
      assert(df.where(col("sk") =!= (k - 1) && col("sk") =!= col("sk1")).count() == 0,
        s"K=$k→${k - 1}: a surviving-shard key moved")
    }
  }

  test("property: kappa is bounded by p_o's distance from 1 and equals 1 only at perfect agreement") {
    import graft.operators.AuditQueries
    (1 to 8).foreach { _ =>
      val rows = Seq.fill(120)((s"c${rnd.nextInt(3)}", s"c${rnd.nextInt(3)}"))
      val r = AuditQueries.kappaOf(rows.toDF("pred", "truth")).collect().head
      graft.core.Caches.releaseAll()
      val (po, pe) = (r.getDouble(1), r.getDouble(2))
      if (!r.isNullAt(3)) {
        val k = r.getDouble(3)
        assert(k <= 1.0 + 1e-9, s"kappa > 1: $k")
        // κ = (po−pe)/(1−pe) ≤ po when pe ≥ 0; and κ = 1 iff po = 1
        assert(k <= po + 1e-9, s"kappa $k above p_o $po")
        assert((k >= 1.0 - 1e-9) == (po >= 1.0 - 1e-9), s"κ=1 iff perfect: $k $po $pe")
      }
    }
  }

  test("property: the MinHash estimate of identical sets is exactly 1, of disjoint sets near 0") {
    import graft.operators.DedupQueries
    // Identical docs → J=1 pairs → est must be exactly 1 (same shingle
    // sets → same signatures). Build a corpus of duplicated random docs.
    val words = (0 until 40).map(i => s"w$i")
    val texts = Seq.fill(6)(Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" "))
    val docRel = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 2L, t), (i * 2L + 1L, t)) // exact twin for every doc
    }.map { case (id, t) => (id, t, "x") }.toDF("doc_id", "text", "source")
    val est = DedupQueries.q141MinhashEstOn(docRel).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    graft.core.Caches.releaseAll()
    val twins = est.filter { case (a, b, _, _) => a / 2 == b / 2 }
    assert(twins.nonEmpty)
    twins.foreach { case (_, _, j, e) =>
      assert(j == 1.0 && e == 1.0, s"twin pair must score J=est=1: $j $e")
    }
  }
}
