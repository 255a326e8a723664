package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-adjudication baseline loader, pinned against the REAL
  * committed round-11 driver wrapper. The r11 defect this guards: the
  * old unit sniff (`contains("\"qunit\":\"cs\"")`) matched neither the
  * wrapper's escaped `tail` (`\"qunit\"`) nor its pretty-printed
  * `parsed` block (`"qunit": "cs"`), so centisecond ints were read as
  * seconds, every baseline inflated 100×, and the `v > 3p` adjudication
  * trigger could never fire — the round's headline contamination
  * defense silently did nothing whenever the latest round had no
  * `_isolated` artifact (r11 had none).
  */
class BenchParseSpec extends AnyFunSuite {

  test("parses the real BENCH_r11 wrapper: cs unit detected, values land in seconds") {
    val f = new java.io.File("BENCH_r11.json")
    assume(f.exists(), "committed round artifact present")
    val src = scala.io.Source.fromFile(f)("UTF-8")
    val text = try src.mkString finally src.close()
    val ref = Bench.parsePrevRef(text)
    assert(ref.nonEmpty)
    // q3 (the flagship window agg) ran in 0.41 s in round 11 — under
    // the broken sniff this read as 41.0 s.
    assert(ref("3") == 0.41, s"q3 -> ${ref.get("3")}")
    // every suite value must be plausible seconds, not cs-as-seconds
    assert(ref.values.forall(v => v < 120.0), "a value parsed 100x too large")
    // keys normalized to the bare short form, no escape residue
    assert(ref.keys.forall(k => !k.contains("\\") && !k.startsWith("q")))
  }

  test("unit sniff is tolerant of all three encodings and both units") {
    val raw = """{"metric":"total","qunit":"cs","queries":{"7":35,"q08":120}}"""
    assert(Bench.parsePrevRef(raw) == Map("7" -> 0.35, "8" -> 1.2))
    val pretty = "{\n  \"qunit\": \"ds\",\n  \"queries\": {\n    \"7\": 4,\n    \"15a\": 12\n  }\n}"
    assert(Bench.parsePrevRef(pretty) == Map("7" -> 0.4, "15a" -> 1.2))
    val escaped = """{"tail":"{\"metric\":\"total\",\"qunit\":\"ds\",\"queries\":{\"7\":4,\"xprt\":541}}"}"""
    assert(Bench.parsePrevRef(escaped) == Map("7" -> 0.4, "xprt" -> 54.1))
    // no qunit (r<=8 artifacts): plain seconds
    val legacy = """{"queries":{"q05_sentinel":0.25}}"""
    assert(Bench.parsePrevRef(legacy) == Map("5" -> 0.25))
  }

  test("adjudication arrays resolve to the quiet (last) value") {
    val line = """{"qunit":"cs","queries":{"111":[482,55],"40":286}}"""
    assert(Bench.parsePrevRef(line) == Map("111" -> 0.55, "40" -> 2.86))
  }

  test("the full parse keeps the adjudicated flag per entry") {
    val line = """{"qunit":"ds","queries":{"107":[284,51],"18":133}}"""
    assert(Bench.parsePrevRefFull(line) ==
      Map("107" -> (5.1, true), "18" -> (13.3, false)))
  }

  test("an adjudicated EXTRA (r18: the x-entries joined the >=2x net) parses like any suite entry") {
    // xvg shipped 8x contended and un-adjudicated in BENCH_r17 because
    // the extras sat outside the net; since r18 they carry the same
    // 2-array form, so the loader must resolve the quiet value and
    // keep the adjudicated flag under the extra's bare short code.
    val line = """{"qunit":"ds","queries":{"xvg":[40,5],"xvd":20,"198":78}}"""
    assert(Bench.parsePrevRefFull(line) ==
      Map("xvg" -> (0.5, true), "xvd" -> (2.0, false), "198" -> (7.8, false)))
  }

  test("baseline floor: un-adjudicated scalars floor at min with the round before; adjudicated quiet values stand") {
    // r16's shape: q107 shipped adjudicated ([contended, quiet] — the
    // quiet 5.1 is the baseline), q18 shipped a contended scalar 13.3
    // that the old loader took verbatim, masking regressions to 2.4x.
    val latest = Map(
      "107" -> (5.1, true),   // adjudicated: trust the quiet value
      "18" -> (13.3, false),  // contended scalar: floor with r15's 5.5
      "42" -> (9.9, false),   // no older entry: stands
      "3" -> (0.4, false))    // improved: min keeps the better value
    val older = Map("18" -> 5.5, "107" -> 90.0, "3" -> 0.6)
    assert(Bench.floorBaseline(latest, older) ==
      Map("107" -> 5.1, "18" -> 5.5, "42" -> 9.9, "3" -> 0.4))
  }
}
