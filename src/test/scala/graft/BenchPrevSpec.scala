package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.parsePrev against every artifact shape a
  * SPARK_GRAFT_BENCH_PREV file has actually shipped in (r12/r13
  * verdict items: a PREV that parses empty silently degraded the
  * drift set to the hand list twice; main now fails hard on that,
  * and this spec keeps the parser honest against all known shapes). */
class BenchPrevSpec extends AnyFunSuite {

  test("builder compact full map parses") {
    val m = Bench.parsePrev(
      """{"metric":"total","value":12.3,"unit":"sec","queries":{"q1_agg":0.62,"dedup_exact":1.75},"sf":"x"}""")
    assert(m == Map("q1_agg" -> 0.62, "dedup_exact" -> 1.75))
  }

  test("pretty-printed map with ': ' separators parses (the r10 sf1 shape)") {
    val m = Bench.parsePrev(
      """{"queries": {"q1_agg": 0.62, "abc_analysis": 3.4}}""")
    assert(m == Map("q1_agg" -> 0.62, "abc_analysis" -> 3.4))
  }

  test("driver wrapper with escaped tail string parses (the r12 failure shape)") {
    val m = Bench.parsePrev(
      """{"tail":"{\"metric\":\"total\",\"queries\":{\"q1_agg\":0.62,\"zipf_fit\":0.28}}"}""")
    assert(m == Map("q1_agg" -> 0.62, "zipf_fit" -> 0.28))
  }

  test("per-query object shape reads the suite field as the query's time") {
    val m = Bench.parsePrev(
      """{"queries":{"q1_agg":{"suite":0.62,"isolated":0.41}}}""")
    // trailing sub-fields ("isolated") also match the scan — harmless,
    // they never collide with registry names; what matters is the
    // query key carries its SUITE number, not the isolated one
    assert(m("q1_agg") == 0.62)
  }

  test("a file with no queries key parses to empty (main then fails hard)") {
    assert(Bench.parsePrev("""{"metric":"total","value":1.0}""").isEmpty)
    assert(Bench.parsePrev("").isEmpty)
  }

  // r14 verdict item 4: drift auto-isolation is STANDING — when PREV is
  // unset, a full-protocol run discovers the newest builder full map
  // itself instead of degrading to the hand list.
  test("discoverPrev picks the highest-round builder full map, _final wins within a round") {
    val dir = java.nio.file.Files.createTempDirectory("bench_prev")
    def touch(n: String) = java.nio.file.Files.writeString(dir.resolve(n), "{}")
    touch("BENCH_builder_r9_full.json")
    touch("BENCH_builder_r12_full.json")
    touch("BENCH_builder_r12_full_final.json")
    touch("BENCH_builder_r12_sf1.json")     // not a full map — ignored
    touch("BENCH_r13.json")                 // driver wrapper — ignored
    touch("CORRECTNESS_builder_r14.json")   // not a bench map — ignored
    assert(Bench.discoverPrev(dir).map(p => dir.relativize(
      java.nio.file.Paths.get(p)).toString)
      .contains("BENCH_builder_r12_full_final.json"))
  }

  test("discoverPrev returns None when no builder full map exists") {
    val dir = java.nio.file.Files.createTempDirectory("bench_prev_empty")
    assert(Bench.discoverPrev(dir).isEmpty)
  }
}
