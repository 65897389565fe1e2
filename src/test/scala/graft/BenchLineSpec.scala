package graft

import org.scalatest.funsuite.AnyFunSuite

/** The official stdout bench line must survive the driver's bounded
  * stdout-tail capture: r20's full line (~8 KB of per-rep arrays) was
  * truncated there, which cost r21 its entire per-query
  * round-over-round comparison (r21 verdict item 2). The compact line
  * carries minima + flags + errors + host only; the full-precision
  * per-rep record lives in the stable file.
  */
class BenchLineSpec extends AnyFunSuite {

  private val host =
    """{"touch_mb_s_before":51870,"touch_mb_s_after":60911,"steal_pct":10.1,"steal_pct_start":0.0,"quiet_wait_ms":0}"""

  test("official line stays under 4 KB for the full query set at worst-case digits") {
    // the driver benches exactly SparkEntry.queries; every value is
    // forced to the widest sub-10s rendering ("9.999" — nothing for
    // the zero-stripper to remove), so this is the deterministic
    // worst case of the present contract. A future round that adds
    // enough queries to overflow the window fails HERE, not in the
    // driver's tail capture.
    val real = SparkEntry.queries.keys.toSeq.sorted
    val times = real.map(n => n -> 9.999)
    val line = Bench.officialLine(9999.999, times, Nil, Nil, host,
      "/root/testdata/sf0.1")
    assert(line.length < 4096,
      s"official bench line is ${line.length} bytes — a tail capture may truncate it")
    assert(!line.contains("\n"), "official line must be ONE line")
    assert(line.contains("\"metric\":\"total\"") && line.contains("\"value\":")
      && line.contains("\"unit\":\"sec\"") && line.contains("\"queries\":{")
      && line.contains("\"sf\":\"/root/testdata/sf0.1\""))
    // the adjudication keys are ALWAYS present (a driver-side parser
    // may index them unconditionally), empty or not
    assert(line.contains(""""over_2x_pins":{}""") &&
      line.contains(""""errors":{}"""))
    val flagged = Bench.officialLine(1.0, times.take(3),
      Seq("q_a" -> 2.5), Seq("q_b" -> "boom"), host, "sf")
    assert(flagged.contains(""""over_2x_pins":{"q_a":2.5}""") &&
      flagged.contains(""""errors":{"q_b":"boom"}"""))
  }

  test("number format: 1 ms precision, trailing zeros stripped, JSON-legal") {
    assert(Bench.num3(0.39) == "0.39")
    assert(Bench.num3(0.3904999) == "0.39")
    assert(Bench.num3(1.0) == "1")
    assert(Bench.num3(0.0004) == "0")
    assert(Bench.num3(130.73559601499997) == "130.736")
  }
}
