package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver stores only the LAST ~2000 chars of bench stdout and parses
  * a JSON line out of it — a line that overflows is silently truncated at
  * the HEAD and the round records no bench numbers (this happened in
  * rounds 1-3). These tests pin the fits-the-tail invariant under
  * adversarial inputs so query growth can never reintroduce it.
  */
class BenchLineSpec extends AnyFunSuite {

  // 2000-char tail minus the sbt success trailer minus the FIVE stream_*
  // metric lines (~170 chars each incl. the [info] prefix, ~850 total)
  // that print before the compact line
  private val maxLine = 1080

  test("compact line fits the tail for today's query set") {
    val results = SparkEntry.queries.keys.toSeq.map(k => k -> 1.234)
    val line = Bench.compactLine(results, "/root/testdata/sf0.1")
    assert(line.length <= maxLine, s"line is ${line.length} chars")
  }

  test("compact line fits for 500 long-named slow queries and stays valid JSON-ish") {
    val results = (1 to 500).map(i =>
      s"extremely_long_query_name_that_pads_the_line_$i" -> (i * 37.5))
    val line = Bench.compactLine(results, "/root/testdata/sf0.1")
    assert(line.length <= maxLine, s"line is ${line.length} chars")
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"nq\":500"))
    // the most expensive query must always be visible
    assert(line.contains("extremely_long_query_name_that_pads_the_line_500"))
  }

  test("stream lines are short and carry rows/sec") {
    val l = Bench.streamLine("stream_dedup", "dropDuplicatesWithinWatermark",
      4.567, 123456L, "/root/testdata/sf0.1")
    assert(l.length <= 170, s"stream line is ${l.length} chars")
    assert(l.contains("\"rows\":123456") && l.contains("\"rows_per_sec\":27032"))
    // zero-duration guard (SPARK_GRAFT_ONLY skip path) must not divide by 0
    assert(Bench.streamLine("stream_total", "q", 0.0, 10L, "sf")
      .contains("\"rows_per_sec\":0"))
  }

  test("host_band rides the compact line without breaking the tail budget") {
    val hb = ""","host_band":{"control":"q1_pricing_summary","head_sec":1.23,"mid_sec":2.34,"tail_sec":4.56,"ratio":3.71}"""
    // worst case: full query set AND the band object on the same line
    val results = SparkEntry.queries.keys.toSeq.map(k => k -> 1.234)
    val line = Bench.compactLine(results, "/root/testdata/sf0.1", 5.0, hb)
    assert(line.length <= maxLine, s"line is ${line.length} chars")
    assert(line.contains("\"host_band\":{\"control\":\"q1_pricing_summary\""))
    assert(line.contains("\"ratio\":3.71"))
    // band must sit OUTSIDE the queries object (a driver jq picks it at
    // the top level), and the line must stay one JSON object
    assert(line.indexOf("\"host_band\"") < line.indexOf("\"queries\""))
    // empty band (SPARK_GRAFT_ONLY path) leaves the line untouched
    assert(!Bench.compactLine(results, "sf").contains("host_band"))
    // the control query exists in the real query surface
    assert(SparkEntry.queries.contains(Bench.ControlQuery))
  }

  test("total and other account for every query (nothing silently dropped)") {
    val results = (1 to 300).map(i => s"q$i" -> 1.0)
    val line = Bench.compactLine(results, "sf")
    val total = "\"value\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(total - 300.0) < 0.01)
  }
}
