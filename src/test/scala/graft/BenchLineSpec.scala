package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract of the driver-facing bench line (no SparkSession needed). */
class BenchLineSpec extends AnyFunSuite with Matchers {

  private def parse(line: String): Map[String, Any] = {
    // minimal structural checks without a JSON lib: balanced, key presence
    line should startWith("{\"metric\":\"total\"")
    line should endWith("}")
    Map.empty
  }

  test("failed queries are absent from the map and excluded from the total") {
    val ok = Seq("q_a" -> 1.5, "q_b" -> 0.25)
    val line = Bench.renderLine(ok, Seq("q_broken"), "sf0.1")
    parse(line)
    line should include(""""value":1.75""") // q_broken contributes nothing
    line should include(""""q_a":1.50""")
    line should include(""""failed":["q_broken"]""")
    (line should not).include("q_broken\":")
  }

  test("no failures renders an empty failed array") {
    val line = Bench.renderLine(Seq("q_a" -> 1.0), Nil, "sf0.01")
    line should include(""""failed":[]""")
    line should include(""""sf":"sf0.01"""")
  }

  test("canary seconds ride the line when measured, and are absent when not") {
    val line = Bench.renderLine(Seq("q_a" -> 1.0), Nil, "sf0.1", canarySec = 2.345)
    line should include(""""canary":2.345""")
    val bare = Bench.renderLine(Seq("q_a" -> 1.0), Nil, "sf0.1")
    (bare should not).include("canary")
    // the r12+ dual anchor: the string/expansion-class canary rides
    // beside the hash/shuffle one, each independently optional
    val dual = Bench.renderLine(Seq("q_a" -> 1.0), Nil, "sf0.1",
      canarySec = 2.345, canaryStrSec = 0.912)
    dual should include(""""canary":2.345""")
    dual should include(""""canary_str":0.912""")
    (line should not).include("canary_str")
  }

  test("line stays under 1900 chars via the precision/truncation ladder") {
    // 120 queries at 2 decimals would blow the budget; the ladder must
    // degrade precision and finally truncate to the slowest queries
    val many = (1 to 120).map(i => f"q_some_long_query_name_$i%03d" -> (i * 0.017))
    val line = Bench.renderLine(many, Nil, "sf0.1")
    line.length should be <= 1900
    // when truncation engages it must say so and keep the slowest query
    if (line.contains("qtrunc")) {
      line should include("q_some_long_query_name_120")
      (line should not).include("q_some_long_query_name_001\":")
    }
  }

  test("truncation keeps slowest queries but reports the full total") {
    val many = (1 to 200).map(i => f"q_quite_long_query_name_number_$i%03d" -> 0.5)
    val line = Bench.renderLine(many, Nil, "sf0.1")
    line.length should be <= 1900
    line should include(""""value":100.00""") // total over ALL 200, not the kept 40
    line should include(""""qtrunc":""")
  }
}
