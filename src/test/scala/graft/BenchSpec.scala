package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Parse gate for the Bench artifact (VERDICT r16 "Next round" #5):
  * BENCH_r15.json recorded rc 0 but `parsed: null` — the one-line JSON
  * the driver grades was lost to a formatting/interleaving failure, and
  * with it the whole per-query round-over-round PERF comparison of an
  * optimization round. The formatter is now a pure function
  * (Bench.render); this suite pins that its output — including
  * adversarial query names, error strings, sfDir values, and the
  * runs=1 field-elision branch — round-trips through a strict JSON
  * parser with the documented schema.
  */
class BenchSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def parse(line: String) = mapper.readTree(line)

  private val sample: Map[String, Bench.QSample] = Map(
    "q_plain" -> (0.5, 0.7, 0.5, 0.2, None),
    // adversarial key/error content: quotes, backslashes, newlines —
    // exactly what would have silently corrupted a hand-built line
    "q_\"quoted\"\\key" ->
      (1.25, 1.25, 1.5, 0.25, Some("Boom: \"msg\" with \\ and \n tail")),
    "q_unicode_π" -> (0.001, 0.002, 0.001, 0.001, None))

  test("render round-trips through a strict JSON parser (runs=2)") {
    val line = Bench.render(sample, runs = 2, sfDir = "/tmp/sf \"x\"\\dir")
    assert(!line.contains("\n"), "artifact must be ONE line")
    val n = parse(line)
    assert(n.get("metric").asText == "total")
    assert(n.get("unit").asText == "sec")
    assert(n.get("runs").asInt == 2)
    assert(n.get("sf").asText == "/tmp/sf \"x\"\\dir")
    // total = sum of graded mins
    assert(math.abs(n.get("value").asDouble - (0.5 + 1.25 + 0.001)) < 1e-9)
    // per-query maps carry every key, exactly
    for (field <- Seq("queries", "first_run", "second_run", "spread")) {
      val m = n.get(field)
      assert(m != null && m.size == sample.size, s"missing/short $field")
      assert(sample.keys.forall(k => m.has(k)), s"key escaping broke $field")
    }
    assert(n.get("queries").get("q_plain").asDouble == 0.5)
    assert(n.get("first_run").get("q_plain").asDouble == 0.7)
    assert(n.get("spread").get("q_\"quoted\"\\key").asDouble == 0.25)
    // errors map carries the failing query only, content intact
    val errs = n.get("errors")
    assert(errs.size == 1)
    assert(errs.get("q_\"quoted\"\\key").asText
      == "Boom: \"msg\" with \\ and \n tail")
  }

  test("runs=1 elides second_run/spread instead of fabricating them") {
    val line = Bench.render(sample, runs = 1, sfDir = "/root/testdata/sf0.1")
    val n = parse(line)
    assert(n.get("second_run") == null && n.get("spread") == null)
    assert(n.get("queries").size == sample.size)
  }

  test("empty result set still renders a parseable artifact") {
    val n = parse(Bench.render(Map.empty, runs = 2, sfDir = "d"))
    assert(n.get("value").asDouble == 0.0)
    assert(n.get("queries").size == 0 && n.get("errors").size == 0)
  }

  test("the bench.json write path round-trips byte-identically") {
    val line = Bench.render(sample, runs = 2, sfDir = "/tmp/x")
    val d = java.nio.file.Paths.get(GraftTmp.dir("bench_spec"))
    java.nio.file.Files.createDirectories(d)
    val p = d.resolve("bench.json")
    java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    val back = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(back == line + "\n")
    assert(parse(back.trim) == parse(line))
  }
}
