package graft

import org.scalatest.funsuite.AnyFunSuite

/** Committed-pin lint (r12 verdict №1/№6): `tools/bench_baseline.json`
  * must cover (nearly) the whole registered catalog, because
  * `Bench.scala` reads it AT RUN TIME to decide which regressed-looking
  * entries get an isolated 3-sample re-time — an undersized pin
  * silently blinds that machinery for every absent query. Round 12
  * shipped exactly that: a 6-entry SPARK_GRAFT_ONLY isolation output
  * committed as the 313-query "re-pin", which (a) made the next
  * round's benchdiff adjudication impossible and (b) left 17 >×1.3
  * driver-window flags with no machine verdict.
  *
  * The write path is guarded by `tools/repin.py` (refuses shrinking
  * pins, failed runs, self-inconsistent files); this spec is the
  * committed-tree check that a bad file did not get in some other way.
  * Coverage is ≥95% rather than == because the catalog legitimately
  * grows DURING a round (new queries pin on the round-close re-pin);
  * a deliberate 5-entry pin fails loudly at 1.6%.
  */
class BenchPinSpec extends AnyFunSuite {

  private lazy val pin: Map[String, Any] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/bench_baseline.json")), "UTF-8")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(txt) match {
      case JObject(fs) => fs.toMap
      case _           => Map.empty
    }
  }

  private lazy val pinQueries: Set[String] = pin.get("queries") match {
    case Some(org.json4s.JObject(fs)) =>
      fs.map(_._1).filterNot(_.startsWith("stage_")).toSet
    case _ => Set.empty
  }

  test("baseline pin covers >=95% of the registered catalog") {
    val catalog = SparkEntry.queries.keySet
    val covered = catalog.intersect(pinQueries)
    assert(covered.size * 100 >= catalog.size * 95,
      s"pin covers ${covered.size} of ${catalog.size} catalog queries — " +
        "undersized pin (isolation/subset run committed as baseline?); " +
        "re-pin via tools/repin.py from a full quiet window")
  }

  test("every pinned query still exists in the catalog") {
    val catalog = SparkEntry.queries.keySet
    val stale = pinQueries.diff(catalog)
    assert(stale.isEmpty,
      s"pin carries queries absent from the catalog: $stale — stale or " +
        "foreign pin file")
  }

  test("pin is self-consistent and from a clean run") {
    import org.json4s._
    val declared = pin.get("n_queries") match {
      case Some(JInt(v))    => v.toInt
      case Some(JDouble(v)) => v.toInt
      case _                => -1
    }
    assert(declared == pinQueries.size,
      s"pin declares n_queries=$declared but holds ${pinQueries.size} — " +
        "truncated or hand-edited file")
    val failed = pin.get("failed") match {
      case Some(JArray(xs)) => xs.size
      case _                => 0
    }
    assert(failed == 0, "pin records failed queries — a broken run " +
      "cannot be the baseline")
  }
}
