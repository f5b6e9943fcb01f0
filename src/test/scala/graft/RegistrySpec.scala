package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry bookkeeping invariants — no Spark session needed.
  *
  * r6 shipped NOTES.md claiming "179 registry queries" against a 197-entry
  * registry; this suite makes the documented count a compile-and-test-time
  * fact instead of prose that can drift.
  */
class RegistrySpec extends AnyFunSuite {

  test("NOTES.md's current-state query count matches Registry.all") {
    val n = Registry.all.size
    val notes = scala.io.Source.fromFile("NOTES.md", "UTF-8").mkString
    assert(notes.contains(s"Registry: $n queries"),
      s"NOTES.md round-state section must say 'Registry: $n queries' " +
        "(regenerate the count from Registry.all when adding queries)")
  }

  test("every registry query has an oracle (zero rows-only entries)") {
    val missing = Registry.all.collect { case (k, q) if q.oracle.isEmpty => k }
    assert(missing.isEmpty,
      s"queries without oracle SQL (driver grades them rows-only): $missing")
  }

  test("SparkEntry exposes exactly the registry (names and oracles aligned)") {
    assert(SparkEntry.queries.keySet == Registry.all.keySet)
    assert(SparkEntry.oracleSql.keySet ==
      Registry.all.filter(_._2.oracle.nonEmpty).keySet)
  }
}
