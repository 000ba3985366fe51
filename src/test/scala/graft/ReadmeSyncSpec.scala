package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the README's end-of-round state block against drift from the
  * real catalog (the round-13 verdict found it claiming 236 queries and
  * a green gate while the binding artifacts said 239 and rc=3).
  *
  * Contract: the LAST "catalog N queries" claim in README.md — the
  * current-state line; earlier matches are historical round notes and
  * stay frozen — must equal `SparkEntry.queries.size`. Growing the
  * catalog without updating the front page now fails `sbt test`.
  */
class ReadmeSyncSpec extends AnyFunSuite {

  test("README's latest catalog-count claim equals SparkEntry.queries.size") {
    val readme = java.nio.file.Files.readString(
      java.nio.file.Paths.get("README.md"))
    val claims = "catalog (\\d+) queries".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(claims.nonEmpty,
      "README.md no longer contains a 'catalog N queries' state line — " +
        "keep one so the front page states the real catalog size")
    assert(claims.last == SparkEntry.queries.size,
      s"README.md's latest state block claims 'catalog ${claims.last} " +
        s"queries' but SparkEntry.queries has ${SparkEntry.queries.size} — " +
        "update the end-of-round state line")
  }

  test("every query has an oracle or is a documented rows-only check") {
    // oracleSql ⊆ queries: an oracle for a query that doesn't exist is
    // dead weight the driver would trip over.
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }
}
