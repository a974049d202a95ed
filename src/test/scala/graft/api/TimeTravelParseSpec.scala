package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Pins `TIMESTAMP AS OF` literal parsing to an explicit UTC frame
  * (r18 — the r17 ADVICE host-zone drift): the same string must resolve
  * to the same epoch instant on ANY host, matching the session zone the
  * build pins (`spark.sql.session.timeZone=UTC`, `-Duser.timezone=UTC`).
  */
class TimeTravelParseSpec extends AnyFunSuite {

  test("parseTsMillis resolves in UTC regardless of the host default zone") {
    // known instants, computed independently of java.sql.Timestamp
    assert(Table.parseTsMillis("1970-01-01 00:00:00") == 0L)
    assert(Table.parseTsMillis("1970-01-02") == 86400000L)
    assert(Table.parseTsMillis("2026-01-01T00:00:00.5") ==
      java.time.Instant.parse("2026-01-01T00:00:00.500Z").toEpochMilli)
    // host-zone independence: the parse must not consult the JVM default
    val prev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/New_York"))
      assert(Table.parseTsMillis("1970-01-01 00:00:00") == 0L,
        "a non-UTC host default zone must not shift the parsed instant")
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("parseTsMillis refuses malformed literals loudly") {
    intercept[IllegalArgumentException](Table.parseTsMillis("not-a-time"))
    intercept[IllegalArgumentException](Table.parseTsMillis("2026-13-40"))
  }
}
