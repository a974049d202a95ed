package graft

import org.scalatest.funsuite.AnyFunSuite

/** Umbrella: every declared query runs at sf0.001 and the driver contract
  * invariants hold (value-level correctness is the DuckDB oracle's job —
  * tools/compare.py at sf0.01).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.Sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      assert(n >= 0)
    }
  }
}
