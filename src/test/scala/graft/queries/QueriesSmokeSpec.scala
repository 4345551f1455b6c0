package graft.queries

import graft.SparkTestBase

/** Regression net: every SparkEntry query runs at sf0.001 without
  * exception (value correctness is the driver's DuckDB gate; this
  * keeps `sbt test` honest about the full query surface).
  */
class QueriesSmokeSpec extends SparkTestBase {

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf())
      assert(df.count() >= 0)
    }
  }

  test("entry flagship returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or is a documented rows-only op") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
  }
}
