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

  test("approx_count_distinct is within its error bound of the exact count") {
    val approx = Queries.all("q_approx_distinct")(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Queries.all("q_distinct")(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx=$a exact=$e")
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
