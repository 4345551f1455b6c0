package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BinPackSpec extends AnyFunSuite {

  test("groupChunks: greedy, order-preserving, singletons allowed") {
    val items = Seq("aaaa", "bb", "ccc", "dddddd", "e")
    val groups = BinPack.groupChunks(items, 6)(PyText.utf8Len)
    assert(groups == Vector(Vector("aaaa", "bb"), Vector("ccc"),
      Vector("dddddd"), Vector("e")))
  }

  test("groupChunks: oversized FIRST item emits leading empty group (mapreduce.py:70-76)") {
    val groups = BinPack.groupChunks(Seq("0123456789", "ab"), 5)(PyText.utf8Len)
    assert(groups == Vector(Vector(), Vector("0123456789"), Vector("ab")))
  }

  test("groupStrings: forces ≥2 per group for convergence (mapreduce.py:287-326)") {
    val groups = BinPack.groupStrings(
      Seq("0123456789", "abcdefghij", "x"), 5)(PyText.utf8Len)
    assert(groups == Vector(Vector("0123456789", "abcdefghij"), Vector("x")))
  }

  test("order preserved; chunk groups never exceed budget unless singleton") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val ls = List.fill(rnd.nextInt(40))(1L + rnd.nextInt(50))
      val budget = 1L + rnd.nextInt(120)
      val groups = BinPack.groupChunks(ls, budget)(identity)
      assert(groups.flatten == ls.toVector)
      groups.foreach(g => assert(g.sum <= budget || g.length == 1))
      val sGroups = BinPack.groupStrings(ls, budget)(identity)
      assert(sGroups.flatten == ls.toVector)
      sGroups.foreach(g => assert(g.nonEmpty))
    }
  }

  test("groupIds matches both pack variants") {
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 300) {
      val ls = List.fill(rnd.nextInt(40))(1L + rnd.nextInt(50))
      val budget = 1L + rnd.nextInt(120)
      for (minPer <- Seq(0, 2)) {
        val ids = BinPack.groupIds(ls, budget, minPer)
        val groups =
          if (minPer == 0) BinPack.groupChunks(ls, budget)(identity)
          else BinPack.groupStrings(ls, budget)(identity)
        val byId = ls.zip(ids).groupBy(_._2).toSeq.sortBy(_._1)
          .map(_._2.map(_._1).toVector)
        assert(byId == groups.filter(_.nonEmpty))
      }
    }
  }

  test("pyRepr matches Python repr on representative strings") {
    assert(PyText.pyRepr("abc") == "'abc'")
    assert(PyText.pyRepr("it's") == "\"it's\"")
    assert(PyText.pyRepr("both ' and \"") == "'both \\' and \"'")
    assert(PyText.pyRepr("a\nb\tc") == "'a\\nb\\tc'")
    assert(PyText.pyRepr("summarize the provided contents.") ==
      "'summarize the provided contents.'")
  }

  test("everyNth matches Python s[::n]") {
    assert(PyText.everyNth("abcdefg", 2) == "aceg")
    assert(PyText.everyNth("abcdefg", 3) == "adg")
    assert(PyText.everyNth("", 2) == "")
  }

  test("pyFormat handles {} and {0} placeholders") {
    assert(PyText.pyFormat("Here is {} (lines {}-{}):", "f", 1, 2) ==
      "Here is f (lines 1-2):")
    assert(PyText.pyFormat("{0} and {0}", "x") == "x and x")
    assert(PyText.pyFormat("{{literal}}") == "{literal}")
  }
}
