package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The await-all-then-rethrow settlement contract of [[Par]] — every
  * action runs to completion (no sibling abandoned mid-write) before
  * the first failure propagates.
  */
class ParSpec extends AnyFunSuite {

  test("all runs every action and rethrows the first failure") {
    val ran = new java.util.concurrent.atomic.AtomicInteger
    val e = intercept[RuntimeException] {
      Par.all(
        () => { Thread.sleep(50); ran.incrementAndGet(); () },
        () => { ran.incrementAndGet(); throw new RuntimeException("boom") },
        () => { Thread.sleep(20); ran.incrementAndGet(); () })
    }
    assert(e.getMessage == "boom")
    // the failing action must NOT have aborted its siblings
    assert(ran.get == 3)
  }

  test("all of disjoint actions completes; both returns both values") {
    var a = 0
    Par.all(() => { a += 1; () })
    assert(a == 1)
    val (x, y) = Par.both(() => { Thread.sleep(30); 7 }, () => "ok")
    assert(x == 7 && y == "ok")
  }

  test("both settles the slow side before rethrowing the fast failure") {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[IllegalStateException] {
      Par.both(
        () => throw new IllegalStateException("fast fail"),
        () => { Thread.sleep(80); done.set(true); 1 })
    }
    assert(done.get, "slow side must have been awaited to completion")
  }
}
