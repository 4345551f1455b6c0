package graft.core

/** Run independent DRIVER-SIDE actions concurrently — the
  * [[graft.pipeline.Hybrid]] bothSides discipline as a shared core
  * helper, for query compositions whose phases are independent jobs
  * over disjoint layouts (the shard-parallel build topology the
  * *_merged / *_segments rows model: "index each corpus shard in
  * parallel, then merge"). Spark's scheduler fills idle cores across
  * concurrently-submitted jobs, so k independent builds cost
  * ~max(build) wall instead of sum(build).
  *
  * ALL actions are awaited before any failure propagates (rethrowing
  * on the first would abandon a still-running sibling whose unmarked
  * write could then race its own retry — the Hybrid.bothSides
  * argument); with every side settled, the post-failure state is one
  * the sequential form could also leave. Callers must pass actions
  * that are independent: disjoint output paths, no session-conf
  * mutation (the conf is session-global — probe wrappers that raise
  * pushdown thresholds stay sequential).
  */
object Par {

  def all(actions: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.Try
    val settled = actions.map(a => Future(Try(a())))
      .map(Await.result(_, Duration.Inf))
    settled.foreach(_.get)
  }

  /** [[all]] for two actions whose RESULTS the caller needs (e.g. a
    * pair of buildWithPairs calls returning pinned pair frames). Same
    * await-all-then-rethrow settlement.
    */
  def both[A, B](a: () => A, b: () => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.Try
    val fa = Future(Try(a()))
    val fb = Future(Try(b()))
    val ra = Await.result(fa, Duration.Inf)
    val rb = Await.result(fb, Duration.Inf)
    (ra.get, rb.get)
  }
}
