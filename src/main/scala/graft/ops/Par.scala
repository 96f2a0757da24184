package graft.ops

/** The ONE copy of the bounded-pool fan-out the concurrent write paths
  * share (ingest phases, fact sidecars, part-artifact resolution) — so
  * the failure semantics live in one place:
  *
  *  - every task is AWAITED before run() returns, success or failure.
  *    Failing fast on the first error (a bare `Await.result` on
  *    `Future.traverse`) would return while sibling tasks are still
  *    mid-write on pool threads; a caller that catches and replays
  *    would then race the failed attempt's stragglers into the same
  *    table directories. The crash-recovery protocols model process
  *    DEATH (no straggler survives), not a half-abandoned thread pool.
  *  - after all tasks settle, the FIRST failure (by item order) is
  *    rethrown, so callers keep sequential-like error behavior;
  *  - results preserve item order.
  */
object Par {

  def run[A, B](items: Seq[A], maxThreads: Int)(f: A => B): Seq[B] = {
    require(items.nonEmpty, "Par.run over an empty item list")
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(math.max(maxThreads, 1), items.size))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = items.map(a => scala.concurrent.Future(scala.util.Try(f(a))))
      val settled = futs.map(fut => scala.concurrent.Await.result(
        fut, scala.concurrent.duration.Duration.Inf))
      settled.collectFirst { case scala.util.Failure(e) => throw e }
      settled.map(_.get)
    } finally pool.shutdown()
  }
}
