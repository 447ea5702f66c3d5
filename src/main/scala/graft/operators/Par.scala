package graft.operators

/** Overlap INDEPENDENT Spark actions from driver threads (guide §2.6:
  * the scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially). Used where a query composes several
  * independent eager pipelines — the two member-index builds of a
  * collection commit, K shard builds feeding a merge, the three table
  * writes of one index commit — so the later pipeline's tasks
  * back-fill executors freed by the earlier one's stragglers instead
  * of waiting for its tail.
  *
  * Scope rules the call sites obey:
  *  - only actions with NO mutual ordering (different index dirs, or
  *    different staged tables of one commit) run together — two
  *    commits against the SAME directory stay sequential (generation
  *    order is the contract);
  *  - inputs shared across branches are materialized (eager
  *    checkpoint) BEFORE the fork, so concurrent branches read blocks
  *    instead of racing to recompute a lazy plan.
  *
  * Failures propagate: the first branch exception is rethrown (the
  * remaining branches are awaited first so no job outlives the call).
  */
object Par {

  /** Run the thunks concurrently, one driver thread each; return
    * results in order. Rethrows the first failure after all branches
    * settle. Degenerates to inline execution for 0/1 thunks. */
  def all[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.size <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      val results = futs.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(Option(e.getCause).getOrElse(e))
          case e: Throwable => Left(e)
        }
      }
      results.collectFirst { case Left(e) => e }.foreach(throw _)
      results.collect { case Right(a) => a }
    } finally pool.shutdown()
  }

  /** Two-branch convenience. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val r = all[Any](Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
