package graft

/** Run independent per-table/per-root storage tasks concurrently from the
  * driver — guide §2.6 (overlap independent jobs): Spark happily runs
  * several jobs at once inside one application; sequential driver code is
  * the only reason a three-table rewrite leaves 2/3 of the cores idle
  * during each table's straggler tail. Strictly for tasks over DISJOINT
  * state (different BaseDelta tables, different snapshot roots): each
  * task keeps its own commit protocol, so parallelism changes wall-clock,
  * never outcomes.
  *
  * Results return in input order. All tasks are allowed to settle before
  * the first failure is rethrown (unwrapped, so typed conflicts like
  * CommitConflictException keep their type) — no half-running task
  * outlives the call.
  */
private[graft] object Par {

  /** Some call sites run inside Spark's analyzer with the
    * SessionCatalog MONITOR HELD — the TVF surface executes its
    * side-effecting builders during function resolution, which is
    * synchronized. A pool thread analyzing any plan needs that same
    * lock → deadlock (caught live: q267's erase_subjects). Builders
    * wrap themselves in [[sequentialInThisThread]]; [[run]] then
    * degrades to in-order execution on the calling thread.
    */
  private val seqOnly = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def sequentialInThisThread[A](body: => A): A = {
    val prev = seqOnly.get()
    seqOnly.set(java.lang.Boolean.TRUE)
    try body finally seqOnly.set(prev)
  }

  /** Session-conf WIDTH PINS (the CC/BPE loop shuffles) are
    * session-global: two concurrent loops interleaving save/restore can
    * strand the session at loop width and slow every other in-flight
    * worker's plans (caught live: the cluster fold-vs-erase chaos storm,
    * where both sides run resolveClusters). Single holder — losers run
    * at the current session width, which is correct, just un-pinned.
    */
  private val confPin = new java.util.concurrent.Semaphore(1)
  def tryConfPin(): Boolean = confPin.tryAcquire()
  def releaseConfPin(): Unit = confPin.release()

  def run[A](tasks: Seq[() => A], maxThreads: Int = 4): Seq[A] = {
    if (seqOnly.get() || tasks.sizeIs <= 1) return tasks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxThreads, tasks.size))
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      val settled = futs.map(f => scala.util.Try(f.get()))
      settled.foreach {
        case scala.util.Failure(e: java.util.concurrent.ExecutionException) =>
          throw e.getCause
        case scala.util.Failure(e) => throw e
        case _ => ()
      }
      settled.map(_.get)
    } finally { pool.shutdown(); () }
  }
}
