package graft.tools

/** Run independent Spark actions concurrently from a bounded pool
  * (guide §2.6 — overlap independent jobs so one action's scheduling
  * gaps and stage tails back-fill with the next action's tasks instead
  * of idling the cluster). Results return in INPUT order, so callers'
  * downstream composition is deterministic regardless of completion
  * order. On the first failure the remaining work is cancelled and the
  * ORIGINAL cause rethrown — not the pool's ExecutionException wrapper
  * — so the error surface matches the sequential form. */
object Par {
  def run[T](maxConcurrent: Int)(thunks: Seq[() => T]): Seq[T] = {
    if (thunks.lengthCompare(1) <= 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxConcurrent, thunks.length))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        })
      }
      try futs.map(_.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          futs.foreach(_.cancel(true))
          throw Option(e.getCause).getOrElse(e)
      }
    } finally { pool.shutdownNow(); () }
  }
}
