package graft.core

/** Build-once keyed fixtures (per-corpus caches, accuracy gates)
  * WITHOUT running the build under a `ConcurrentHashMap` bin lock.
  *
  * `computeIfAbsent` holds the map's bin lock for the whole compute —
  * a build that runs Spark jobs (or any re-entrant work) inside it can
  * stall every other key hashing to the bin, and a re-entrant probe of
  * the same map deadlocks. The claim-future shape instead CLAIMS the
  * key with `putIfAbsent(CompletableFuture)` and runs the work outside
  * any lock; rivals wait on the claimed future and see its result or
  * exception. A failed build removes its claim so the next caller
  * retries instead of caching the failure (the r15 gate-lock lesson,
  * hoisted r17 from AggOps.gateOnce so every per-corpus fixture cache
  * shares one audited implementation).
  */
object Once {
  type Futures[V] = java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[V]]

  def futures[V](): Futures[V] =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.CompletableFuture[V]]()

  /** Keys this THREAD is currently building — a re-entrant build of
    * the same key would otherwise `join()` the thread's own incomplete
    * future and hang forever with no diagnostic (strictly worse than
    * `computeIfAbsent`'s loud "Recursive update"); detect and throw. */
  private val building = new ThreadLocal[scala.collection.mutable.Set[(Int, String)]] {
    override def initialValue() = scala.collection.mutable.Set.empty[(Int, String)]
  }

  /** Run `work` at most once per `key` (retrying after a failure),
    * returning the built value to the builder and every waiter. */
  def build[V](map: Futures[V], key: String)(work: => V): V = {
    val claim = (System.identityHashCode(map), key)
    if (building.get.contains(claim))
      throw new IllegalStateException(
        s"Once.build: re-entrant build of '$key' — the work function " +
          "(transitively) requested its own fixture")
    val fut = new java.util.concurrent.CompletableFuture[V]()
    val prior = map.putIfAbsent(key, fut)
    if (prior == null) {
      building.get += claim
      try { val v = work; fut.complete(v); v }
      catch {
        case t: Throwable =>
          fut.completeExceptionally(t); map.remove(key, fut); throw t
      } finally building.get -= claim
    } else prior.join()
  }

  /** Effect-only variant: gate `work` to one successful run per key. */
  def gate(map: Futures[java.lang.Boolean], key: String)(work: => Unit): Unit = {
    build(map, key) { work; java.lang.Boolean.TRUE }
    (): Unit
  }
}
