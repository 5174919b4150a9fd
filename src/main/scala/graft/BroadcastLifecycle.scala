package graft

import org.apache.spark.broadcast.Broadcast

/** Broadcast lifecycle registry — the reference-parity `_unpersist` hook
  * (/root/reference/emm/pipeline/spark_entity_matching.py:197,682-690 exposes
  * `unpersist_broadcast` + per-stage `_unpersist` so a long-lived session can
  * release the ground-truth blocks between fits).
  *
  * Every graft operator that ships a packed block to executors
  * (CosSimIndexer's GT index, the Knn packed-vector/IVF/centroid blocks)
  * registers it here at creation. Fitted models expose `release()` for
  * targeted cleanup; [[releaseAll]] drops everything — that is what
  * [[Bench]]'s between-run `clearState` calls, and what a service embedding
  * graft should call between pipeline generations.
  *
  * `destroy` (not `unpersist`) is deliberate: unpersist only evicts executor
  * copies and the driver re-serves them on next use, so a "released" model
  * would silently resurrect its blocks. After release a model is dead —
  * re-fit to get a new one, exactly like the reference after `_unpersist`.
  */
object BroadcastLifecycle {

  import java.lang.ref.WeakReference

  // Weak references keyed by broadcast id: explicit release()/releaseAll()
  // still work while a model is alive, but a model the user simply drops
  // without releasing stays ContextCleaner-eligible — the registry must not
  // re-introduce (in slow motion) the pin-forever leak it exists to fix.
  private val tracked =
    scala.collection.mutable.LinkedHashMap.empty[Long, WeakReference[Broadcast[_]]]

  private def purge(): Unit = tracked.filterInPlace((_, ref) => ref.get != null)

  /** Register a broadcast for lifecycle management; returns it unchanged. */
  private[graft] def track[T](bc: Broadcast[T]): Broadcast[T] = synchronized {
    purge()
    tracked(bc.id) = new WeakReference[Broadcast[_]](bc)
    bc
  }

  /** Destroy one tracked broadcast (no-op if already destroyed). Removal of
    * the storage blocks is asynchronous, like Spark's own `destroy()`.
    */
  def release(bc: Broadcast[_]): Unit = {
    destroyQuietly(bc)
    synchronized { tracked -= bc.id }
  }

  /** Destroy every live tracked broadcast; returns how many were released.
    * Entries whose broadcast was already GC-collected are dropped silently —
    * Spark's ContextCleaner owns their cleanup.
    */
  def releaseAll(): Int = synchronized {
    purge()
    val n = tracked.size
    tracked.valuesIterator.foreach { ref =>
      val bc = ref.get
      if (bc != null) destroyQuietly(bc)
    }
    tracked.clear()
    n
  }

  /** Number of live tracked broadcasts (diagnostics / leak tests). */
  def trackedCount: Int = synchronized { purge(); tracked.size }

  private def destroyQuietly(bc: Broadcast[_]): Unit =
    // double-release and release-after-stop must be safe no-ops
    try bc.destroy() catch { case _: Exception => () }
}
