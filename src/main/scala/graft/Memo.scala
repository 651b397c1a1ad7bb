package graft

import scala.collection.concurrent.TrieMap

/** Build-once-per-key memoization over a concurrent map, with a
  * lock-free hit path and PER-KEY build serialization — the shared
  * discipline of the session-scoped artifact caches (Dedup's pair/cluster
  * graphs, Graph's co-purchase pair set).
  *
  * TrieMap.getOrElseUpdate evaluates its by-name default non-atomically,
  * so two concurrent first callers would both run an expensive eager
  * build and the loser's pinned checkpoint blocks would linger until GC.
  * Serializing on the cache map itself (the first fix) closed that but
  * convoyed UNRELATED keys behind one global lock — two different corpora
  * building concurrently is a shape this codebase itself produces
  * (Par.runAll consumers). Here each key gets its own monitor via
  * putIfAbsent (atomic, unlike getOrElseUpdate), so same-key callers
  * serialize and different-key builds run concurrently.
  *
  * clear() vs buildOnce atomicity (round-14 advice): without coordination
  * a clear could run in the middle of a build — the builder's insert
  * would land AFTER cache.clear() (a pre-clear artifact surviving the
  * clear), and two same-key callers straddling locks.clear() could hold
  * DIFFERENT monitors and double-build, stranding one pinned checkpoint
  * until GC — the exact leak this class exists to prevent. Builds
  * therefore hold a shared read lock and clear() takes the write lock:
  * clear waits for in-flight builds to finish and then empties both maps
  * atomically w.r.t. any build; the hit path stays lock-free (a hit
  * concurrent with clear linearizes before it). Different-key builds
  * still run concurrently (the read lock is shared). The guard is scoped
  * PER CACHE (see [[guardFor]]), and clear() from inside the same cache's
  * build closure throws IllegalStateException instead of self-deadlocking
  * (no current caller does; builds are plan/checkpoint constructions).
  */
object Memo {

  private val guards =
    new java.util.IdentityHashMap[AnyRef, java.util.concurrent.locks.ReentrantReadWriteLock]()

  /** The guard is PER CACHE (round-16, advisor): a single global
    * read/write lock made clear() of any cache wait on in-flight builds
    * of ALL caches, and a queued writer then stalled unrelated
    * different-key builds behind the longest running build. Guards live
    * in an identity map keyed by the cache instance (TrieMap equality is
    * structural — two empty caches compare equal — so reference identity
    * is required), one tiny lock per cache for the JVM's lifetime. */
  private def guardFor(cache: AnyRef): java.util.concurrent.locks.ReentrantReadWriteLock =
    guards.synchronized {
      var g = guards.get(cache)
      if (g == null) {
        g = new java.util.concurrent.locks.ReentrantReadWriteLock()
        guards.put(cache, g)
      }
      g
    }

  def buildOnce[K, V](cache: TrieMap[K, V], locks: TrieMap[K, AnyRef], key: K)
                     (build: => V): V = {
    val hit = cache.get(key)
    if (hit.isDefined) return hit.get
    val r = guardFor(cache).readLock()
    r.lock()
    try {
      val fresh = new Object
      val lock = locks.putIfAbsent(key, fresh).getOrElse(fresh)
      // inside the per-key monitor getOrElseUpdate is single-threaded for
      // this key; TrieMap handles concurrent different-key inserts. A
      // FAILED build leaves its (tiny, reusable) monitor in the locks map
      // — deliberate: the next same-key attempt serializes on it. The
      // build is clocked for Bench's query_cache_build_sec disclosure.
      lock.synchronized(cache.getOrElseUpdate(key, CacheBuild.timed(build)))
    } finally r.unlock()
  }

  /** Clear both maps (bench/audit retry hygiene — dropping the lock map
    * is what un-leaks the session-bearing keys). Blocks until in-flight
    * builds OF THIS CACHE complete so no build can straddle the clear;
    * other caches' builds and clears are unaffected. Calling it from
    * inside this cache's own build closure is a read→write upgrade that
    * can never succeed — detected via this thread's read-hold count and
    * thrown as IllegalStateException instead of deadlocking. */
  def clear[K, V](cache: TrieMap[K, V], locks: TrieMap[K, AnyRef]): Unit = {
    val guard = guardFor(cache)
    if (guard.getReadHoldCount > 0)
      throw new IllegalStateException(
        "Memo.clear() called from inside the same cache's build closure — " +
          "a read->write upgrade that can never succeed")
    val w = guard.writeLock()
    w.lock()
    try { cache.clear(); locks.clear() } finally w.unlock()
  }
}
