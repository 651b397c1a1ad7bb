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
  */
object Memo {

  def buildOnce[K, V](cache: TrieMap[K, V], locks: TrieMap[K, AnyRef], key: K)
                     (build: => V): V =
    cache.get(key).getOrElse {
      val fresh = new Object
      val lock = locks.putIfAbsent(key, fresh).getOrElse(fresh)
      // inside the per-key monitor getOrElseUpdate is single-threaded for
      // this key; TrieMap handles concurrent different-key inserts
      lock.synchronized(cache.getOrElseUpdate(key, build))
    }

  /** Clear both maps (bench/audit retry hygiene — dropping the lock map
    * is what un-leaks the session-bearing keys). */
  def clear[K, V](cache: TrieMap[K, V], locks: TrieMap[K, AnyRef]): Unit = {
    cache.clear()
    locks.clear()
  }
}
