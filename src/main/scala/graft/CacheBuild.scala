package graft

/** Process-wide artifact-build stopwatch — the disclosure channel behind
  * Bench's `query_cache_build_sec` (round-14 judge task: the
  * `dedup_substring` cold-retry reading re-pays the positional-gram cache
  * build that the warm path amortizes, and the bench record couldn't say
  * so). Every session-scoped artifact construction — Memo.buildOnce
  * closures (pair/cluster graphs), Dedup.persistTracked eager fills
  * (shingle arrays, simhash signatures, positional grams), driver-side
  * model fits (IVF quantizer, PQ codebooks, quality LR) — runs inside
  * [[timed]], and Bench snapshots [[totalSec]] around each query: the
  * per-query delta is the seconds of that query's wall time that were
  * one-time artifact builds a warm deployment (or any later same-session
  * consumer) never re-pays. Disclosure only — query wall times stay
  * INCLUSIVE of build cost; nothing is subtracted.
  *
  * Nested timed sections (a memoized build that fills a tracked cache)
  * must not double-count, so the clock only accumulates at the OUTERMOST
  * frame per thread. Builds on concurrent threads accumulate
  * independently (the counter is a sum of build seconds, not a wall-clock
  * interval — Par.runAll consumers can overlap builds).
  */
object CacheBuild {
  private val nanos = new java.util.concurrent.atomic.AtomicLong(0L)
  private val depth = new ThreadLocal[Integer] { override def initialValue(): Integer = 0 }

  def timed[T](f: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try f
    finally {
      depth.set(d)
      if (d == 0) nanos.addAndGet(System.nanoTime() - t0)
    }
  }

  /** Cumulative build seconds since JVM start — snapshot before/after a
    * query and diff. */
  def totalSec: Double = nanos.get / 1e9
}
