package graft

/** Run independent thunks as CONCURRENT Spark jobs and await them all —
  * the one blessed form of driver-side concurrency in this engine
  * (streaming sink families, index-build/removal fan-out, multi-table
  * appends). Centralized so the execution-context choice and blocking
  * policy live in one place: the global pool is safe here because
  * `Await` registers a `BlockContext` and the fork-join pool grows a
  * compensation thread, so nested `runAll` calls cannot deadlock.
  *
  * Contract notes callers rely on:
  *  - every thunk targets a DISJOINT table/path (concurrency never
  *    reorders writes within one artifact family — keep a family's
  *    append→compact sequence inside ONE thunk);
  *  - a thunk failure propagates after all complete or fail — the
  *    crash state equals some prefix of the sequential form's, and
  *    every caller's documented recovery is an idempotent re-run. */
object Par {
  import scala.concurrent.{Await, Future}
  import scala.concurrent.ExecutionContext.Implicits.global

  def runAll(thunks: (() => Unit)*): Unit = {
    Await.result(
      Future.sequence(thunks.map(t => Future(t()))),
      scala.concurrent.duration.Duration.Inf)
    ()
  }
}
