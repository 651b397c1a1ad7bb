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
  *  - a thunk failure propagates only after EVERY thunk has settled —
  *    no thunk outlives the call, so the caller's idempotent re-run
  *    recovery can never race a still-in-flight orphan writer on the
  *    same table (a `Future.sequence` here would be fail-fast and
  *    violate exactly that). The first failure, in argument order, is
  *    rethrown; later failures are attached as suppressed. */
object Par {
  import scala.concurrent.{Await, Future}
  import scala.concurrent.ExecutionContext.Implicits.global
  import scala.util.{Failure, Try}

  /** Two independent RESULT-BEARING builds as concurrent Spark jobs —
    * the value-returning sibling of [[runAll]] for builders whose
    * eager-materializing halves (pinned model fits) would otherwise
    * serialize at DataFrame-construction time. Same contract: both
    * thunks settle before any failure propagates; the first failure (in
    * argument order) is rethrown with the other attached as
    * suppressed. */
  def run2[A, B](fa: () => A, fb: () => B): (A, B) = {
    val fut = Future(fb())
    val ra = Try(fa())
    val rb = Try(Await.result(fut, scala.concurrent.duration.Duration.Inf))
    (ra, rb) match {
      case (scala.util.Success(a), scala.util.Success(b)) => (a, b)
      case _ =>
        val failures = Seq(ra, rb).collect { case Failure(e) => e }
        val first = failures.head
        failures.drop(1).foreach { e => if (e ne first) first.addSuppressed(e) }
        throw first
    }
  }

  def runAll(thunks: (() => Unit)*): Unit = {
    val settled: Seq[Try[Unit]] = Await.result(
      Future.traverse(thunks)(t => Future(t()).transform(scala.util.Success(_))),
      scala.concurrent.duration.Duration.Inf)
    val failures = settled.collect { case Failure(e) => e }
    failures.headOption.foreach { first =>
      failures.drop(1).foreach { e => if (e ne first) first.addSuppressed(e) }
      throw first
    }
  }
}
