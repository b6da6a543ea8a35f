package graft.operators

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Fire INDEPENDENT Spark actions concurrently from one driver thread.
  *
  * A streaming micro-batch's real cost at fixture scale is per-JOB
  * overhead (driver analysis + scheduler round trips + commit protocol),
  * not task time — [[Dedup.admitBatch]]'s three appends (sink, bands,
  * toks) each carry ~0.3-0.6 s of fixed wall serialized back-to-back.
  * Once their shared inputs are materialized (persisted/localCheckpointed
  * frames), the appends touch disjoint output tables and can run as
  * concurrent Spark jobs: the scheduler interleaves their small stages
  * across idle cores and the fixed overheads overlap instead of adding.
  *
  * Crash-replay safety is unchanged by the reordering: every admission
  * read excludes rows carrying the CURRENT batch tag and every sink read
  * collapses duplicates, so a crash after ANY subset of a batch's appends
  * replays to the identical end state (the same argument that let the
  * sequential form choose its order freely — spec-pinned by the replay
  * tests running a batch twice).
  *
  * The pool is small and daemon (job submission threads block on Spark
  * actions; parallelism beyond the per-batch append count buys nothing),
  * and failures propagate: the first failed action rethrows on the
  * calling thread after all submitted actions settle, so a failed write
  * fails the micro-batch exactly as it did sequentially. */
private[graft] object SparkJobs {

  /** Run the given actions as concurrent Spark jobs; block until ALL have
    * settled; rethrow the first failure (if any).
    *
    * The worker threads are created PER CALL, by the calling thread —
    * never pooled across callers: SparkContext's local properties (job
    * group, job description, scheduler pool, streaming run-id tags) live
    * in an `InheritableThreadLocal` that clones parent→child at thread
    * CREATION, so per-call threads inherit exactly the submitting
    * caller's properties. A shared lazy pool inherits whichever caller
    * first forced it and serves every later stream/query under those
    * STALE tags — job-group cancellation (StreamingQuery.stop) can then
    * not reach in-flight appends — and a fixed-size shared pool can
    * deadlock under nested inParallel calls. Per-call threads also make
    * nesting trivially safe (each level owns its own executor). Thread
    * creation costs microseconds against appends that each carry
    * ~0.3-0.6 s of fixed job overhead. */
  def inParallel(work: (() => Unit)*): Unit = {
    if (work.size <= 1) { work.foreach(_.apply()); return }
    val exec = Executors.newFixedThreadPool(work.size, r => {
      val t = new Thread(r, "graft-parallel-append")
      t.setDaemon(true)
      t
    })
    val pool = ExecutionContext.fromExecutorService(exec)
    try {
      val futures = work.map(w => Future(w())(pool))
      // await ALL (not firstFailure): a half-settled batch must not leave
      // appends racing a caller that believes the batch is over
      val results = futures.map(f =>
        Await.ready(f, Duration.Inf).value.get)
      results.collectFirst { case scala.util.Failure(e) => throw e }
      ()
    } finally pool.shutdown()
  }
}
