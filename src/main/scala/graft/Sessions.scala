package graft

import org.apache.spark.sql.SparkSession

/** ONE SparkSession builder for the driver-contract mains (Bench,
  * Verify, Profile, Explain) so their knobs cannot drift (ADVICE r13 —
  * Profile had already re-inlined Bench's config by hand).
  *
  * Config notes (local[N] at the gate SFs):
  *  - master/shuffle.partitions = `$SPARK_GRAFT_CPUS` (harness
  *    contract — the driver also runs at a lower core count to measure
  *    scaling, so nothing here may hard-code a core count);
  *  - UTC + nanosAsLong: events.parquet ships TIMESTAMP(NANOS);
  *  - UI off in all mains.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  /** Bounded-driver-state knobs for the LONG mains (Bench/Verify/
    * Profile run 450+ queries in one JVM; one-shot tools like Explain
    * don't need these):
    *  - periodicGC 1min: localCheckpoint blocks are only reclaimed by
    *    the ContextCleaner after a full GC, and the default 30-min
    *    interval never fires inside one run — accumulated blocks turn
    *    the tail queries into eviction storms (r12 fix; ~100 ms/GC).
    *    Known benign side effect: the minute-boundary GC clears
    *    weak-ref'd accumulators of already-released plans, so late
    *    task-end events log "Failed to update accumulator" ERRORs —
    *    log noise, not a correctness or timing hazard (diagnosed r14).
    *  - retention caps: the UI is off but the AppStatus listener still
    *    retains per-job/stage state for every query — dead driver heap
    *    the tail pays for in GC (r13 fix). Values are generous for any
    *    single query at any scale.
    */
  def bounded(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.cleaner.periodicGC.interval", "1min")
    .config("spark.ui.retainedJobs", "100")
    .config("spark.ui.retainedStages", "100")
    .config("spark.ui.retainedTasks", "1000")
    .config("spark.sql.ui.retainedExecutions", "50")
}
