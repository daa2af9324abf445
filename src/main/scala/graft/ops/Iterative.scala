package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation policy for operators that must materialize
  * intermediate state: iterative ops (PageRank, connected components)
  * whose plans grow per round, and the dedupe/similarity pipelines whose
  * shingle/vector tables feed multiple joins.
  *
  * `localCheckpoint` stores blocks on executors — cheap, but on a real
  * cluster an executor loss kills the lineage-truncated run mid-flight
  * (a re-run, never a wrong answer). With a checkpoint dir configured
  * the state goes through reliable `checkpoint()` to the fault-tolerant
  * checkpoint filesystem instead — the setting a 1000-executor run
  * should use; local test runs default to the executor-local path.
  *
  * The dir comes from the session conf `spark.graft.checkpointDir` (set
  * once at session setup; every graft op picks it up) or an explicit
  * per-op override where the op exposes one.
  */
private[graft] object Iterative {

  /** Session conf key: when set, every graft materialization point uses
    * reliable checkpoints rooted at this (cluster-visible) path. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  // Plan-only mode: while set on the calling thread, materialize() is the
  // identity — no checkpoint job runs. Query builders are invoked
  // synchronously on the caller's thread, so the flag scopes exactly over
  // one builder call. Used by schema-discovery paths (QueryServer column
  // validation) that need the ANALYZED plan, never its data: an eager
  // checkpoint there would execute the heavy stage on an HTTP handler
  // thread, outside any cancellable job group (and the worker would then
  // redo the same work). Never set this around code that will EXECUTE the
  // returned frame — iterative ops rely on materialize for lineage
  // truncation and stable sampled partition boundaries.
  private val planOnlyFlag = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Run `f` with every graft materialization point downgraded to a
    * no-op on this thread (schema/plan inspection only). */
  def planOnly[A](f: => A): A = {
    val prev = planOnlyFlag.get
    planOnlyFlag.set(java.lang.Boolean.TRUE)
    try f finally planOnlyFlag.set(prev)
  }

  /** Materialize one DataFrame under the session-configured policy. */
  def materialize(df: DataFrame): DataFrame =
    if (planOnlyFlag.get) df else materializer(df.sparkSession, None)(df)

  /** Materialize with SERIALIZED block storage (memory-and-disk-ser) —
    * for edge-scale frames in iterative loops, where the default
    * deserialized localCheckpoint blocks (an object per row on top of
    * each UnsafeRow) crowd the unified memory region that the loop's own
    * aggregation needs. Measured on the 100× HyperBall build: E-row
    * edges+state as deserialized blocks OOM a 12 g heap
    * ([UNABLE_TO_ACQUIRE_MEMORY] mid-round under 32 tasks); serialized
    * blocks complete under the same roof. Reliable-checkpoint mode is
    * unchanged — it is already on-disk. */
  def materializeSer(df: DataFrame): DataFrame =
    if (planOnlyFlag.get) df
    else df.sparkSession.conf.getOption(CheckpointDirKey) match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint(true)
      case None =>
        df.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }

  /** Returns the per-round materializer. An explicit `checkpointDir`
    * wins; otherwise `spark.graft.checkpointDir` applies; otherwise
    * executor-local checkpoints.
    *
    * NOTE: `setCheckpointDir` is SparkContext-GLOBAL — concurrent
    * iterative ops in one session must share a checkpoint dir (pass the
    * same value, or set it once at session setup via the conf key).
    * Passing different dirs from overlapping ops would interleave their
    * checkpoint files across both directories. */
  def materializer(
      spark: SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir.orElse(spark.conf.getOption(CheckpointDirKey)) match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        df => if (planOnlyFlag.get) df else df.checkpoint(true)
      case None =>
        df => if (planOnlyFlag.get) df else df.localCheckpoint(true)
    }
}
