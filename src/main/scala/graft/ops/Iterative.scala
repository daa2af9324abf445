package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation policy for iterative operators (PageRank, connected
  * components): every round must materialize its state, or the plan grows
  * unboundedly.
  *
  * `localCheckpoint` stores blocks on executors — cheap, but on a real
  * cluster an executor loss kills the lineage-truncated run mid-iteration.
  * With a `checkpointDir` set the state goes through reliable
  * `checkpoint()` to the (fault-tolerant) checkpoint filesystem instead —
  * the setting a 1000-executor run should use; local test runs default to
  * the executor-local path.
  */
private[graft] object Iterative {

  /** Returns the per-round materializer. Setting `checkpointDir`
    * configures the context's checkpoint location (a cluster-visible
    * path) and switches to reliable checkpoints.
    *
    * NOTE: `setCheckpointDir` is SparkContext-GLOBAL — concurrent
    * iterative ops in one session must share a checkpoint dir (pass the
    * same value, or set it once at session setup and pass it everywhere).
    * Passing different dirs from overlapping ops would interleave their
    * checkpoint files across both directories. */
  def materializer(
      spark: SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(true)
      case None =>
        df => df.localCheckpoint(true)
    }
}
