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

  /** Materialize one DataFrame under the session-configured policy. */
  def materialize(df: DataFrame): DataFrame =
    materializer(df.sparkSession, None)(df)

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
        df => df.checkpoint(true)
      case None =>
        df => df.localCheckpoint(true)
    }
}
