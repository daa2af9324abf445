package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Session-aware Hadoop configuration plumbing for the raw-FS bridge
  * sinks (TFiles, TokenShards). A bare `new Configuration()` sees only
  * the classpath's core-site.xml: s3a endpoints, credentials and HA
  * settings supplied through the Spark session (`spark.hadoop.*` conf,
  * runtime overrides) would be invisible to driver-side pre-clean
  * sweeps and manifest writes, and to executor-side shard I/O — fine on
  * a laptop, a landmine on a real deployment. Every FS op in sources/
  * goes through here instead.
  */
private[sources] object HadoopConfs {

  /** The session's resolved Hadoop conf — core-site defaults plus
    * `spark.hadoop.*` plus SQL-conf runtime overrides — for DRIVER-side
    * FS ops (pre-clean, manifest read/write, planning). */
  def session(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  /** Serializable snapshot of the session conf for EXECUTOR-side
    * rebuild: `Configuration` itself is not serializable, and a task
    * constructing its own would fall back to cluster defaults, dropping
    * the session's s3a/HA overrides. O(conf entries) per task closure —
    * these sinks run O(shards) tasks, so the overhead is manifest-plane. */
  def snapshot(spark: SparkSession): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    session(spark).iterator().asScala.map(e => e.getKey -> e.getValue).toArray
  }

  /** Rebuild a Configuration from [[snapshot]] inside a task. The
    * snapshot already contains the fully-resolved defaults, so no
    * default resources are re-loaded (`loadDefaults = false`). */
  def restore(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
