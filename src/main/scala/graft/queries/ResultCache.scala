package graft.queries

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-server result cache (SURVEY §3.1 steps 2-3): results are keyed
  * by a canonical query id — query name plus its parameters in sorted
  * order — and materialized as parquet; a repeat of the same canonical
  * query serves the cached result without re-execution
  * (reference: Query.getCanonicalId / cachedResultsAvailable,
  * Query.java:596, MasterServer.java:308).
  */
object ResultCache {

  /** Canonical id: stable under parameter reordering. */
  def canonicalId(queryName: String, params: Map[String, String]): String = {
    val canon = queryName + "?" +
      params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    MessageDigest.getInstance("MD5").digest(canon.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Serve from cache when present, else compute + materialize. The
    * _SUCCESS marker gates readiness, so a killed write never serves a
    * partial result. */
  def getOrCompute(spark: SparkSession, cacheDir: String, queryName: String,
      params: Map[String, String])(compute: => DataFrame): DataFrame = {
    val path = s"$cacheDir/${canonicalId(queryName, params)}"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      compute.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
