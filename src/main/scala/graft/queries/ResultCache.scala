package graft.queries

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
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

  /** Fingerprint of a data directory: MD5 over the sorted recursive file
    * listing (path, length, mtime). Folded into the canonical id so a
    * cache entry is invalidated when the data under it changes in place —
    * the reference ties cache validity to the database timestamp the same
    * way (MasterServer.java:308 keys results by query + db epoch). */
  def inputFingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val md = MessageDigest.getInstance("MD5")
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        entries += s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
      }
      entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** One lock object per cache path within this JVM, so concurrent page
    * requests for the SAME uncached entry serialize on its build instead
    * of racing two overwrite-writes into one directory (the _SUCCESS
    * probe alone cannot prevent a writer deleting files out from under a
    * concurrent writer; distinct entries still build in parallel). */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Serve from cache when present, else compute + materialize. The
    * _SUCCESS marker gates readiness, so a killed write never serves a
    * partial result. The probe goes through the Hadoop FileSystem for the
    * cacheDir's scheme, so an HDFS/S3 cache dir (the deployment SURVEY §8
    * prescribes) is probed where the parquet was actually written, not on
    * the driver's local disk. */
  def getOrCompute(spark: SparkSession, cacheDir: String, queryName: String,
      params: Map[String, String])(compute: => DataFrame): DataFrame = {
    val path = s"$cacheDir/${canonicalId(queryName, params)}"
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    buildLocks.computeIfAbsent(path, _ => new Object).synchronized {
      if (!fs.exists(new Path(p, "_SUCCESS"))) {
        compute.write.mode("overwrite").parquet(path)
      }
    }
    spark.read.parquet(path)
  }
}
