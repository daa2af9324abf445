package graft.sources

import org.apache.hadoop.io.{LongWritable, SequenceFile, Text}
import org.apache.hadoop.io.compress.DefaultCodec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Real Hadoop SequenceFile I/O — the reference's universal job container
  * (`util/JobBuilder.java:110` `inputIsSeqFile`;
  * `hadoop/mergeutils/SequenceFileReader.java:42`; every mapred job in the
  * reference reads and writes gzip-compressed SequenceFiles on HDFS/S3).
  * The engine's storage is normalized to Parquet (SURVEY §2.1 S1), but a
  * migrating user's EXISTING shards are SequenceFiles — this is the
  * ingest/egress bridge, written against the same `org.apache.hadoop.io`
  * classes the reference uses (they ship inside Spark's Hadoop client;
  * no new dependency).
  *
  * Layout: `LongWritable` key + `Text` value (the reference's dominant
  * shape is fingerprint-key → record bytes), RECORD-compressed with the
  * Hadoop default (deflate) codec — readable by any Hadoop stack.
  */
object SequenceFiles {

  val Schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("rec", StringType, nullable = false)))

  /** Write (key: long, rec: string) rows as one compressed SequenceFile
    * per partition under `dir` — the reference's sharded-output layout
    * (part files a downstream scan globs). */
  def write(df: DataFrame, dir: String): Unit =
    df.select("key", "rec").rdd
      .map(r => (new LongWritable(r.getLong(0)), new Text(r.getString(1))))
      .saveAsSequenceFile(dir, Some(classOf[DefaultCodec]))

  /** Scan every SequenceFile shard under `dir` back to a DataFrame.
    * Hadoop reuses Writable instances per record, so values are copied
    * out before they leave the iterator. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val rows = spark.sparkContext
      .sequenceFile(dir, classOf[LongWritable], classOf[Text])
      .map { case (k, v) => Row(k.get(), v.toString) }
    spark.createDataFrame(rows, Schema)
  }

  /** Point check used by specs: confirm a shard really is a SequenceFile
    * with the expected header (magic `SEQ`, version, key/value class
    * names, compressed flag) by opening it with the Hadoop reader
    * directly. */
  def describeShard(path: String): (String, String, Boolean) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val r = new SequenceFile.Reader(conf,
      SequenceFile.Reader.file(new org.apache.hadoop.fs.Path(path)))
    try (r.getKeyClassName, r.getValueClassName, r.isCompressed)
    finally r.close()
  }
}
