package graft.sources


import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Avro Object Container File bridge — the OTHER row container a
  * migrating Hadoop shop holds shards in besides SequenceFiles
  * (`util/JobBuilder.java` treats input container choice as a job
  * config; the reference's ecosystem-standard interchange for
  * record-shaped shards is Avro OCF). Same (key: long, rec: string)
  * record shape as [[SequenceFiles]], written/read through the stock
  * `org.apache.avro.mapreduce` input/output formats that ship inside
  * Spark's jars — so the files interop with any Hadoop/Hive/Flume
  * stack, carry their schema in the container header, and go through
  * the real Hadoop output-commit protocol (temp attempt dir + rename
  * on task commit; speculative duplicates are discarded by the
  * committer, not by us).
  *
  * Deflate-compressed, like the reference's gzip-record SequenceFiles.
  */
object AvroFiles {

  val SchemaJson: String =
    """{"type":"record","name":"GraftRec","namespace":"graft",
      |"fields":[{"name":"key","type":"long"},
      |{"name":"rec","type":"string"}]}""".stripMargin

  val Schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("rec", StringType, nullable = false)))

  /** Write (key: long, rec: string) rows as one deflate-compressed Avro
    * container file per partition under `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new org.apache.avro.Schema.Parser().parse(SchemaJson))
    job.getConfiguration.set("mapreduce.output.fileoutputformat.compress", "true")
    job.getConfiguration.set("avro.output.codec", "deflate")
    val schemaJson = SchemaJson
    df.select("key", "rec").rdd
      .mapPartitions { it =>
        // Schema is not serializable across all Avro versions: parse once
        // per task from the JSON literal
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        it.map { r =>
          val rec: GenericRecord = new GenericData.Record(schema)
          rec.put("key", r.getLong(0))
          rec.put("rec", r.getString(1))
          (new AvroKey[GenericRecord](rec), NullWritable.get)
        }
      }
      .saveAsNewAPIHadoopFile(
        dir,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  /** Scan every `.avro` shard under `dir` back to a DataFrame. The
    * record reader reuses the AvroKey instance per record, so fields are
    * copied out to primitives before they leave the iterator. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new org.apache.avro.Schema.Parser().parse(SchemaJson))
    val rows = spark.sparkContext
      .newAPIHadoopFile(
        dir + "/*.avro",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val d = k.datum()
        Row(d.get("key").asInstanceOf[Long], d.get("rec").toString)
      }
    spark.createDataFrame(rows, Schema)
  }

  /** Spec probe: open one shard with the plain Avro file reader and
    * return (schema record name, codec, first key) — proves the output
    * is a REAL Avro OCF any stack can read, not just our own reader. */
  def describeShard(path: String): (String, String, Long) = {
    val in = new java.io.FileInputStream(path)
    try {
      val reader = new org.apache.avro.generic.GenericDatumReader[GenericRecord]()
      val stream = new org.apache.avro.file.DataFileStream[GenericRecord](in, reader)
      try {
        val codec = stream.getMetaString("avro.codec")
        val first = stream.next()
        (stream.getSchema.getFullName, codec, first.get("key").asInstanceOf[Long])
      } finally stream.close()
    } finally in.close()
  }
}
