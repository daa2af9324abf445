package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (when SQL-expressible)
  * an equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Names and column aliases must agree between the two —
  * the harness sorts columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

object Registry {
  /** All query groups, in SURVEY.md §2 order. Lazy vals: the defs are
    * immutable config, and the page server resolves `queries(name)` per
    * request — rebuilding ~100 defs (and re-running the duplicate check)
    * per page would be O(all queries) work on the serving path. */
  lazy val all: Seq[Q] =
    RelationalQueries.defs ++
      CrawlDbQueries.defs ++
      UrlQueries.defs ++
      MiscQueries.defs ++
      DedupeQueries.defs ++
      GraphQueries.defs ++
      TextQueries.defs ++
      SimilarityQueries.defs ++
      ListGenQueries.defs ++
      StatsQueries.defs ++
      InteractiveQueries.defs ++
      MultimodalQueries.defs ++
      CurationQueries.defs ++
      SourceQueries.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicate name would silently shadow a query in the Map — and the
    // driver's gate would "pass" while never running the shadowed one
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all.map(q => q.name -> q.run).toMap
  }

  lazy val oracleSql: Map[String, String] = {
    queries // run the duplicate-name guard before serving either map
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
  }

  /** Reads one driver test table (TESTDATA.md layout).
    *
    * The `events` table's `ts` column has shipped in two generator
    * layouts: TIMESTAMP(NANOS) (which Spark's parquet reader rejects —
    * read with the nanos-as-long legacy conf and rebuilt at microsecond
    * precision; every consumer buckets to hours/days, so sub-micro
    * precision is immaterial) and plain TIMESTAMP(MICROS) (arrives as
    * TIMESTAMP_NTZ — cast to the session-zone timestamp type so both
    * layouts produce identical UTC instants for every consumer). The
    * branch keys off the loaded type, so either generator works. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
