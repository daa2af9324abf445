package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** One wiki page extracted from a MediaWiki XML dump. */
final case class WikiPage(title: String, id: Long, text: String)

/** S9: Wikipedia XML source (reference WikipediaPageInputFormat /
  * XMLInputFormat — page-per-record splitting of a MediaWiki dump).
  *
  * Spark-first shape: `wholetext` read (one file per row) + a flatMap
  * that walks `<page>…</page>` blocks. For dumps larger than one split,
  * the same walker applies per partition after `spark.read.text` with a
  * custom delimiter (`textFile` lineSep="</page>") — that variant is what
  * [[read]] uses, so a single huge dump file still parallelizes by split.
  */
object WikipediaXmlSource {

  private def tag(block: String, name: String): Option[String] = {
    val open = block.indexOf(s"<$name")
    if (open < 0) return None
    val contentStart = block.indexOf('>', open)
    val close = block.indexOf(s"</$name>", contentStart)
    if (contentStart < 0 || close < 0) None
    else Some(block.substring(contentStart + 1, close))
  }

  private[sources] def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")

  /** Parse one `<page>`-terminated chunk into a page, if complete. */
  def parsePageChunk(chunk: String): Option[WikiPage] = {
    val start = chunk.indexOf("<page>")
    if (start < 0) return None
    val block = chunk.substring(start)
    for {
      title <- tag(block, "title")
      id <- tag(block, "id")
      text <- tag(block, "text")
    } yield WikiPage(unescape(title), id.trim.toLong, unescape(text))
  }

  /** Page-per-record scan of a MediaWiki XML dump: records are split at
    * `</page>` boundaries so a single dump file parallelizes by split. */
  def read(spark: SparkSession, path: String): Dataset[WikiPage] = {
    import spark.implicits._
    spark.read.option("lineSep", "</page>").textFile(path)
      .flatMap(chunk => parsePageChunk(chunk))
  }
}
