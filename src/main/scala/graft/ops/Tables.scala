package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** x27: HTML table extraction — the WebTables tier of a training-data
  * pipeline (relational facts live in `<table>` markup; extracting
  * them as rows×cells text is the structured slice of the corpus).
  * Scope, pinned: NON-NESTED tables only (a table containing another
  * `<table` is skipped wholesale — the budget that keeps the scan
  * linear and the semantics unambiguous); comments and script/style
  * bodies vanish BEFORE the table scan (the x9 discipline, so a
  * commented-out or scripted "<table>" never counts); rows are
  * `<tr>` elements, cells `<td>`/`<th>` with the standard entity
  * decode + whitespace fold per cell; a table's first row counts as a
  * header when ALL its cells are `<th>`. Output per table: row/col
  * census + the cell text (cells joined " | ", rows joined `\n`).
  * Budgets on tables, rows, and cells per document. */
object Tables {

  private val MaxTables = 64
  private val MaxRows = 4096
  private val MaxCellsPerDoc = 100000

  private val TableRe = "(?is)<table\\b[^>]*>(.*?)</table\\s*>".r
  private val TrRe = "(?is)<tr\\b[^>]*>(.*?)</tr\\s*>".r
  private val CellRe = "(?is)<t([dh])\\b[^>]*>(.*?)</t[dh]\\s*>".r

  /** (tableIdx, nRows, nCols, hasHeader, text) per non-nested table. */
  private[graft] def extractTables(html: String): Seq[(Int, Int, Int, Int, String)] =
    try extractImpl(html)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  private def extractImpl(html: String): Seq[(Int, Int, Int, Int, String)] = {
    if (html == null) return Seq.empty
    // comments + script/style bodies vanish FIRST (x9 discipline)
    val clean = html
      .replaceAll("(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
      .replaceAll("(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
      .replaceAll("(?s)<!--.*?-->", " ")
    val out = Vector.newBuilder[(Int, Int, Int, Int, String)]
    var idx = 0
    var cells = 0
    val it = TableRe.findAllMatchIn(clean)
    while (it.hasNext && idx < MaxTables && cells < MaxCellsPerDoc) {
      val body = it.next().group(1)
      // nested tables are out of scope: skip wholesale, keep counting
      if (!body.toLowerCase(java.util.Locale.ROOT).contains("<table")) {
        val rows = TrRe.findAllMatchIn(body).map(_.group(1))
          .take(MaxRows).toVector
        if (rows.nonEmpty) {
          var nCols = 0
          var hasHeader = 0
          val lines = Vector.newBuilder[String]
          var r = 0
          while (r < rows.length && cells < MaxCellsPerDoc) {
            val cs = CellRe.findAllMatchIn(rows(r))
              .map(m => (m.group(1).equalsIgnoreCase("h"),
                DocText.xhtmlToText(m.group(2)))).toVector
            if (cs.nonEmpty) {
              if (r == 0 && cs.forall(_._1)) hasHeader = 1
              nCols = math.max(nCols, cs.length)
              cells += cs.length
              lines += cs.map(_._2).mkString(" | ")
            }
            r += 1
          }
          val text = lines.result()
          if (text.nonEmpty) {
            out += ((idx, text.length, nCols, hasHeader, text.mkString("\n")))
            idx += 1
          }
        }
      }
    }
    out.result()
  }

  /** Analytic fixture page: k%3+1 plain tables (even-indexed ones with
    * a full-`<th>` header row; one cell per table carrying an entity),
    * plus a commented-out table, a scripted "<table>" string, and —
    * when k%5==0 — a NESTED table, all of which must not count. */
  private[graft] def encodeTablesHtml(docId: Long): String = {
    val k = ((docId % 251) + 251) % 251
    val nt = (k % 3 + 1).toInt
    val dr = (k % 4 + 1).toInt
    val cols = (k % 3 + 2).toInt
    val sb = new StringBuilder
    sb.append("<html><head><title>tables ").append(docId)
      .append("</title><script>var t = \"<table><tr><td>ghost</td></tr></table>\";</script>")
      .append("</head><body>")
    sb.append("<!-- <table><tr><td>commented out</td></tr></table> -->")
    for (t <- 0 until nt) {
      sb.append("<table class=\"data\">")
      if (t % 2 == 0) {
        sb.append("<tr>")
        for (c <- 0 until cols)
          sb.append(s"<th> H$t $c </th>")
        sb.append("</tr>")
      }
      for (r <- 0 until dr) {
        sb.append("<tr>")
        for (c <- 0 until cols) {
          sb.append(s"<td>c$t $r $c of $docId")
          if (r == 0 && c == 0) sb.append(" &amp; co")
          sb.append("</td>")
        }
        sb.append("</tr>")
      }
      sb.append("</table><p>between $t</p>")
    }
    if (k % 5 == 0)
      sb.append("<table><tr><td>outer<table><tr><td>inner</td></tr>" +
        "</table></td></tr></table>")
    sb.append("</body></html>")
    sb.toString
  }

  def packTablesHtml(id: Column): Column = {
    val enc = udf((d: Long) => encodeTablesHtml(d))
    enc(id.cast("long"))
  }

  private val OutSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("table_idx", IntegerType, nullable = false),
    StructField("n_rows", IntegerType, nullable = false),
    StructField("n_cols", IntegerType, nullable = false),
    StructField("has_header", IntegerType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** One output row per extracted table (documents with none vanish —
    * the explode shape). */
  def extractTablesDf(df: DataFrame, id: String, html: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(id).cast("long"), col(html)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        extractTables(r.getString(1)).map { case (i, nr, nc, hh, t) =>
          Row(r.getLong(0), i, nr, nc, hh, t)
        }
      }
    }
    spark.createDataFrame(rdd, OutSchema)
  }
}
