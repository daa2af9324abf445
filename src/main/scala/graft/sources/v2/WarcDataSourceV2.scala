package graft.sources.v2

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.sources.{GzipMembers, MemberStream, ZstdMembers}

/** WARC/1.x as a Spark DataSource V2: `spark.read.format("graft-warc")`.
  *
  * The reference predates WARC — it reads and writes the classic ARC
  * layout (util/ArcFileReader.java:68, util/ArcFileWriter.java:77) —
  * but the corpus it crawls has shipped as WARC (ISO 28500) since 2013,
  * so a drop-in user needs this format first. Same architecture as
  * [[ArcDataSource]]: one file = one input partition, fixed-window
  * streaming inflation over gzip members ([[GzipMembers]]), named-header
  * parse, filter pushdown *before* the record block is touched, column
  * pruning that skips block materialization entirely for metadata-only
  * scans, and the shared name-watermark micro-batch stream.
  *
  * Format notes (public spec, ISO 28500 / WARC-1.1):
  *  - a `.warc.gz` stores each record as its own gzip member (the
  *    member-seekable layout CommonCrawl publishes); the reader also
  *    accepts several records per member, as the spec allows;
  *  - a record is `WARC/1.x CRLF`, named headers, blank line, then
  *    exactly `Content-Length` block bytes, then CRLF CRLF;
  *  - for `response` records the block is an HTTP message — the reader
  *    splits it once and exposes `http_status`, the payload `mime_type`
  *    (HTTP Content-Type, parameters stripped) and the body bytes as
  *    `payload`; for every other record type `payload` is the block
  *    itself. The split only runs when a block-derived column survives
  *    pruning.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTable.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

object WarcTable {
  /** Full row shape; readers materialize a pruned subset.
    * Header-derived fields are non-null (a record missing a mandatory
    * header is malformed); block-derived fields (`http_status`,
    * `mime_type`, `payload`) are null for records without an HTTP
    * envelope. */
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true), // warcinfo has no target URI
    StructField("warc_type", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("ip", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("warc_file", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    // full HTTP response headers, lowercased names, first value wins —
    // the reference extracts the same map to crawl metadata JSON
    // (util/HttpHeaderInfoExtractor.java, ParserMapper
    // .httpHeadersToJsonObject); null for records without an envelope
    StructField("http_headers",
      MapType(StringType, StringType, valueContainsNull = false), nullable = true),
    // every named WARC header of the record, lowercased — the escape
    // hatch for fields outside the typed columns (WARC-Payload-Digest,
    // WARC-Refers-To on revisit records, extension headers)
    StructField("warc_headers",
      MapType(StringType, StringType, valueContainsNull = false), nullable = false),
  ))

  /** Columns that require reading (or splitting) the record block. */
  private[v2] val blockCols =
    Set("content", "payload", "http_status", "mime_type", "http_headers")
}

final class WarcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"graft-warc(${options.getOrDefault("path", "")})"
  override def schema(): StructType = WarcTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ,
      // writers provide the record fields; length/record_id/warc_file/
      // offset are derived (WarcBatchWrite validates the required set)
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(opts)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    WarcWriteBuilder(info)
}

final class WarcScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WarcTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(WarcFilters.supported)
    pushed = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = WarcScan(options, required, pushed)
}

final case class WarcScan(
    options: CaseInsensitiveStringMap,
    required: StructType,
    pushed: Array[Filter],
) extends Scan with Batch with SupportsReportStatistics with ArchiveStreamScan {

  override def formatName: String = "graft-warc"
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-warc PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  private def hadoopConf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  private def globRegex(glob: String): String =
    glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    }

  private def listFiles(): Seq[FileStatus] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-warc: 'path' option is required"))
    // default accepts both member codecs; an explicit pathGlobFilter
    // narrows to one
    val nameRe = Option(options.get("pathGlobFilter"))
      .map(g => globRegex(g).r)
      .getOrElse(""".*\.warc\.(gz|zst)""".r)
    val conf = hadoopConf
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus])
    matched.toSeq.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }.filter(st => nameRe.matches(st.getPath.getName))
      .sortBy(_.getPath.toString)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = hadoopConf
    listFiles().map { st =>
      val fs = st.getPath.getFileSystem(conf)
      val hosts =
        try fs.getFileBlockLocations(st, 0, st.getLen).flatMap(_.getHosts).distinct
        catch { case _: Exception => Array.empty[String] }
      ArcInputPartition(st.getPath.toString, st.getLen, hosts): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory()

  override def readerFactory(): PartitionReaderFactory =
    WarcReaderFactory(
      new SerializableConfiguration(hadoopConf),
      required.fieldNames,
      pushed,
      options.getBoolean("ignoreCorruptFiles", false),
    )

  override def listFilesForStream(): Seq[FileStatus] = listFiles()

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ArcMicroBatchStream(this)

  override def estimateStatistics(): Statistics = {
    val total = listFiles().map(_.getLen).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(total)
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }
}

final case class WarcReaderFactory(
    conf: SerializableConfiguration,
    fieldNames: Array[String],
    pushed: Array[Filter],
    ignoreCorrupt: Boolean = false,
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[ArcInputPartition], conf.value, fieldNames, pushed,
      ignoreCorrupt)
}

/** Streams one WARC file record-by-record. Named headers are parsed and
  * the pushed predicates applied BEFORE the block is read; a rejected
  * record's block bytes are skipped (decompressed but never allocated).
  * The HTTP envelope split runs only when a block-derived column is in
  * the read schema. */
final class WarcPartitionReader(
    partition: ArcInputPartition,
    conf: Configuration,
    fieldNames: Array[String],
    pushed: Array[Filter],
    ignoreCorrupt: Boolean = false,
) extends PartitionReader[InternalRow] {

  private val path = new Path(partition.path)
  private val raw: InputStream =
    new BufferedInputStream(path.getFileSystem(conf).open(path), 1 << 16)
  // member codec by extension: `.warc.zst` = one zstd frame per record
  // (same seekable-offset contract), anything else the gzip layout
  private val members: MemberStream =
    if (partition.path.endsWith(".zst")) new ZstdMembers(raw)
    else new GzipMembers(raw)
  private val needBlock = fieldNames.exists(WarcTable.blockCols)
  private val needSplit = fieldNames.exists(f =>
    f == "payload" || f == "http_status" || f == "mime_type" || f == "http_headers")
  private val fileName = UTF8String.fromString(partition.path)
  private var member: InputStream = _
  private var memberStart: Long = 0L
  private var row: InternalRow = _

  /** Read one CRLF/LF-terminated line; null at end of stream. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var b = in.read()
    while (b != -1 && b != '\n') { buf.write(b); b = in.read() }
    if (b == -1 && buf.size() == 0) return null
    val s = buf.toString("UTF-8")
    if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
  }

  private def readBlock(in: InputStream, n: Long): Array[Byte] = {
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, (n - off).toInt)
      if (r < 0) throw new EOFException(s"WARC block truncated at $off/$n")
      off += r
    }
    out
  }

  private def skipBlock(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val r = in.skip(left)
      if (r > 0) left -= r
      else if (in.read() >= 0) left -= 1 // skip() can return 0 mid-stream
      else throw new EOFException(s"WARC block truncated with $left/$n left")
    }
  }

  override def next(): Boolean =
    try nextRecord()
    catch {
      // same corruption policy as graft-arc: gzip-layer or block-length
      // damage abandons the remainder of THIS file under
      // ignoreCorruptFiles; header-level damage is handled per-record in
      // nextRecord() without abandoning the file
      case e @ (_: java.io.IOException | _: NumberFormatException |
          _: NegativeArraySizeException) if ignoreCorrupt =>
        System.err.println(
          s"graft-warc: skipping corrupt remainder of ${partition.path}: $e")
        false
    }

  /** Advance to the next record's `WARC/` magic line, crossing member
    * boundaries; null at end of archive. */
  private def nextMagic(): String = {
    while (true) {
      if (member == null) {
        member = members.nextMember()
        if (member == null) return null
        memberStart = members.memberOffset
      }
      val line = readLine(member)
      if (line == null) { member.close(); member = null } // member exhausted
      else if (line.nonEmpty) return line // blank = inter-record CRLFs
    }
    null // unreachable
  }

  private def nextRecord(): Boolean = {
    row = null
    while (row == null) {
      val magic = nextMagic()
      if (magic == null) return false
      val offset = memberStart
      val parsed =
        try {
          if (!magic.startsWith("WARC/"))
            throw new java.io.IOException(s"not a WARC record header: $magic")
          // named headers up to the blank separator line; folded
          // continuation lines (obsolete but legal) are appended
          val headers = scala.collection.mutable.LinkedHashMap[String, String]()
          var last: String = null
          var line = readLine(member)
          while (line != null && line.nonEmpty) {
            if ((line.head == ' ' || line.head == '\t') && last != null) {
              headers(last) = headers(last) + " " + line.trim
            } else {
              val i = line.indexOf(':')
              if (i < 0) throw new java.io.IOException(s"malformed WARC header line: $line")
              last = line.substring(0, i).trim.toLowerCase
              headers(last) = line.substring(i + 1).trim
            }
            line = readLine(member)
          }
          val len = headers.getOrElse("content-length",
            throw new java.io.IOException("WARC record missing Content-Length")).toLong
          Some((headers, len))
        } catch {
          // header-level damage: the member boundary is intact, so drop
          // just this record and continue at the next member
          case e @ (_: java.io.IOException | _: NumberFormatException)
              if ignoreCorrupt =>
            System.err.println(
              s"graft-warc: skipping malformed record in ${partition.path}: $e")
            if (member != null) { member.close(); member = null }
            None
        }
      parsed match {
        case None => ()
        case Some((headers, len)) =>
          val url = headers.getOrElse("warc-target-uri", null)
          val wtype = headers.getOrElse("warc-type", "unknown")
          val date = headers.getOrElse("warc-date", "")
          val recId = headers.getOrElse("warc-record-id", "")
          val ip = headers.getOrElse("warc-ip-address", null)
          val ctype = headers.getOrElse("content-type", null)
          if (!WarcFilters.matches(pushed, url, wtype, date, recId, ip, ctype, len)) {
            skipBlock(member, len) // predicate failed — block never allocated
          } else {
            val block = if (needBlock) readBlock(member, len) else { skipBlock(member, len); null }
            // HTTP envelope split (response/request/revisit records carry
            // an application/http block per the spec)
            val (status, mime, payload, httpHeaders) =
              if (needSplit && block != null && ctype != null &&
                  ctype.toLowerCase.startsWith("application/http"))
                WarcHttp.split(block, needHeaders = fieldNames.contains("http_headers"))
              else (null, null, block, null)
            val values = new Array[Any](fieldNames.length)
            var i = 0
            while (i < fieldNames.length) {
              values(i) = fieldNames(i) match {
                case "url" => if (url == null) null else UTF8String.fromString(url)
                case "warc_type" => UTF8String.fromString(wtype)
                case "warc_date" => UTF8String.fromString(date)
                case "record_id" => UTF8String.fromString(recId)
                case "ip" => if (ip == null) null else UTF8String.fromString(ip)
                case "content_type" =>
                  if (ctype == null) null else UTF8String.fromString(ctype)
                case "length" => len
                case "http_status" => status
                case "mime_type" => mime
                case "warc_file" => fileName
                case "offset" => offset
                case "content" => block
                case "payload" => payload
                case "http_headers" => httpHeaders
                case "warc_headers" =>
                  new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
                    new org.apache.spark.sql.catalyst.util.GenericArrayData(
                      headers.keys.map(UTF8String.fromString).toArray[Any]),
                    new org.apache.spark.sql.catalyst.util.GenericArrayData(
                      headers.values.map(UTF8String.fromString).toArray[Any]))
              }
              i += 1
            }
            row = new GenericInternalRow(values)
          }
      }
    }
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = raw.close()
}

/** Point access to WARC archive bytes: parse the single record whose
  * gzip member starts at `offset` — the random-access read the scan's
  * `offset` column points to (the content-serving path; the reference's
  * query server seeks archive members the same way for page-content
  * fetches, ArcFileReader member seeks). */
object WarcRecords {

  /** (named headers lowercased, block bytes) of the record at `offset`.
    * `offset` must be a gzip member start (the scan's `offset` column);
    * for a member holding several records this returns the FIRST —
    * the published corpus layout is one record per member, which the
    * graft-warc writer also produces. */
  def fetchRecordAt(bytes: Array[Byte], offset: Long)
      : (Map[String, String], Array[Byte]) =
    fetchRecord(new java.io.ByteArrayInputStream(
      bytes, offset.toInt, bytes.length - offset.toInt),
      graft.sources.ZstdMembers.dictAtHead(bytes))

  /** Stream form of [[fetchRecordAt]]: `raw` must be positioned at a
    * member start (e.g. an FSDataInputStream after seek(offset) — the
    * server-side point fetch never reads the whole archive). The member
    * codec is sniffed from the magic bytes (gzip 1f8b / zstd 28b52ffd),
    * so one fetch path serves `.warc.gz` and `.warc.zst` archives.
    * `dict`: the archive's shared zstd dictionary when it has one (the
    * warc-zstd 0x184D2A5D head slot — [[graft.sources.ZstdMembers
    * .dictAtHead]] extracts it); frames written with dictSamples>0
    * carry a Dictionary_ID and fail to inflate without it. Stream
    * callers that only serve `.warc.gz` may omit it. */
  def fetchRecord(raw: InputStream, dict: Array[Byte] = null)
      : (Map[String, String], Array[Byte]) = {
    val pb = new java.io.PushbackInputStream(raw, 4)
    val mg = new Array[Byte](4)
    // InputStream.read may legally return fewer bytes than requested even
    // when more are available; loop until 4 bytes or EOF so the zstd magic
    // sniff never falls through to gzip on a short read.
    var got = 0
    var eof = false
    while (got < 4 && !eof) {
      val n = pb.read(mg, got, 4 - got)
      if (n < 0) eof = true else got += n
    }
    require(got > 0, "empty stream at member offset")
    pb.unread(mg, 0, got)
    val codec: InputStream =
      if (got >= 4 && (mg(0) & 0xff) == 0x28 && (mg(1) & 0xff) == 0xb5 &&
          (mg(2) & 0xff) == 0x2f && (mg(3) & 0xff) == 0xfd) {
        val z = new com.github.luben.zstd.ZstdInputStream(pb)
        if (dict != null) z.setDict(dict) else z
      } else new java.util.zip.GZIPInputStream(pb)
    val in = new BufferedInputStream(codec)
    def readLine(): String = {
      val buf = new ByteArrayOutputStream(128)
      var b = in.read()
      while (b != -1 && b != '\n') { buf.write(b); b = in.read() }
      if (b == -1 && buf.size() == 0) return null
      val s = buf.toString("UTF-8")
      if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
    }
    var magic = readLine()
    while (magic != null && magic.isEmpty) magic = readLine()
    require(magic != null && magic.startsWith("WARC/"),
      s"no WARC record at this offset: $magic")
    val headers = scala.collection.mutable.LinkedHashMap[String, String]()
    var line = readLine()
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      require(i > 0, s"malformed WARC header line: $line")
      headers(line.substring(0, i).trim.toLowerCase) = line.substring(i + 1).trim
      line = readLine()
    }
    val len = headers("content-length").toLong
    val block = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val r = in.read(block, off, (len - off).toInt)
      if (r < 0) throw new EOFException(s"WARC block truncated at $off/$len")
      off += r
    }
    (headers.toMap, block)
  }

  /** The HTTP payload of the record at `offset` (the block itself for
    * records without an envelope). */
  def fetchPayloadAt(bytes: Array[Byte], offset: Long): Array[Byte] =
    fetchPayload(new java.io.ByteArrayInputStream(
      bytes, offset.toInt, bytes.length - offset.toInt),
      graft.sources.ZstdMembers.dictAtHead(bytes))._1

  /** (payload bytes, payload mime) of the record a positioned stream
    * points at — what a content-serving endpoint returns. */
  def fetchPayload(raw: InputStream, dict: Array[Byte] = null)
      : (Array[Byte], String) = {
    val (headers, block) = fetchRecord(raw, dict)
    if (headers.get("content-type").exists(
        _.toLowerCase.startsWith("application/http"))) {
      val (_, mime, payload, _) = WarcHttp.split(block)
      (payload, if (mime == null) "application/octet-stream" else mime.toString)
    } else
      (block, headers.getOrElse("content-type", "application/octet-stream"))
  }
}

/** HTTP message split for response-record blocks (status, payload mime,
  * body) — byte-level, tolerant of LF-only separators. */
private[graft] object WarcHttp {
  /** Returns (http_status | null, mime | null, payload bytes,
    * header map | null — built only when `needHeaders`). */
  def split(block: Array[Byte], needHeaders: Boolean = false)
      : (Integer, UTF8String, Array[Byte],
         org.apache.spark.sql.catalyst.util.ArrayBasedMapData) = {
    val bodyAt = headerEnd(block)
    if (bodyAt < 0) return (null, null, block, null) // no envelope: raw block
    val head = new String(block, 0, bodyAt, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    val status: Integer = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(l => l.split(" ", 3).lift(1))
      .flatMap(s => scala.util.Try(Integer.valueOf(s.trim)).toOption)
      .orNull
    val mime = lines.iterator.drop(1)
      .filter(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim)
      .map(v => { val i = v.indexOf(';'); if (i >= 0) v.substring(0, i).trim else v })
      .filter(_.nonEmpty)
      .map(UTF8String.fromString)
      .nextOption()
      .orNull
    val headerMap =
      if (!needHeaders) null
      else {
        val seen = scala.collection.mutable.LinkedHashMap[String, String]()
        lines.iterator.drop(1).foreach { l =>
          val i = l.indexOf(':')
          if (i > 0) {
            val k = l.substring(0, i).trim.toLowerCase
            if (!seen.contains(k)) seen(k) = l.substring(i + 1).trim
          }
        }
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            seen.keys.map(UTF8String.fromString).toArray[Any]),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            seen.values.map(UTF8String.fromString).toArray[Any]))
      }
    (status, mime,
      java.util.Arrays.copyOfRange(block, skipSeparator(block, bodyAt), block.length),
      headerMap)
  }

  /** Index of the first header/body separator (CRLFCRLF or LFLF); -1 if
    * absent or the block doesn't start with an HTTP line. */
  private def headerEnd(block: Array[Byte]): Int = {
    if (block.length < 5 || block(0) != 'H' || block(1) != 'T' ||
        block(2) != 'T' || block(3) != 'P') return -1
    var i = 0
    while (i < block.length - 1) {
      if (block(i) == '\n' &&
          (block(i + 1) == '\n' || (i + 2 < block.length &&
            block(i + 1) == '\r' && block(i + 2) == '\n'))) return i
      i += 1
    }
    -1
  }

  private def skipSeparator(block: Array[Byte], at: Int): Int =
    if (block(at + 1) == '\n') at + 2 else at + 3 // \n\n vs \n\r\n
}

/** The predicate subset evaluable on the named headers alone (before the
  * record block is read). */
object WarcFilters {
  private val stringCols =
    Set("url", "warc_type", "warc_date", "record_id", "ip", "content_type")
  private val allCols = stringCols + "length"

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => stringCols(a)
    case StringStartsWith(a, _) => stringCols(a)
    case StringEndsWith(a, _) => stringCols(a)
    case StringContains(a, _) => stringCols(a)
    case In(a, vs) => stringCols(a) && vs.forall(_.isInstanceOf[String])
    case EqualTo(a, _: Long) => a == "length"
    case GreaterThan(a, _: Long) => a == "length"
    case GreaterThanOrEqual(a, _: Long) => a == "length"
    case LessThan(a, _: Long) => a == "length"
    case LessThanOrEqual(a, _: Long) => a == "length"
    case IsNull(a) => stringCols(a)
    case IsNotNull(a) => allCols(a)
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  def matches(
      filters: Array[Filter],
      url: String, wtype: String, date: String, recId: String,
      ip: String, ctype: String, len: Long): Boolean = {
    def strVal(a: String): String = a match {
      case "url" => url
      case "warc_type" => wtype
      case "warc_date" => date
      case "record_id" => recId
      case "ip" => ip
      case "content_type" => ctype
    }
    def eval(f: Filter): Boolean = f match {
      case EqualTo(a, v: String) => strVal(a) == v
      case StringStartsWith(a, p) => { val s = strVal(a); s != null && s.startsWith(p) }
      case StringEndsWith(a, x) => { val s = strVal(a); s != null && s.endsWith(x) }
      case StringContains(a, x) => { val s = strVal(a); s != null && s.contains(x) }
      case In(a, vs) => vs.exists(_ == strVal(a))
      case EqualTo("length", v: Long) => len == v
      case GreaterThan("length", v: Long) => len > v
      case GreaterThanOrEqual("length", v: Long) => len >= v
      case LessThan("length", v: Long) => len < v
      case LessThanOrEqual("length", v: Long) => len <= v
      case IsNull(a) => strVal(a) == null
      case IsNotNull(a) => a == "length" || strVal(a) != null
      case And(l, r) => eval(l) && eval(r)
      case Or(l, r) => eval(l) || eval(r)
      case Not(c) => !eval(c)
      case other =>
        throw new IllegalStateException(s"unpushable filter slipped through: $other")
    }
    filters.forall(eval)
  }
}
