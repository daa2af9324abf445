package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** ZIP container census — entry count, size totals, compression-ratio
  * bomb signal, document-kind classification (OOXML / EPUB / plain),
  * and stored-entry CRC verification. A large share of crawl "binary"
  * traffic is ZIP in disguise: docx/xlsx/pptx (OOXML), epub, jar — the
  * reference records the outer mime (`ParserMapper.java:941-1101`) and
  * stops. A corpus pipeline needs the census before extraction: bomb
  * ratios gate decompression, the kind routes the file to the right
  * text extractor, CRC mismatches mark truncated fetches.
  *
  * APPNOTE.TXT layout (public spec): End-Of-Central-Directory record
  * (PK\5\6) found by bounded backward scan (it may be followed by a
  * comment), then the central directory (PK\1\2 entries carrying name,
  * method, sizes, CRC, local-header offset), then per-entry local
  * headers (PK\3\4) for data access. Every offset/length is untrusted:
  * bounds-checked against the file, entry counts and name lengths
  * budgeted, the walk never inflates anything (census only; STORED
  * entries are CRC-checked byte-for-byte, DEFLATE data is only sized).
  */
object Zip {

  private[graft] final case class Meta(
      kind: String, nEntries: Long, sumComp: Long, sumUncomp: Long,
      maxRatioPpm: Long, nStored: Long, nDeflate: Long,
      firstName: String, crcOk: Boolean)

  private val MaxEntries = 1 << 16
  private val MaxNameLen = 4096

  // ------------------------------------------------------------------
  // walk
  // ------------------------------------------------------------------

  private[graft] def zipMeta(bytes: Array[Byte]): Meta =
    // NonFatal net: a corpus walker must NEVER fail the task on one
    // adversarial object — any defect escaping the explicit bounds
    // checks degrades to the null sentinel, not a job abort
    try zipMetaImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => null }

    private def zipMetaImpl(bytes: Array[Byte]): Meta = {
    if (bytes == null || bytes.length < 22) return null
    val n = bytes.length
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)

    // EOCD backward scan (comment can trail it; spec caps comment at 64K)
    var eocd = -1
    var i = n - 22
    val stop = math.max(0, n - 22 - 65535)
    while (eocd < 0 && i >= stop) {
      if (u8(i) == 0x50 && u8(i + 1) == 0x4b && u8(i + 2) == 0x05 &&
          u8(i + 3) == 0x06 && i + 22 + u16(i + 20) == n) eocd = i
      i -= 1
    }
    if (eocd < 0) return null
    val total = u16(eocd + 10)
    val cdSize = u32(eocd + 12)
    val cdOff = u32(eocd + 16)
    if (u16(eocd + 8) != total) return null // single-disk archives only
    if (total > MaxEntries) return null
    if (cdOff < 0 || cdSize < 0 || cdOff + cdSize > eocd) return null

    var p = cdOff.toInt
    val cdEnd = (cdOff + cdSize).toInt
    var nEntries = 0L
    var sumComp = 0L; var sumUncomp = 0L
    var maxRatio = 0L
    var nStored = 0L; var nDeflate = 0L
    var firstName: String = null
    var crcOk = true
    var hasContentTypes = false
    var epubMime = false

    while (nEntries < total) {
      if (p + 46 > cdEnd || u32(p) != 0x02014b50L) return null
      val method = u16(p + 10)
      val crc = u32(p + 16)
      val comp = u32(p + 20)
      val uncomp = u32(p + 24)
      val nameLen = u16(p + 28)
      val extraLen = u16(p + 30)
      val cmtLen = u16(p + 32)
      val lho = u32(p + 42)
      if (nameLen > MaxNameLen || p + 46 + nameLen + extraLen + cmtLen > cdEnd)
        return null
      val name = new String(bytes, p + 46, nameLen, "UTF-8")
      if (firstName == null) firstName = name
      if (name == "[Content_Types].xml") hasContentTypes = true
      if (comp < 0 || uncomp < 0) return null
      sumComp += comp; sumUncomp += uncomp
      if (comp > 0) {
        val r = uncomp * 1000000L / comp
        if (r > maxRatio) maxRatio = r
      }
      method match {
        case 0 =>
          nStored += 1
          if (comp != uncomp) return null
          // verify via the local header — census-grade integrity check
          if (lho < 0 || lho + 30 > n || u32(lho.toInt) != 0x04034b50L)
            return null
          val lNameLen = u16(lho.toInt + 26)
          val lExtraLen = u16(lho.toInt + 28)
          val dataAt = lho + 30 + lNameLen + lExtraLen
          if (dataAt + comp > n) return null
          val c = new java.util.zip.CRC32()
          c.update(bytes, dataAt.toInt, comp.toInt)
          if (c.getValue != crc) crcOk = false
          if (name == "mimetype") {
            val v = new String(bytes, dataAt.toInt, comp.toInt, "ISO-8859-1")
            if (v == "application/epub+zip") epubMime = true
          }
        case 8 => nDeflate += 1 // sized, never inflated here
        case _ => return null // other methods outside the census tier
      }
      p += 46 + nameLen + extraLen + cmtLen
      nEntries += 1
    }

    val kind =
      if (hasContentTypes) "ooxml"
      else if (epubMime) "epub"
      else "zip"
    Meta(kind, nEntries, sumComp, sumUncomp, maxRatio, nStored, nDeflate,
      firstName, crcOk)
  }

  // ------------------------------------------------------------------
  // fixture encoder
  // ------------------------------------------------------------------

  /** Deterministic all-STORED ZIP: k%12+1 payload entries of analytic
    * text, plus a kind-marker entry (k%3: OOXML content-types / EPUB
    * mimetype / none); real CRC-32s, exact offsets. STORED keeps every
    * byte analytic (no Deflater version dependence); method variety is
    * exercised in ZipSpec against JDK-written archives. */
  private[graft] def encodeZip(docId: Long, lang: String): Array[Byte] = {
    val k = ((docId % 251) + 251) % 251
    val out = new java.io.ByteArrayOutputStream()
    val cd = new java.io.ByteArrayOutputStream()
    var nEntries = 0
    def u16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
    }
    def u32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
      b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
    }
    def entry(name: String, data: Array[Byte]): Unit = {
      val lho = out.size().toLong
      val nb = name.getBytes("UTF-8")
      val c = new java.util.zip.CRC32()
      c.update(data)
      val crc = c.getValue
      // local header
      u32(out, 0x04034b50L); u16(out, 20); u16(out, 0); u16(out, 0)
      u16(out, 0); u16(out, 0) // time/date fixed zero — deterministic
      u32(out, crc); u32(out, data.length.toLong); u32(out, data.length.toLong)
      u16(out, nb.length); u16(out, 0)
      out.write(nb); out.write(data)
      // central record
      u32(cd, 0x02014b50L); u16(cd, 20); u16(cd, 20); u16(cd, 0); u16(cd, 0)
      u16(cd, 0); u16(cd, 0)
      u32(cd, crc); u32(cd, data.length.toLong); u32(cd, data.length.toLong)
      u16(cd, nb.length); u16(cd, 0); u16(cd, 0); u16(cd, 0); u16(cd, 0)
      u32(cd, 0L); u32(cd, lho)
      cd.write(nb)
      nEntries += 1
    }
    k % 3 match {
      case 0 => entry("[Content_Types].xml",
        s"<Types doc='$docId'/>".getBytes("UTF-8"))
      case 1 => entry("mimetype", "application/epub+zip".getBytes("UTF-8"))
      case _ => ()
    }
    for (i <- 0 until (k % 12 + 1).toInt)
      entry(s"part/e$i.txt",
        s"entry $i of doc $docId in $lang".getBytes("UTF-8"))
    val cdOff = out.size().toLong
    val cdBytes = cd.toByteArray
    out.write(cdBytes)
    u32(out, 0x06054b50L); u16(out, 0); u16(out, 0)
    u16(out, nEntries); u16(out, nEntries)
    u32(out, cdBytes.length.toLong); u32(out, cdOff); u16(out, 0)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark surface
  // ------------------------------------------------------------------

  def packZip(id: Column, lang: Column): Column = {
    val enc = udf((d: Long, l: String) => encodeZip(d, l))
    enc(id.cast("long"), lang)
  }

  private val MetaSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("n_entries", LongType, nullable = false),
    StructField("sum_comp", LongType, nullable = false),
    StructField("sum_uncomp", LongType, nullable = false),
    StructField("max_ratio_ppm", LongType, nullable = false),
    StructField("n_stored", LongType, nullable = false),
    StructField("n_deflate", LongType, nullable = false),
    StructField("first_name", StringType, nullable = true),
    StructField("crc_ok", LongType, nullable = false)))

  /** ZIP census over the house per-partition seam; null/-1 sentinel on
    * malformed input. */
  def decodeZipMeta(df: DataFrame, id: String, media: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(id).cast("long"), col(media)).rdd.mapPartitions { it =>
      it.map { r =>
        val m = zipMeta(r.getAs[Array[Byte]](1))
        if (m == null)
          Row(r.getLong(0), null, -1L, -1L, -1L, -1L, -1L, -1L, null, 0L)
        else
          Row(r.getLong(0), m.kind, m.nEntries, m.sumComp, m.sumUncomp,
            m.maxRatioPpm, m.nStored, m.nDeflate, m.firstName,
            if (m.crcOk) 1L else 0L)
      }
    }
    spark.createDataFrame(rdd, MetaSchema)
  }
}
