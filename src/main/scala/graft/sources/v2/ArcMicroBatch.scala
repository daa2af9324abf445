package graft.sources.v2

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Streaming flavor of the `graft-arc` scan: each micro-batch processes
  * the archive files that arrived since the last batch — the Spark-native
  * form of the reference's incremental segment model (each crawl phase
  * consumes the segment directories newer than its last watermark,
  * CrawlDBMergeJob-style), with exactly-once file-level semantics from
  * the streaming engine's offset log.
  *
  * The offset is the count of files in lexicographic filename order.
  * Archives are assumed to arrive with monotonically increasing names
  * (the reference names archives by timestamp/segment id, so this holds
  * in practice); a file sorting before the high-water mark would be
  * treated as already processed.
  */
final case class ArcStreamOffset(fileCount: Int) extends Offset {
  override def json(): String = s"""{"fileCount":$fileCount}"""
}

final class ArcMicroBatchStream(scan: ArcScan) extends MicroBatchStream {

  private def sortedFiles() = scan.listFilesForStream()

  override def initialOffset(): Offset = ArcStreamOffset(0)

  override def latestOffset(): Offset = ArcStreamOffset(sortedFiles().length)

  override def deserializeOffset(json: String): Offset =
    ArcStreamOffset("\\d+".r.findFirstIn(json).map(_.toInt).getOrElse(0))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ArcStreamOffset].fileCount
    val to = end.asInstanceOf[ArcStreamOffset].fileCount
    sortedFiles().slice(from, to).map { st =>
      ArcInputPartition(st.getPath.toString, st.getLen, Array.empty): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.readerFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
