package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over a WARC landing directory — the online
  * half of the ingest story: a crawler drops `*.warc.gz` segments into
  * a directory and `spark.readStream.format("warc")` tails it.
  *
  * Offsets are the sorted set of files already visible (the same model
  * as Spark's own FileStreamSource seen-log): a batch is
  * `end.files \ start.files`, one InputPartition per new file. Segment
  * files must be immutable once visible — the WARC convention (crawlers
  * write to a temp name and rename) — so re-listing is idempotent and a
  * restart from a committed offset re-reads nothing.
  *
  * The offset JSON carries file names, not positions, so recovery is
  * exact under out-of-order arrival (a late file sorting earlier than
  * already-processed names is still new and still gets its own
  * partition).
  */
private[sources] class WarcMicroBatchStream(
    required: StructType,
    typeFilter: Option[Set[String]],
    options: Map[String, String]) extends MicroBatchStream {

  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())

  private def listNow(): Seq[String] = WarcDataSource.resolvePaths(options)

  override def initialOffset(): Offset = WarcOffset(Seq.empty)

  override def latestOffset(): Offset = WarcOffset(listNow().sorted)

  override def deserializeOffset(json: String): Offset =
    WarcOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcOffset].files.toSet
    end.asInstanceOf[WarcOffset].files
      .filterNot(seen)
      .map(p => WarcInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required, typeFilter, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = sorted list of visible files, JSON-encoded. */
private[graft] case class WarcOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

private[graft] object WarcOffset {
  def fromJson(json: String): WarcOffset = {
    // minimal JSON string-array parse (offsets are self-authored)
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) WarcOffset(Seq.empty)
    else WarcOffset(body.split("\",\\s*\"").toSeq
      .map(_.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\")))
  }
}
