package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("warc")` — batch DataSource V2 over WARC/WET/ARC
  * files (plain or per-member `.warc.gz`), the container format of
  * Common Crawl.
  *
  * Scale design:
  *  - **one InputPartition per file**: gzip members are not splittable
  *    without a sync-scan, and web corpora ship as very many ~1 GiB
  *    segment files (Common Crawl: ~72k WARCs per monthly crawl), so
  *    file granularity saturates any executor count; a directory listing
  *    is the only driver-side state.
  *  - **column pruning reaches the parser**: when `payload` is not in
  *    the required schema the reader SKIPS the payload bytes instead of
  *    materializing them — a WET metadata scan reads headers only.
  *  - **record-type pushdown**: `warc_type = 'response'` (or IN) is
  *    evaluated on the headers BEFORE payload materialization, so
  *    filtered-out records cost a skip, not a copy. Pushed filters are
  *    also re-applied by Spark above the scan (they are returned as
  *    residuals), keeping the contract conservative.
  */
class WarcDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

object WarcDataSource {
  /** Fixed read schema. `headers` keeps every raw header (original
    * casing) for anything not promoted to a typed column. */
  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", TimestampType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("payload", BinaryType),
    StructField("path", StringType),
    StructField("record_offset", LongType)))

  /** Expand `path`/`paths` options to concrete file paths (directories
    * recurse one level; glob patterns expand) — driver-side, listing
    * only. */
  def resolvePaths(options: Map[String, String]): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val declared = options.get("paths")
      .map(p => p.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
      .getOrElse(options.get("path").toSeq)
    declared.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matches: Seq[FileStatus] =
        Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }.map(_.getPath.toString)
    }.sorted
  }
}

private[sources] class WarcTable(props: Map[String, String]) extends Table with SupportsRead {
  private lazy val paths = WarcDataSource.resolvePaths(props)
  override def name(): String = s"warc(${props.getOrElse("path", "?")})"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths, props)
}

private[sources] class WarcScanBuilder(paths: => Seq[String], props: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = WarcDataSource.schema
  private var typeFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("warc_type", _: String) => true
      case In("warc_type", vs) if vs.forall(_.isInstanceOf[String]) => true
      case IsNotNull("warc_type") => true
      case _ => false
    }
    pushed = accepted
    val wanted = accepted.flatMap {
      case EqualTo(_, v: String) => Seq(Set(v))
      case In(_, vs) => Seq(vs.map(_.asInstanceOf[String]).toSet)
      case _ => Seq.empty
    }
    if (wanted.nonEmpty) typeFilter = Some(wanted.reduce(_ intersect _))
    // conservative: hand every filter back as residual so Spark
    // re-applies them above the scan
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new WarcScan(paths, required, typeFilter, props)
}

private[sources] class WarcScan(
    paths: => Seq[String],
    required: StructType,
    typeFilter: Option[Set[String]],
    props: Map[String, String] = Map.empty) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val tf = typeFilter.map(s => s.mkString("warc_type IN (", ",", ")"))
      .getOrElse("*")
    s"WarcScan[$tf, cols=${required.fieldNames.mkString(",")}]"
  }
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => WarcInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    // serializable snapshot of the Hadoop conf for executor-side opens
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    WarcReaderFactory(required, typeFilter, conf)
  }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(required, typeFilter, props)
}

private[sources] case class WarcInputPartition(path: String) extends InputPartition

/** Minimal serializable Hadoop Configuration carrier (the stock class
  * is not Serializable; Spark's own wrapper is private). */
private[sources] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] case class WarcReaderFactory(
    required: StructType,
    typeFilter: Option[Set[String]],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcInputPartition].path,
      required, typeFilter, conf.value)
}

private[sources] class WarcPartitionReader(
    pathStr: String,
    required: StructType,
    typeFilter: Option[Set[String]],
    conf: Configuration) extends PartitionReader[InternalRow] {

  private val path = new Path(pathStr)
  private val in = path.getFileSystem(conf).open(path)
  private val needPayload = required.fieldNames.contains("payload")

  private def headerVal(hs: Seq[(String, String)], n: String): Option[String] =
    hs.collectFirst { case (k, v) if k.equalsIgnoreCase(n) => v }

  // a record whose type is filtered out, or whose payload column is
  // pruned, never materializes its payload bytes
  private val iter = WarcFormat.records(in, pathStr.endsWith(".gz"),
    skipPayload = hs => !needPayload || typeFilter.exists(tf =>
      !headerVal(hs, "WARC-Type").exists(tf.contains)))
    .filter(r => typeFilter.forall(tf => r.warcType.exists(tf.contains)))

  private var current: WarcFormat.Record = _

  override def next(): Boolean = {
    if (iter.hasNext) { current = iter.next(); true } else false
  }

  override def get(): InternalRow = {
    val r = current
    val values = required.fields.map { f =>
      f.name match {
        case "record_id" => r.recordId.map(UTF8String.fromString).orNull
        case "warc_type" => r.warcType.map(UTF8String.fromString).orNull
        case "target_uri" => r.targetUri.map(UTF8String.fromString).orNull
        case "warc_date" => r.dateMicros.map(Long.box).orNull
        case "content_type" => r.contentType.map(UTF8String.fromString).orNull
        case "content_length" => Long.box(
          headerVal(r.headers, "Content-Length").map(_.toLong)
            .getOrElse(r.payload.length.toLong))
        case "headers" => new ArrayBasedMapData(
          new GenericArrayData(r.headers.map(h => UTF8String.fromString(h._1))),
          new GenericArrayData(r.headers.map(h => UTF8String.fromString(h._2))))
        case "payload" => r.payload
        case "path" => UTF8String.fromString(pathStr)
        case "record_offset" => Long.box(r.offset)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def close(): Unit = in.close()
}
