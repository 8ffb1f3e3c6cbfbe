package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over a WARC landing directory — the online
  * half of the ingest story: a crawler drops `*.warc.gz` segments into
  * a directory and `spark.readStream.format("warc")` tails it.
  *
  * Offsets are a COMPACTED seen summary (round 9; the all-time sorted
  * file set grew with the crawl's lifetime — ~72k entries per crawl,
  * forever): per parent directory a high-watermark name plus the
  * frontier of seen names above it. `seen(f)` = `f <= watermark(dir)`
  * or `f` in the frontier. The watermark advances monotonically, and
  * ONLY over a prefix of the current listing every file of which the
  * committed state has seen, always trailing the newest
  * `offsetFrontierKeep` seen names per directory (default 1024, the
  * in-flight bound) — so:
  *
  *  - a GAP (an unseen name between seen ones) holds the watermark
  *    back and its late fill is detected exactly;
  *  - a late arrival sorting within the trailing keep window, or above
  *    it, is detected exactly (the real out-of-order case: parallel
  *    writers whose segment names interleave within minutes);
  *  - only a name sorting below an already-complete, older-than-keep
  *    prefix would be silently skipped — excluded by the WARC segment
  *    naming convention (serial/timestamp-monotone names per
  *    directory; crawlers write to a temp name and rename). Set
  *    `offsetFrontierKeep=-1` to disable compaction and restore the
  *    exact full-set offsets at any scale.
  *
  * A batch stays enumerable from the offsets alone: `latestOffset`
  * advances the watermark only over files the committed anchor has
  * seen — never over the batch's own new files — so
  * `planInputPartitions(start, end)` is exactly
  * `end.frontier \ seen(start)`. Segment files must be immutable once
  * visible, so re-listing is idempotent and a restart from a committed
  * offset re-reads nothing.
  */
private[graft] class WarcMicroBatchStream(
    required: StructType,
    typeFilter: Option[Set[String]],
    options: Map[String, String])
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())

  // DSv2 hands the table properties with their ORIGINAL key case
  private val frontierKeep: Int = options.collectFirst {
    case (k, v) if k.equalsIgnoreCase("offsetFrontierKeep") => v.toInt
  }.getOrElse(1024)

  private def listNow(): Seq[String] = WarcDataSource.resolvePaths(options)

  /** Committed progress (last committed / recovered offset): the
    * reference `latestOffset` compacts against. Merges are monotone,
    * so the engine's deserialize/commit call order cannot regress it. */
  @volatile private var anchor: WarcOffset = WarcOffset.empty

  override def initialOffset(): Offset = WarcOffset.empty

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Trigger.AvailableNow universe: the listing frozen at query start,
    * so repeated triggers converge. Implementing
    * [[SupportsTriggerAvailableNow]] OURSELVES matters beyond the
    * snapshot: Spark's fallback AvailableNowDataStreamWrapper fetches
    * the end offset via `latestOffset(getInitialOffset(), ...)` — the
    * committed start never reaches the source there, and the offset
    * could not compact on restart. */
  @volatile private var availableNowSnapshot: Option[Seq[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(listNow().sorted)

  /** SupportsAdmissionControl entry: the engine hands the COMMITTED
    * start offset directly — exactly the anchor the compaction needs
    * (the 0-arg fallback relies on deserialize/commit having fed the
    * anchor first). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    Option(start).foreach(o =>
      anchor = anchor.merge(o.asInstanceOf[WarcOffset]))
    latestOffset()
  }

  override def latestOffset(): Offset = {
    val a = anchor
    val listing = availableNowSnapshot.getOrElse(listNow().sorted)
    val fresh = listing.filterNot(a.seen)
    if (fresh.isEmpty) a
    else if (frontierKeep < 0) {
      // compaction disabled: classic full-set offset (wm never set)
      WarcOffset(a.watermarks,
        ((a.frontier ++ fresh).distinct).sorted)
    } else {
      val freshSet = fresh.toSet
      // per directory: the longest listed prefix the COMMITTED anchor
      // has fully seen, minus the trailing keep window
      val wm = listing.groupBy(WarcOffset.parentDir).flatMap {
        case (d, fs) =>
          val seenPrefix = fs.takeWhile(f => !freshSet(f) && a.seen(f))
          val advanced =
            if (seenPrefix.length > frontierKeep)
              Some(seenPrefix(seenPrefix.length - frontierKeep - 1))
            else None
          val w = (a.watermarks.get(d).toSeq ++ advanced.toSeq)
            .sorted.lastOption // monotone: never regress a watermark
          w.map(d -> _)
      }
      val frontier = (a.frontier ++ fresh).distinct
        .filterNot(f => wm.get(WarcOffset.parentDir(f)).exists(f <= _))
        .sorted
      WarcOffset(wm, frontier)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val o = WarcOffset.fromJson(json)
    anchor = anchor.merge(o)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val st = start.asInstanceOf[WarcOffset]
    end.asInstanceOf[WarcOffset].frontier
      .filterNot(st.seen)
      .map(p => WarcInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required, typeFilter, conf)

  override def commit(end: Offset): Unit =
    anchor = anchor.merge(end.asInstanceOf[WarcOffset])

  override def stop(): Unit = ()
}

/** Compacted seen summary: per-directory high-watermark + the frontier
  * of seen names above it (see [[WarcMicroBatchStream]]). The legacy
  * all-files form is `WarcOffset(files)` (no watermarks); its JSON is
  * still parseable for recovery from pre-compaction offset logs. */
private[graft] case class WarcOffset(
    watermarks: Map[String, String], frontier: Seq[String]) extends Offset {

  @transient private lazy val frontierSet = frontier.toSet

  def seen(f: String): Boolean =
    watermarks.get(WarcOffset.parentDir(f)).exists(f <= _) || frontierSet(f)

  /** Monotone union of two summaries: per-dir max watermark, merged
    * frontier with under-watermark names dropped. */
  def merge(o: WarcOffset): WarcOffset = {
    val wm = (watermarks.keySet ++ o.watermarks.keySet).map { d =>
      d -> (watermarks.get(d).toSeq ++ o.watermarks.get(d).toSeq).max
    }.toMap
    val fr = (frontier ++ o.frontier).distinct
      .filterNot(f => wm.get(WarcOffset.parentDir(f)).exists(f <= _))
      .sorted
    WarcOffset(wm, fr)
  }

  private def arr(xs: Seq[String]): String =
    xs.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")

  override def json(): String = {
    // watermarks as a flat sorted (dir, name) alternation — only
    // string arrays, so one escaped-string parser serves both fields
    val wmFlat = watermarks.toSeq.sortBy(_._1)
      .flatMap { case (d, w) => Seq(d, w) }
    "{\"wm\":" + arr(wmFlat) + ",\"fr\":" + arr(frontier) + "}"
  }
}

private[graft] object WarcOffset {
  val empty: WarcOffset = WarcOffset(Map.empty, Seq.empty)

  /** Legacy form: a plain seen-file set (no watermarks). */
  def apply(files: Seq[String]): WarcOffset = WarcOffset(Map.empty, files)

  private[graft] def parentDir(f: String): String = {
    val i = f.lastIndexOf('/')
    if (i < 0) "" else f.substring(0, i)
  }

  private def parseArr(body: String): Seq[String] = {
    val t = body.trim
    if (t.isEmpty) Seq.empty
    else t.split("\",\\s*\"").toSeq
      .map(_.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  def fromJson(json: String): WarcOffset = {
    val t = json.trim
    if (t.startsWith("[")) {
      // pre-compaction offset log: plain file array
      WarcOffset(parseArr(t.stripPrefix("[").stripSuffix("]")))
    } else {
      // {"wm":[...],"fr":[...]} — the "],\"fr\":[" separator cannot
      // occur inside an escaped string (embedded quotes are \")
      val body = t.stripPrefix("{").stripSuffix("}")
      val parts = body.split("\\],\\s*\"fr\":\\s*\\[")
      val wmFlat = parseArr(
        parts(0).trim.stripPrefix("\"wm\":").trim.stripPrefix("["))
      val fr =
        if (parts.length > 1) parseArr(parts(1).trim.stripSuffix("]"))
        else Seq.empty
      val wm = wmFlat.grouped(2).collect {
        case Seq(d, w) => d -> w
      }.toMap
      WarcOffset(wm, fr)
    }
  }
}
