package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, Streaming}

/** Production-posture pin: every stateful streaming family runs — and
  * produces bitwise-identical output — on the RocksDB state-store
  * provider (`RocksDBStateStoreProvider`), the provider real
  * deployments use for large state. One case per state family:
  * windowed aggregation, watermarked dropDuplicates,
  * flatMapGroupsWithState (sessionizer), and the
  * TypedImperativeAggregate buffers (top-k pairs, KMV sketch). Each
  * case replays the same micro-batches under the default HDFS-backed
  * provider and under RocksDB and compares row sets exactly; one case
  * additionally asserts the RocksDB metrics surfaced, so the pin
  * cannot silently run on the default provider. */
class RocksDbStateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def t(s: String) = Timestamp.valueOf(s)

  /** Run `build` over three micro-batches of `batches` under the given
    * provider, returning the collected output and whether any state
    * operator reported rocksdb metrics. */
  private def run(
      provider: Option[String], name: String, mode: String,
      batches: Seq[Seq[Event]])(build: DataFrame => DataFrame)
      : (Set[String], Boolean) = {
    val prev = spark.conf.getOption(ProviderKey)
    provider match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Event]
      val q = build(in.toDF()).writeStream.format("memory")
        .queryName(name).outputMode(mode).start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val sawRocks = q.recentProgress.flatMap(_.stateOperators)
        .exists(_.customMetrics.keySet.toArray
          .exists(_.toString.startsWith("rocksdb")))
      q.stop()
      (spark.table(name).collect().map(_.mkString("|")).toSet, sawRocks)
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  // three micro-batches: dup ids, re-deliveries, a watermark-advancing
  // straggler — the shapes that make state stores earn their keep
  private val batches: Seq[Seq[Event]] = Seq(
    (1L to 60L).map(i => Event(i, t("2024-01-01 00:10:00"), i % 5,
      if (i % 3 == 0) "a" else "b", (i % 7).toDouble)),
    (40L to 120L).map(i => Event(i, t("2024-01-01 01:20:00"), i % 5,
      if (i % 3 == 0) "a" else "b", (i % 11).toDouble)) :+
      Event(13, t("2024-01-01 00:10:00"), 3, "a", 6.0), // re-delivery
    Seq(Event(9999, t("2024-01-02 12:00:00"), 1, "a", 0.0)))

  private def pinFamily(name: String, mode: String)
      (build: DataFrame => DataFrame): Unit = {
    val (defaultRows, _) =
      run(None, s"${name}_hdfs", mode, batches)(build)
    val (rocksRows, sawRocks) =
      run(Some(RocksDb), s"${name}_rocks", mode, batches)(build)
    assert(sawRocks, s"$name: no rocksdb state metrics — pin did not engage")
    assert(rocksRows === defaultRows, s"$name: provider changed the rows")
    assert(rocksRows.nonEmpty, s"$name: empty output proves nothing")
  }

  test("windowed aggregation state on RocksDB") {
    pinFamily("wstats", "append")(df =>
      Streaming.windowedEventStats(df, "1 hour", "2 hours"))
  }

  test("watermarked dropDuplicates state on RocksDB") {
    pinFamily("dedup", "append")(df => Streaming.dedupEvents(df))
  }

  test("watermark-TTL doc dedup state on RocksDB") {
    import graft.streaming.StreamDoc
    // the dropDuplicatesWithinWatermark family (streamingDocDedup):
    // its state row carries an expiry timestamp the plain
    // dropDuplicates row lacks, so it pins separately
    val docBatches: Seq[Seq[StreamDoc]] = Seq(
      (1L to 40L).map(i => StreamDoc(i, t("2024-01-01 00:10:00"),
        s"body ${i % 7}")),
      (30L to 80L).map(i => StreamDoc(i, t("2024-01-01 01:20:00"),
        s"body ${i % 11}")) :+
        StreamDoc(3L, t("2024-01-01 00:10:00"), "body 3"), // re-delivery
      Seq(StreamDoc(9999L, t("2024-01-02 12:00:00"), "straggler")))
    def runDocs(provider: Option[String], name: String)
        : (Set[String], Boolean) = {
      val prev = spark.conf.getOption(ProviderKey)
      provider match {
        case Some(p) => spark.conf.set(ProviderKey, p)
        case None => spark.conf.unset(ProviderKey)
      }
      try {
        implicit val sqlCtx = spark.sqlContext
        val in = MemoryStream[StreamDoc]
        val q = Streaming.streamingDocDedup(in.toDS(), "1 hour")
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        docBatches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        val sawRocks = q.recentProgress.flatMap(_.stateOperators)
          .exists(_.customMetrics.keySet.toArray
            .exists(_.toString.startsWith("rocksdb")))
        q.stop()
        (spark.table(name).collect().map(_.mkString("|")).toSet, sawRocks)
      } finally prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
    val (defaultRows, _) = runDocs(None, "docdedup_hdfs")
    val (rocksRows, sawRocks) = runDocs(Some(RocksDb), "docdedup_rocks")
    assert(sawRocks, "docdedup: no rocksdb state metrics — pin did not engage")
    assert(rocksRows === defaultRows, "docdedup: provider changed the rows")
    assert(rocksRows.nonEmpty)
  }

  test("flatMapGroupsWithState sessionizer state on RocksDB") {
    pinFamily("sessions", "append")(df =>
      Streaming.sessionize(df.as[Event], gapSeconds = 1800, "10 minutes")
        .toDF())
  }

  test("typed-imperative top-k buffers on RocksDB") {
    pinFamily("topk", "append")(df =>
      Streaming.streamingTopKPerKey(df, col("event_type"),
        col("value"), col("event_id"), k = 5))
  }

  test("KMV sketch buffers on RocksDB") {
    pinFamily("kmv", "append")(df =>
      Streaming.streamingKmvSketch(df, col("user_id").cast("string"),
        k = 16, "1 hour", "2 hours"))
  }
}
