package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, Streaming}

/** Structured-Streaming operator tests over MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def runToMemory[T](df: org.apache.spark.sql.Dataset[T],
      name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("windowedEventStats aggregates tumbling event-time windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, t("2024-01-01 00:10:00"), 1, "click", 2.0),
      Event(2, t("2024-01-01 00:40:00"), 2, "click", 4.0),
      Event(3, t("2024-01-01 01:10:00"), 1, "view", 6.0),
      Event(4, t("2024-01-01 05:00:00"), 3, "click", 1.0)) // advances watermark
    runToMemory(Streaming.windowedEventStats(in.toDF(), "1 hour", "2 hours"),
      "wstats", "append")
    val rows = spark.table("wstats").collect()
      .map(r => (r.getTimestamp(0).toString.take(13), r.getString(1),
        r.getAs[Long]("n"), r.getAs[Double]("total"))).toSet
    assert(rows.contains(("2024-01-01 00", "click", 2L, 6.0)))
    assert(rows.contains(("2024-01-01 01", "view", 1L, 6.0)))
  }

  test("windowedCorrelation computes per-window Pearson corr incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double, Double)]
    in.addData(
      (t("2024-01-01 01:00:00"), 1.0, 2.0),
      (t("2024-01-01 02:00:00"), 2.0, 4.0),
      (t("2024-01-01 03:00:00"), 3.0, 6.0),
      (t("2024-01-03 01:00:00"), 0.0, 0.0)) // closes the first day's window
    val df = in.toDF().toDF("ts", "x", "y")
    runToMemory(Streaming.windowedCorrelation(df, "x", "y", "1 day", "1 day"),
      "wcorr", "append")
    val rows = spark.table("wcorr").collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        r.getAs[Double]("correlation")).toMap
    assertClose(rows("2024-01-01"), 1.0, 1e-9)
  }

  test("dedupEvents drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, t("2024-01-01 00:00:00"), 1, "click", 1.0),
      Event(1, t("2024-01-01 00:00:00"), 1, "click", 1.0), // dup
      Event(2, t("2024-01-01 00:05:00"), 2, "view", 2.0))
    runToMemory(Streaming.dedupEvents(in.toDF()).select("event_id"),
      "dedup", "append")
    val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L))
  }

  test("streamingAsOf enriches probes with the latest prior reference") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // batch 1: view then click (match), click before any view (no match)
    in.addData(
      Event(10, t("2024-01-01 00:00:00"), 1, "view", 1.0),
      Event(11, t("2024-01-01 00:05:00"), 1, "click", 9.0),
      Event(12, t("2024-01-01 00:01:00"), 2, "click", 8.0))
    val out = Streaming.streamingAsOf(in.toDS(), "click", "view")
    val q = out.writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: newer view supersedes, next click picks it up
    in.addData(
      Event(13, t("2024-01-01 00:10:00"), 1, "view", 2.0),
      Event(14, t("2024-01-01 00:15:00"), 1, "click", 7.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("ref_event_id")).map(_.toLong)).toMap
    assert(rows(11L) === Some(10L)) // same-batch match
    assert(rows(12L) === None)      // no prior view for user 2
    assert(rows(14L) === Some(13L)) // cross-batch state carries forward
  }

  test("sessionize emits closed sessions after the gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // user 1: two events 10 min apart (one session), then 2h silence,
    // then a new event (opens session 2, closing session 1)
    in.addData(
      Event(1, t("2024-01-01 00:00:00"), 1, "click", 1.0),
      Event(2, t("2024-01-01 00:10:00"), 1, "click", 2.0))
    val out = Streaming.sessionize(in.toDS(), gapSeconds = 1800, "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(Event(3, t("2024-01-01 02:00:00"), 1, "view", 5.0))
    q.processAllAvailable()
    // one more batch so the event-time timeout fires after the watermark move
    in.addData(Event(4, t("2024-01-01 06:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))
    assert(rows.contains((1L, 2L, 3.0))) // the closed first session
  }

  test("streamingNearDups flags near-identical later docs against the representative") {
    import graft.streaming.{NearDupHit, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 38).map(i => s"tok$i").mkString(" ") // J = 36/38
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    val in = MemoryStream[StreamDoc]
    // batch 1: the representative + an unrelated doc
    in.addData(
      StreamDoc(1L, t("2024-01-01 00:00:00"), base),
      StreamDoc(3L, t("2024-01-01 00:01:00"), far))
    val out = Streaming.streamingNearDups(in.toDS(),
      n = 3, numHashes = 16, bands = 4, minJaccard = 0.5)
    val q = out.writeStream.format("memory").queryName("neardups")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: a near-dup of doc 1 arrives later — cross-batch state hit
    in.addData(StreamDoc(2L, t("2024-01-01 00:30:00"), near))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("neardups").as[NearDupHit].collect()
    assert(hits.nonEmpty, "no near-dup hit emitted")
    // every hit is (2 matched against 1); multi-band hits allowed
    assert(hits.forall(h => h.doc_id == 2L && h.prior_id == 1L))
    hits.foreach(h => assertClose(h.jaccard, 36.0 / 38.0, 1e-9))
    // the unrelated doc never appears on either side
    assert(!hits.exists(h => h.doc_id == 3L || h.prior_id == 3L))
    // exactly one hit per distinct pair after the documented downstream dedup
    assert(hits.map(h => (h.doc_id, h.prior_id)).toSet.size === 1)
  }

  test("streamingNearDups replayed over the sf0.001 corpus matches the batch operator") {
    import graft.streaming.{NearDupHit, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // batch ground truth at identical parameters (the q_minhash_neardup
    // configuration)
    val batch = graft.text.Dedup.minHashNearDups(docs, n = 3, numHashes = 16,
      bands = 4, minJaccard = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(batch.nonEmpty, "fixture has no batch near-dup pairs to compare")
    // replay the corpus in doc-id order (strictly increasing event time)
    // across several micro-batches, exercising cross-batch bucket state
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingNearDups(in.toDS(), n = 3, numHashes = 16,
      bands = 4, minJaccard = 0.5)
    val q = out.writeStream.format("memory").queryName("neardups_replay")
      .outputMode("append").start()
    rows.grouped(200).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val hits = spark.table("neardups_replay").as[NearDupHit].collect()
    val streamPairs = hits
      .map(h => (math.min(h.prior_id, h.doc_id), math.max(h.prior_id, h.doc_id)))
      .toSet
    // soundness: every streamed hit is a batch pair with the identical
    // exact-verified jaccard
    streamPairs.foreach(p =>
      assert(batch.contains(p), s"stream flagged non-batch pair $p"))
    hits.foreach { h =>
      val p = (math.min(h.prior_id, h.doc_id), math.max(h.prior_id, h.doc_id))
      assertClose(h.jaccard, batch(p), 1e-9)
    }
    // completeness at the decision level: the streaming operator keeps
    // one representative per bucket, so pairs BETWEEN two non-
    // representative members of one duplicate cluster are flagged via
    // the representative instead of directly (documented trade-off).
    // What must agree is the dedup DECISION — the duplicate clusters
    // (connected components), i.e. which documents get dropped and
    // which representative they collapse onto.
    def components(pairs: Set[(Long, Long)]): Set[Set[Long]] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      parent.keys.groupBy(find).values.map(_.toSet).toSet
    }
    assert(components(streamPairs) === components(batch.keySet),
      "streaming duplicate clusters differ from the batch operator's")
  }

  test("managedParquetSink: atomic appends, periodic in-place compaction, reader consistent") {
    import graft.streaming.StreamDoc
    import graft.operators.Compact
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-msink").toString
    val path = s"$base/t"
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(90).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val q = in.toDS().toDF().writeStream
      .foreachBatch(
        Streaming.managedParquetSink(path, targetBytes = 1L << 26,
          compactEvery = 3L))
      .option("checkpointLocation", s"$base/ck")
      .start()
    var fed = 0L
    rows.grouped(15).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
      fed += chunk.length.toLong
      // reader consistency at EVERY instant of the loop
      assert(Compact.read(spark, path).count() === fed,
        s"managed reader inconsistent after $fed rows")
    }
    q.stop()
    // value equality over the whole feed
    val got = Compact.read(spark, path).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got === rows.map(_.doc_id).sorted.toSeq)
    // 6 batches appended, compactions fired after batches 3 and 6 —
    // the LIVE small-file tail is bounded (one packed file), not 6+
    // parts; superseded inputs are tombstoned on disk until vacuum
    val st = Compact.tableState(spark, path).get
    assert(st.live.length === 1,
      s"small-file tail not compacted: ${st.live}")
    // the sink recorded its txn token: batch ids 0..5 committed
    assert(st.txns === Map("graft-managed-sink" -> 5L))
    assert(Compact.recoverSwap(spark, path).startsWith("clean"))
    // vacuum past the horizon leaves exactly the live file on disk
    Compact.vacuum(spark, path, 0L,
      System.currentTimeMillis() + (1L << 40)): Unit
    val onDisk = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(onDisk.length === 1,
      s"vacuum left garbage: ${onDisk.map(_.getName).toSeq}")
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("_GRAFT_MANIFEST-g")) === 1)
  }

  test("managedParquetSink is idempotent under foreachBatch replay — " +
      "a retried batch id appends nothing") {
    import graft.operators.Compact
    val base = java.nio.file.Files.createTempDirectory("graft-mtxn").toString
    val path = s"$base/t"
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(40)
    val b0 = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val b1 = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val sink = Streaming.managedParquetSink(path, targetBytes = 1L << 26,
      compactEvery = 0L)
    val n0 = b0.count(); val n1 = b1.count()

    sink(b0, 0L)
    assert(Compact.read(spark, path).count() === n0)
    // the at-least-once crash window: Structured Streaming re-runs
    // batch 0 after a failure between the sink's manifest commit and
    // the stream's checkpoint commit — the txn token must no-op it
    sink(b0, 0L)
    assert(Compact.read(spark, path).count() === n0,
      "replayed batch id duplicated rows")
    sink(b1, 1L)
    assert(Compact.read(spark, path).count() === n0 + n1)
    // a replay arriving even later (checkpoint lost both commits)
    // still no-ops: the manifest remembers the HIGHEST committed id
    sink(b0, 0L)
    sink(b1, 1L)
    assert(Compact.read(spark, path).count() === n0 + n1)
    val st = Compact.tableState(spark, path).get
    assert(st.txns === Map("graft-managed-sink" -> 1L))
    // distinct values never doubled
    assert(Compact.read(spark, path).select("doc_id").distinct().count()
      === n0 + n1)
    // a second WRITER with its own app id is tracked independently
    Compact.appendManaged(spark, path, b0.limit(1),
      txn = Some(("other-writer", 0L))): Unit
    assert(Compact.read(spark, path).count() === n0 + n1 + 1L)
    assert(Compact.tableState(spark, path).get.txns ===
      Map("graft-managed-sink" -> 1L, "other-writer" -> 0L))
    // and compaction CARRIES the tokens forward (a post-compaction
    // replay must still no-op)
    Compact.binPackInPlace(spark, path, targetBytes = 1L << 26): Unit
    sink(b1, 1L)
    assert(Compact.read(spark, path).count() === n0 + n1 + 1L,
      "compaction dropped the txn tokens — replay duplicated rows")
  }

  test("managedParquetSinkPartitioned: per-leaf exactly-once appends with " +
      "partitioned compaction and vacuum in the loop") {
    import graft.operators.Compact
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-mpart").toString
    val path = s"$base/t"
    def mk(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, (i % 3).toLong)).toDF("id", "p")
    def ids() = Compact.readPartitioned(spark, path)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // a strictly-advancing injected clock so every compaction's
    // tombstones age past the zero-retention horizon by vacuum time
    var now = 1000000L
    val clock = () => { now += 1000000L; now }
    val sink = Streaming.managedParquetSinkPartitioned(path, Seq("p"),
      targetBytes = 1L << 26, compactEvery = 2L,
      vacuumEvery = 4L, retentionMillis = 0L, clock = clock)

    sink(mk(0, 30), 0L)
    assert(ids() === (0L until 30L))
    sink(mk(0, 30), 0L) // the at-least-once replay window
    assert(ids() === (0L until 30L), "replayed batch duplicated rows")
    sink(mk(30, 60), 1L) // compaction fires after this batch
    sink(mk(60, 90), 2L)
    sink(mk(30, 60), 1L) // late replay after a compaction: still no-op
    sink(mk(90, 120), 3L) // compaction + vacuum fire after this batch
    assert(ids() === (0L until 120L))
    // every leaf carries the sink's token at the last committed batch
    (0 to 2).foreach { pv =>
      assert(Compact.tableState(spark, s"$path/p=$pv").get.txns ===
        Map("graft-managed-sink" -> 3L), s"leaf p=$pv token wrong")
    }
    // the final sink call compacted then vacuumed (the advancing
    // clock ages each compaction's tombstones past the horizon); one
    // idempotent extra pass, then each leaf's on-disk files must be
    // exactly its live set
    Compact.vacuumPartitioned(spark, path, 0L, clock()): Unit
    (0 to 2).foreach { pv =>
      val leaf = new java.io.File(s"$path/p=$pv")
      val parts = leaf.listFiles().filter(_.getName.startsWith("part-"))
      val st = Compact.tableState(spark, s"$path/p=$pv").get
      assert(st.live.length === parts.length.toLong,
        s"leaf p=$pv on-disk files diverge from the live set")
      assert(st.live.length <= 2, s"leaf p=$pv small-file tail unbounded")
    }
    assert(Compact.recoverSwapPartitioned(spark, path).startsWith("clean"))
  }

  test("streamingScrubStack replays the batch scrub-stack card bitwise") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val dict = Seq("table" -> "TBL", "ta" -> "tX", "le" -> "lY")
    val lits = Seq("TBL", "tX", "a a", "table", "agg", "zzqx")
    // the composition trio: "tX" exists only post-canon (minted), the
    // b..ch shape survives the dictionary and the literal mask, the
    // digit shape is absent (see the q_scrub_stack needle notes)
    val needles = Seq(("tX[a-z]+", "tX", 0), ("b[a-z]{2}ch", "ch", 3),
      ("[0-9]{3}-[0-9]{2}", "-", 3))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(60)
    def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") -> ((
      r.getAs[Long]("n_canon"), r.getAs[Long]("n_lit_hits"),
      r.getAs[Long]("n_lit_patterns"), r.getAs[Long]("n_rx_hits"),
      r.getAs[Long]("n_rx_patterns"), r.getAs[Long]("n_masked_lit"),
      r.getAs[Long]("n_masked_rx"), r.getAs[Boolean]("clean"),
      r.getAs[String]("scrubbed")))
    val batch = graft.text.Blocklist.scrubStack(docs, dict, lits, needles)
      .collect().map(key).toMap
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val q = Streaming.streamingScrubStack(in.toDS(), dict, lits, needles)
      .writeStream.format("memory").queryName("scrub_stack_stream")
      .outputMode("append").start()
    rows.grouped(20).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("scrub_stack_stream").collect()
      .map(key).toMap
    assert(streamed === batch)
    // the composed stages really fired on this fixture: canon
    // rewrote, the rx gate saw the MINTED needle, and the rx
    // redaction masked the canon-surviving shape
    assert(batch.values.exists(_._1 > 0L), "no canonicalization hits")
    assert(batch.values.exists(_._4 > 0L), "no rx gate hits")
    assert(batch.values.exists(_._7 > 0L), "no rx redaction hits")
  }

  test("streamingRxGate and streamingRxRedact replay the batch rx faces exactly, stateless") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val needles = Seq(("ta[a-z]+", "ta", 0), ("[a-z]+ble", "ble", 24),
      ("[0-9]{3}-[0-9]{2}", "-", 3))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(60)
    val batchGate = graft.text.Blocklist.rxGate(docs, needles).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pattern_id")) ->
        r.getAs[Long]("n_hits")).toMap
    val batchRed = graft.text.Blocklist.rxRedact(docs, needles).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("redacted"), r.getAs[Long]("n_masked")))).toMap
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val qg = Streaming.streamingRxGate(in.toDS(), needles)
      .writeStream.format("memory").queryName("rx_gate_stream")
      .outputMode("append").start()
    val qr = Streaming.streamingRxRedact(in.toDS(), needles)
      .writeStream.format("memory").queryName("rx_redact_stream")
      .outputMode("append").start()
    rows.grouped(20).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*)
      qg.processAllAvailable(); qr.processAllAvailable()
    }
    qg.stop(); qr.stop()
    val sg = spark.table("rx_gate_stream").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pattern_id")) ->
        r.getAs[Long]("n_hits")).toMap
    assert(sg === batchGate)
    val sr = spark.table("rx_redact_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("redacted"), r.getAs[Long]("n_masked")))).toMap
    assert(sr === batchRed)
    // stateless: pure projections, no aggregation, no watermark needed
    assert(!Streaming.streamingRxGate(in.toDS(), needles)
      .queryExecution.analyzed.toString.contains("Aggregate"))
  }

  test("streamingDocDedup: first arrival wins, re-delivery collapses, watermark purges") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = Streaming.streamingDocDedup(in.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode("append").start()
    in.addData(StreamDoc(1L, t("2024-01-01 00:00:00"), "alpha body"),
      StreamDoc(2L, t("2024-01-01 00:00:10"), "beta body"))
    q.processAllAvailable()
    // re-delivery of doc 1 + an exact duplicate under a NEW id (both
    // drop) + genuinely new content (passes)
    in.addData(StreamDoc(1L, t("2024-01-01 00:00:00"), "alpha body"),
      StreamDoc(3L, t("2024-01-01 00:10:00"), "alpha body"),
      StreamDoc(4L, t("2024-01-01 00:20:00"), "gamma body"))
    q.processAllAvailable()
    // advance the watermark far past alpha's TTL (00:00 + 1h), so its
    // dedup state purges...
    in.addData(StreamDoc(5L, t("2024-01-01 06:00:00"), "delta body"))
    q.processAllAvailable()
    // ...and a much-later duplicate is treated as fresh — the
    // documented TTL trade-off (bounded state over whole-corpus memory)
    in.addData(StreamDoc(6L, t("2024-01-01 06:30:00"), "alpha body"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("doc_dedup").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(1L, 2L, 4L, 5L, 6L))
    // the content hash rides along and matches the batch operator's
    val hashes = spark.table("doc_dedup").collect()
      .map(_.getAs[String]("content_hash")).toSet
    assert(hashes.size === 4) // alpha kept twice across the purge
  }

  test("streamingDocDedup replayed one doc per batch equals the batch keeper set") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    // 30 corpus docs + planted exact duplicates under shifted ids,
    // fed ONE PER BATCH in id order (arrival order == id order, so
    // the stream's first-arrival keeper IS the batch min-id keeper)
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(30).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val planted = base.filter(_._1 % 3 == 0)
      .map { case (id, txt) => (id + 1000L, txt) }
    val feed = (base ++ planted).sortBy(_._1)
    val in = MemoryStream[StreamDoc]
    val q = Streaming.streamingDocDedup(in.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("doc_dedup_replay")
      .outputMode("append").start()
    val t0 = 1704067200000L
    feed.foreach { case (id, txt) =>
      in.addData(StreamDoc(id, new Timestamp(t0 + id * 1000L), txt))
      q.processAllAvailable()
    }
    q.stop()
    val keptIds = spark.table("doc_dedup_replay").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val batchKeepers = graft.text.Dedup.exactDuplicates(
        feed.toSeq.toDF("doc_id", "text"))
      .collect().map(_.getAs[Long]("keep_id")).toSet
    assert(keptIds === batchKeepers,
      s"stream kept $keptIds, batch keeps $batchKeepers")
  }

  test("streamingChunkDedup: first arrival claims a chunk across batches") {
    import graft.streaming.{StreamChunk, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingChunkDedup(in.toDS(), k = 3)
    val q = out.writeStream.format("memory").queryName("chunk_dedup")
      .outputMode("append").start()
    in.addData(StreamDoc(1L, new Timestamp(t0), "a b c x y z"))
    q.processAllAvailable()
    // later batch: duplicate chunk in another doc + within-doc repeat
    in.addData(
      StreamDoc(2L, new Timestamp(t0 + 1000), "a b c q r s"),
      StreamDoc(3L, new Timestamp(t0 + 2000), "q r s q r s"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("chunk_dedup").as[StreamChunk].collect()
      .map(c => (c.doc_id, c.chunk_idx) -> ((c.chunk, c.kept))).toMap
    assert(rows((1L, 0)) === (("a b c", true)))
    assert(rows((1L, 1)) === (("x y z", true)))
    assert(rows((2L, 0)) === (("a b c", false))) // cross-batch duplicate
    assert(rows((2L, 1)) === (("q r s", true)))
    assert(rows((3L, 0)) === (("q r s", false))) // doc 2 claimed it
    assert(rows((3L, 1)) === (("q r s", false))) // within-doc repeat
  }

  test("streamingChunkDedup replayed over the sf0.001 corpus matches batch chunkDedup") {
    import graft.streaming.{StreamChunk, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val batch = graft.text.Rewrite.chunkDedup(docs, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_kept")))).toMap
    // replay in doc-id order (strictly increasing event time) across
    // micro-batches, exercising cross-batch chunk-claim state
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingChunkDedup(in.toDS(), k = 3)
    val q = out.writeStream.format("memory").queryName("chunk_replay")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val kept = spark.table("chunk_replay").as[StreamChunk].collect()
      .filter(_.kept)
    // rebuild each document from its kept chunks, in chunk order
    val rebuilt = kept.groupBy(_.doc_id).map { case (id, cs) =>
      id -> ((cs.sortBy(_.chunk_idx).map(_.chunk).mkString(" "),
        cs.length.toLong))
    }
    rows.foreach { d =>
      val expected = batch(d.doc_id)
      val got = rebuilt.getOrElse(d.doc_id, (("", 0L)))
      assert(got === expected,
        s"doc ${d.doc_id}: stream rebuilt $got, batch $expected")
    }
  }

  test("streamingGopherRules replays the batch gopherRules table exactly") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val batch = graft.text.TextStats.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1)).toMap
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingGopherRules(in.toDS())
    val q = out.writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("gopher_stream").collect()
      // drop doc_id and the passthrough ts column
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(2)).toMap
    assert(streamed.size === batch.size)
    batch.foreach { case (id, expected) =>
      assert(streamed(id) === expected, s"doc $id gopher columns diverge")
    }
    // and it must stay stateless: a pure projection plan, no
    // aggregation, so no watermark is ever needed
    val plan = Streaming.streamingGopherRules(in.toDS())
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingGopherRules must remain a stateless projection")
  }

  test("streamingAudioEnergy replays the batch windows exactly, stateless") {
    import graft.multimodal.{MediaSample, Multimodal, Wav}
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    def wav(id: Long, bytes: Array[Byte]) = MediaSample(id, "audio",
      Wav.encode(Wav.Audio(8000, 1, 8, bytes)), 0, 0, 8000, 0)
    val rows = (1L to 20L).map { id =>
      wav(id, Array.tabulate[Byte]((id % 13 + 5).toInt)(i =>
        (((id * 31 + i * 7) % 90) + 33).toByte))
    }
    val batch = Multimodal.audioEnergyWindows(
        rows.toDS(), windowSamples = 4, silenceMeanSquare = 3000L)
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[MediaSample]
    val out = Streaming.streamingAudioEnergy(in.toDS(),
      windowSamples = 4, silenceMeanSquare = 3000L)
    val q = out.writeStream.format("memory").queryName("audio_stream")
      .outputMode("append").start()
    rows.grouped(7).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("audio_stream").collect().map(_.toSeq).toSet
    assert(streamed === batch && batch.nonEmpty)
    // both silence polarities genuinely exercised
    assert(batch.exists(_.last == true) && batch.exists(_.last == false))
  }

  test("streamingAudioTrim replays the batch trim exactly, payloads included") {
    import graft.multimodal.{MediaSample, Multimodal, Wav}
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    def wav(id: Long, bytes: Array[Byte]) = MediaSample(id, "audio",
      Wav.encode(Wav.Audio(8000, 1, 8, bytes)), 0, 0, 8000, 0)
    // quiet heads/tails around loud bursts + some all-quiet clips
    val rows = (1L to 20L).map { id =>
      wav(id, Array.tabulate[Byte]((id % 17 + 6).toInt) { i =>
        if ((i + id) % 5 == 0 && id % 4 != 0) 228.toByte else 130.toByte
      })
    }
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        r.getAs[Array[Byte]](6).map("%02X".format(_)).mkString)
    }.toSet
    val batch = canon(Multimodal.audioTrim(
      rows.toDS(), windowSamples = 4, silenceMeanSquare = 3000L))
    assert(batch.exists(_._3) && batch.exists(!_._3)) // both polarities
    val in = MemoryStream[MediaSample]
    val out = Streaming.streamingAudioTrim(in.toDS(),
      windowSamples = 4, silenceMeanSquare = 3000L)
    val q = out.writeStream.format("memory").queryName("trim_stream")
      .outputMode("append").start()
    rows.grouped(7).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    assert(canon(spark.table("trim_stream")) === batch)
  }

  test("streamingPhraseGate replays the batch index walk exactly, stateless") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val phrase = Seq("table", "key", "agg")
    // batch truth = the positional-index walk
    val batch = graft.text.Search.phraseSearch(docs, phrase).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "probe phrase must occur in the corpus")
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingPhraseGate(in.toDS(), phrase)
    val q = out.writeStream.format("memory").queryName("phrase_stream")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val gate = spark.table("phrase_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[scala.collection.Seq[Long]]("phrase_starts"),
          r.getAs[Boolean]("has_phrase")))).toMap
    // every document gets a verdict; exploded starts == the index walk
    assert(gate.size === rows.size)
    val streamedStarts = gate.toSeq.flatMap { case (id, (starts, _)) =>
      starts.map(id -> _) }.toSet
    assert(streamedStarts === batch)
    gate.foreach { case (id, (starts, has)) =>
      assert(has === starts.nonEmpty, s"doc $id verdict inconsistent") }
    // stateless: a pure projection plan — no aggregation, no watermark
    val plan = Streaming.streamingPhraseGate(in.toDS(), phrase)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingPhraseGate must remain a stateless projection")
  }

  test("streamingPhraseSetGate replays the batch walk per phrase, stateless") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val phrases = Seq(Seq("table", "key", "agg"), Seq("value", "table"),
      Seq("zzz", "qqq"))
    // batch truth = the multi-phrase batch walk's per-(doc, phrase) counts
    val batch = graft.text.Search.phraseOccurrencesBatch(
        graft.text.Search.buildPositionalIndex(docs), phrases)
      .groupBy("phrase_id", "doc_id").count().collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty && batch.values.sum > 0)
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingPhraseSetGate(in.toDS(), phrases)
    val q = out.writeStream.format("memory").queryName("phrase_set_stream")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val gate = spark.table("phrase_set_stream").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("phrase_id")) ->
        r.getAs[Long]("n_hits")).toMap
    assert(gate.size === rows.size * phrases.length)
    gate.foreach { case (k, n) =>
      assert(n === batch.getOrElse(k, 0L), s"pair $k") }
    // the absent phrase is all-zero; the present ones hit somewhere
    assert(gate.filter(_._1._2 == 2L).values.forall(_ == 0L))
    assert(gate.filter(_._1._2 == 0L).values.exists(_ > 0L))
    // stateless: projection + generator only
    val plan = Streaming.streamingPhraseSetGate(in.toDS(), phrases)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingPhraseSetGate must remain a stateless projection")
  }

  test("streamingBlocklistGate replays the batch AC scan exactly, stateless") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val pats = Seq("table", "ta", "a a", "zzqx")
    val batch = graft.text.Blocklist.blocklistGate(docs, pats).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pattern_id")) ->
        r.getAs[Long]("n_hits")).toMap
    assert(batch.nonEmpty && batch.values.sum > 0)
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingBlocklistGate(in.toDS(), pats)
    val q = out.writeStream.format("memory").queryName("blocklist_stream")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val gate = spark.table("blocklist_stream").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pattern_id")) ->
        r.getAs[Long]("n_hits")).toMap
    assert(gate.size === rows.size * pats.length)
    gate.foreach { case (k, n) => assert(n === batch(k), s"pair $k") }
    // the absent needle stays all-zero; nested "ta" out-hits "table"
    assert(gate.filter(_._1._2 == 3L).values.forall(_ == 0L))
    assert(gate.filter(_._1._2 == 1L).values.sum >=
      gate.filter(_._1._2 == 0L).values.sum)
    val plan = Streaming.streamingBlocklistGate(in.toDS(), pats)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingBlocklistGate must remain a stateless projection")
  }

  test("streamingRedact replays the batch scrub exactly, stateless") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val pats = Seq("table", "a a", "agg")
    val batch = graft.text.Blocklist.redactDocs(docs, pats).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("redacted"), r.getAs[Long]("n_masked")))).toMap
    assert(batch.values.exists(_._2 > 0L))
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val q = Streaming.streamingRedact(in.toDS(), pats)
      .writeStream.format("memory").queryName("redact_stream")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("redact_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("redacted"), r.getAs[Long]("n_masked")))).toMap
    assert(got === batch)
    val plan = Streaming.streamingRedact(in.toDS(), pats)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingRedact must remain a stateless projection")
  }

  test("streamingIngestGate composes the batch gate+quality stages bitwise") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // held corpus = even ids; model = the q_quality_clf recipe
    val existing = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val (m, k) = (4096, 3)
    val filter = graft.text.Bloom.buildFilter(existing, "text", m, k)
    val w = graft.text.Classifier.fit(
      docs.withColumn("y",
        (org.apache.spark.sql.functions.col("doc_id") % 2).cast("long")),
      "y", dim = 64, iters = 2, lr = 0.5)
    // batch truth: probe + gopher + classify, joined per doc
    val probe = graft.text.Bloom.probe(docs, "text", filter, m, k)
      .select("doc_id", "maybe_seen")
    val gq = graft.text.TextStats.gopherRules(docs)
    val sc = graft.text.Classifier.classify(docs, w, dim = 64,
      threshold = 1e-6)
    val batch = probe.join(gq, "doc_id").join(sc, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Boolean]("maybe_seen"),
        r.getAs[Long]("quality_pass"), r.getAs[Double]("score"),
        r.getAs[Int]("predicted")))).toMap
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingIngestGate(in.toDS(), filter, m, k, w,
      dim = 64, threshold = 1e-6)
    val q = out.writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("ingest_gate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(streamed.size === batch.size)
    batch.foreach { case (id, (ms, qp, score, pred)) =>
      val r = streamed(id)
      assert(r.getAs[Boolean]("maybe_seen") === ms, s"doc $id maybe_seen")
      assert(r.getAs[Long]("quality_pass") === qp, s"doc $id quality_pass")
      assert(r.getAs[Double]("score") === score, s"doc $id score") // bitwise
      assert(r.getAs[Int]("predicted") === pred, s"doc $id predicted")
      assert(r.getAs[Boolean]("admitted") === (!ms && qp == 1 && pred == 1),
        s"doc $id admitted")
    }
    // the whole composite must stay a stateless projection: no
    // aggregation, so no state store and no watermark ever needed
    val plan = Streaming.streamingIngestGate(in.toDS(), filter, m, k, w)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingIngestGate must remain a stateless projection")
  }

  test("streamingLmGate scores bitwise the batch KN model on the pruned " +
      "corpus and stays a stateless projection") {
    import graft.streaming.StreamDoc
    import graft.text.LmPerplexity
    implicit val sqlCtx = spark.sqlContext
    val fns = org.apache.spark.sql.functions
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // deployable model: prune BOTH reference and scored corpus to the
    // top-40 vocabulary, train on the even ids, collect + broadcast
    val vocab = LmPerplexity.topVocab(raw, v = 40)
    val pruned = LmPerplexity.pruneVocab(raw, vocab)
      .select("doc_id", "text").persist()
    val ref = pruned.filter(fns.col("doc_id") % 2 === 0)
    val model = LmPerplexity.collectModel(ref)
    val bc = spark.sparkContext.broadcast(model)
    // batch truth: the fully-distributed join-based scorer
    val batch = LmPerplexity.score(ref, pruned).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("lp_micro"), r.getAs[Double]("ppl")))).toMap
    val rows = pruned.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingLmGate(in.toDS().toDF(), bc, maxPpl = 30.0)
    val q = out.writeStream.format("memory").queryName("lm_gate")
      .outputMode("append").start()
    rows.grouped(120).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("lm_gate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(streamed.size === rows.size)
    var admittedSeen = 0
    var rejectedSeen = 0
    batch.foreach { case (id, (n, lp, ppl)) =>
      val r = streamed(id)
      assert(r.getAs[Long]("n_bigrams") === n, s"doc $id n_bigrams")
      assert(r.getAs[Long]("lp_micro") === lp, s"doc $id lp_micro") // bitwise
      assert(r.getAs[Double]("ppl") === ppl, s"doc $id ppl")        // bitwise
      val admitted = r.getAs[Boolean]("admitted")
      assert(admitted === (ppl <= 30.0), s"doc $id admitted")
      if (admitted) admittedSeen += 1 else rejectedSeen += 1
    }
    // the threshold actually separates this corpus (not vacuous)
    assert(admittedSeen > 0 && rejectedSeen > 0,
      s"vacuous gate: $admittedSeen admitted, $rejectedSeen rejected")
    val plan = Streaming.streamingLmGate(in.toDS().toDF(), bc, 30.0)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingLmGate must remain a stateless projection")
    pruned.unpersist()
  }

  test("streamingBoilerplate replayed as ONE batch matches stripBoilerplate") {
    import graft.streaming.{StreamChunk, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val batch = graft.text.Rewrite.stripBoilerplate(docs, k = 3, maxDf = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_kept")))).toMap
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingBoilerplate(in.toDS(), k = 3, maxDf = 4)
    val q = out.writeStream.format("memory").queryName("boiler_replay")
      .outputMode("append").start()
    // one batch = the batch operator's visibility: verdicts must agree
    in.addData(rows.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("boiler_replay").as[StreamChunk].collect()
      .filter(_.kept)
    val rebuilt = kept.groupBy(_.doc_id).map { case (id, cs) =>
      id -> ((cs.sortBy(_.chunk_idx).map(_.chunk).mkString(" "),
        cs.length.toLong))
    }
    rows.foreach { d =>
      val expected = batch(d.doc_id)
      val got = rebuilt.getOrElse(d.doc_id, (("", 0L)))
      assert(got === expected,
        s"doc ${d.doc_id}: stream rebuilt $got, batch $expected")
    }
  }

  test("streamingBoilerplate online: later occurrences drop once df crosses") {
    import graft.streaming.{StreamChunk, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingBoilerplate(in.toDS(), k = 3, maxDf = 2)
    val q = out.writeStream.format("memory").queryName("boiler_online")
      .outputMode("append").start()
    // batch 1: the chunk "x y z" in 2 docs — at the df=2 threshold, kept
    in.addData(
      StreamDoc(1L, new Timestamp(t0), "x y z"),
      StreamDoc(2L, new Timestamp(t0 + 1000), "x y z"))
    q.processAllAvailable()
    // batch 2: a third doc pushes df to 3 > maxDf — dropped from here on
    in.addData(StreamDoc(3L, new Timestamp(t0 + 2000), "x y z"))
    q.processAllAvailable()
    // batch 3: once over, always over (state collapsed to the flag)
    in.addData(StreamDoc(4L, new Timestamp(t0 + 3000), "x y z"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("boiler_online").as[StreamChunk].collect()
      .map(c => c.doc_id -> c.kept).toMap
    assert(rows(1L) && rows(2L), "under-threshold occurrences must keep")
    assert(!rows(3L), "the crossing batch must drop")
    assert(!rows(4L), "post-crossing occurrences must drop")
  }

  test("streamingBloomGate verdicts match the batch probe bit-for-bit") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val (m, k) = (16384, 3)
    // "accepted corpus so far" = even ids; the stream replays everything
    val existing = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val filter = graft.text.Bloom.buildFilter(existing, "text", m, k)
    val batch = graft.text.Bloom.probe(docs, "text", filter, m, k)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("maybe_seen")).toMap
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val out = Streaming.streamingBloomGate(in.toDS(), filter, m, k)
    val q = out.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("bloom_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("maybe_seen")).toMap
    assert(streamed.size === batch.size)
    batch.foreach { case (id, expected) =>
      assert(streamed(id) === expected, s"doc $id bloom verdict diverges")
    }
    // every accepted-corpus doc must be flagged (no false negatives)
    streamed.filter(_._1 % 2 == 0).foreach { case (id, seen) =>
      assert(seen, s"existing doc $id missed by the gate")
    }
    // stateless: a pure projection, no aggregation, no watermark needed
    val plan = Streaming.streamingBloomGate(in.toDS(), filter, m, k)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingBloomGate must remain a stateless projection")
  }

  test("batchSessionize replays the streaming sessionizer on the full corpus") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.data.DocQueries.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(_.ts.getTime)
    val in = MemoryStream[Event]
    val out = Streaming.sessionize(in.toDS(), gapSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("sess_replay")
      .outputMode("append").start()
    ev.grouped(200).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    // one far-future event per user closes every open session
    val lastTs = ev.map(_.ts.getTime).max
    in.addData(ev.map(_.user_id).distinct.map(u =>
      Event(900000L + u, new Timestamp(lastTs + 86400000L), u, "close", 0.0)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_replay").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    val batch = Streaming.batchSessionize(
        graft.data.DocQueries.events(spark, "/root/testdata/sf0.001"),
        gapSeconds = 1800)
      .select(col("user_id"), col("session_start").cast("timestamp"),
        col("session_end").cast("timestamp"), col("n_events"),
        col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.length === batch.length)
    // session KEYS (user, start, end, n) are exact; totals differ only
    // representationally (sequential double fold vs exact cents grid)
    streamed.zip(batch).foreach { case (s, b) =>
      assert((s._1, s._2, s._3, s._4) === ((b._1, b._2, b._3, b._4)),
        s"session key diverges: $s vs $b")
      assertClose(s._5, b._5, 1e-9)
    }
  }

  test("streamingHllRegisters: streamed sketch == batch sketch, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // two hour-windows of user activity + a far-future watermark closer;
    // duplicates within and across micro-batches must collapse into the
    // same registers as one batch pass
    val events = (1L to 300L).map(i => Event(i,
      t(if (i % 2 == 0) "2024-01-01 00:10:00" else "2024-01-01 01:20:00"),
      i % 40, "click", 1.0))
    in.addData(events.take(150): _*)
    val out = Streaming.streamingHllRegisters(in.toDF(),
      concat(lit("u:"), col("user_id")), p = 10)
    val q = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(events.drop(150): _*)
    q.processAllAvailable()
    in.addData(Event(999, t("2024-01-02 12:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_stream").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getInt(2))).toSet
    val batchDf = spark.createDataFrame(events)
      .withColumn("window_start", window(col("ts"), "1 hour")("start"))
    val batch = graft.stats.Hll.registerTable(batchDf,
        concat(lit("u:"), col("user_id")), Seq("window_start"), p = 10)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getInt(2))).toSet
    assert(streamed === batch)
    // and the estimates read off the streamed registers match batch
    val est = graft.stats.Hll.estimateFromRegisters(
      spark.table("hll_stream").withColumnRenamed("window_start", "ws"),
      Seq("ws"), p = 10).collect()
      .map(r => r.getTimestamp(0).toString.take(13) -> r.getDouble(1)).toMap
    val bEst = graft.stats.Hll.distinctEstimate(batchDf,
      concat(lit("u:"), col("user_id")), Seq("window_start"), p = 10)
      .collect()
      .map(r => r.getTimestamp(0).toString.take(13) -> r.getDouble(1)).toMap
    assert(est === bEst)
    // 20 distinct users per window; p=10 is exact-ish in linear range
    est.values.foreach(v => assert(math.abs(v - 20.0) <= 1.5, s"est $v"))
  }

  test("streamingCmsCounters: streamed cells == batch cells, estimates agree") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val events = (1L to 400L).map(i => Event(i,
      t("2024-01-01 00:05:00"), i % 23, "click", 1.0))
    in.addData(events.take(170): _*)
    val out = Streaming.streamingCmsCounters(in.toDF(),
      concat(lit("u:"), col("user_id")), w = 256, d = 3)
    val q = out.writeStream.format("memory").queryName("cms_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(events.drop(170): _*)
    q.processAllAvailable()
    in.addData(Event(999, t("2024-01-02 12:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream")
      .filter(col("window_start") < t("2024-01-02 00:00:00"))
      .select("__pos", "__c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.stats.Cms.counterTable(spark.createDataFrame(events),
        concat(lit("u:"), col("user_id")), w = 256, d = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    // point queries off the streamed sketch: min over d cells,
    // overcount-only vs the exact per-user counts
    val grid = new Array[Long](3 * 256)
    streamed.foreach { case (p, c) => grid(p.toInt) = c }
    import spark.implicits._
    val users = (0L until 23L).map(u => u -> s"u:$u").toDF("user_id", "key")
    val ests = graft.stats.Cms.estimate(users, col("key"), grid, 256, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exact = events.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (u, n) => assert(ests(u) >= n, s"user $u") }
  }

  test("streamingExpectations: per-window verdicts == batch gate") {
    import graft.stats.Expectations
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // window 0 is clean; window 1 carries a value-range violation
    val events = (1L to 120L).map { i =>
      val bad = i % 2 == 1 && i % 5 == 0
      Event(i, t(if (i % 2 == 0) "2024-01-01 00:10:00"
                 else "2024-01-01 01:20:00"),
        i % 9, "click", if (bad) 99.0 else 0.5)
    }
    in.addData(events.take(50): _*)
    val rules = Seq(Expectations.notNull("user_id"),
      Expectations.between("value", 0.0, 1.0),
      Expectations.rowCountAtLeast(55L))
    val out = Streaming.streamingExpectations(in.toDF(), rules)
    val q = out.writeStream.format("memory").queryName("exp_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(events.drop(50): _*)
    q.processAllAvailable()
    in.addData(Event(999, t("2024-01-02 12:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("exp_stream")
      .filter(col("window_start") < t("2024-01-02 00:00:00"))
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(19), r.getString(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    // micro-batch boundaries must not show: identical to the batch
    // grouped gate over the same rows
    val batch = Expectations.checkGrouped(
        spark.createDataFrame(events)
          .withColumn("__w", window(col("ts"), "1 hour")),
        Seq("__w"), rules)
      .select(col("__w.start").cast("string"), col("rule"),
        col("measured"), col("violations"), col("passed"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(streamed === batch)
    // the dirty window failed the range rule; the clean one passed;
    // both windows (60 rows each) break the 55-row floor check only
    // when they should (60 >= 55: both pass)
    val byWindow = streamed.groupBy(_._1).view.mapValues(
      _.map(v => v._2 -> v._5).toMap).toMap
    val Seq(w0, w1) = byWindow.keys.toSeq.sorted
    assert(byWindow(w0)("between:value:[0.0,1.0]"))
    assert(!byWindow(w1)("between:value:[0.0,1.0]"))
    assert(byWindow.values.forall(_("row_count_at_least:55")))
    // unique rules are rejected up front
    intercept[IllegalArgumentException] {
      Streaming.streamingExpectations(in.toDF(),
        Seq(Expectations.unique("user_id")))
    }
  }

  test("RangeJoin.pointInInterval is stream-safe: streamed enrichment == batch") {
    implicit val sqlCtx = spark.sqlContext
    // the bucket-expansion range join is STATELESS on the point side
    // (one bucket per row + a static exploded interval frame), so the
    // batch operator runs unchanged on a stream — the attribution /
    // in-transit shape online
    val intervals = Seq((10L, 0L, 3600L), (11L, 1800L, 7200L),
      (12L, 90000L, 95000L)).toDF("iid", "lo", "hi")
    intervals.persist(); intervals.count()
    val in = MemoryStream[Event]
    val events = (1L to 40L).map(i =>
      Event(i, new Timestamp(i * 300 * 1000L), i, "p", i.toDouble))
    in.addData(events.take(20): _*)
    val pts = in.toDF().select(col("event_id"),
      (unix_timestamp(col("ts"))).as("p"))
    val out = graft.operators.RangeJoin.pointInInterval(
      pts, intervals, "p", "lo", "hi", bucketWidth = 1000)
    val q = out.writeStream.format("memory").queryName("rjoin")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(events.drop(20): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rjoin").select("event_id", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.RangeJoin.pointInInterval(
        spark.createDataFrame(events).select(col("event_id"),
          unix_timestamp(col("ts")).as("p")),
        intervals, "p", "lo", "hi", bucketWidth = 1000)
      .select("event_id", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch && streamed.nonEmpty)
    intervals.unpersist()
  }

  test("streamingOutlierGate: streamed z == the batch pass that built the stats") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamVec
    // batch corpus -> centroids + cell stats (the persisted artifact);
    // the stream re-scores the same vectors statelessly across a
    // micro-batch boundary — z must be bit-identical to the batch pass
    val rows = (0 until 30).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (if (i < 15) 1.0f else 9.0f) + 0.01f * (((i * 7 + d) % 5) - 2)))
    } :+ (99L, (0 until 8).map(_ => 4.0f))
    val batchDf = rows.toDF("vec_id", "embedding")
    val cents = graft.vector.Ivf.trainCentroids(batchDf, nCells = 2, iters = 3)
    val batch = graft.vector.Embeddings.outlierScores(batchDf, cents)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2),
        Option(r.get(3)))).toMap
    val stats = graft.vector.Embeddings.cellStats(
      graft.vector.Embeddings.assignDist(batchDf, cents, "vec_id", "embedding"))
    stats.persist(); stats.count()
    val in = MemoryStream[StreamVec]
    val svs = rows.map { case (id, e) => StreamVec(id, t("2024-01-01 00:10:00"), e) }
    in.addData(svs.take(10): _*)
    val out = Streaming.streamingOutlierGate(in.toDS(), cents, stats)
    val q = out.writeStream.format("memory").queryName("ogate")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(svs.drop(10): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ogate").collect()
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Int]("cell"),
        r.getAs[Double]("dist"), Option(r.getAs[Any]("z")))).toMap
    assert(streamed === batch)
    stats.unpersist()
  }

  test("streamingCrossCorpusGate: streamed hits == batch crossCorpusNearDups pairs") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamDoc
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq((1L, base), (2L, base),
      (3L, "completely different text about nothing shared at all " +
        "with the base document corpus entry here")).toDF("doc_id", "text")
    val corpusSets = graft.text.Dedup.shingleSets(corpus, n = 3)
    corpusSets.persist()
    corpusSets.count()
    val batchDocs = Seq(
      StreamDoc(10L, t("2024-01-01 00:10:00"), base),
      StreamDoc(11L, t("2024-01-01 00:20:00"),
        "fresh new content never seen before in any corpus document " +
          "entirely novel words everywhere"),
      StreamDoc(12L, t("2024-01-01 01:05:00"), base + " appended"))
    val in = MemoryStream[StreamDoc]
    in.addData(batchDocs.take(2): _*)
    val out = Streaming.streamingCrossCorpusGate(in.toDS(), corpusSets,
      numHashes = 16, bands = 8, minJaccard = 0.3)
    val q = out.writeStream.format("memory").queryName("ccgate")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(batchDocs.drop(2): _*) // across a micro-batch boundary
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ccgate").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_id"),
        r.getAs[Double]("jaccard")))
    // per-band rows collapse to the batch operator's pair set, with
    // identical verified jaccard values
    val batch = graft.text.Dedup.crossCorpusNearDups(
        spark.createDataFrame(batchDocs).select(col("doc_id"), col("text")),
        corpus, n = 3, numHashes = 16, bands = 8, minJaccard = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
    assert(streamed.toSet === batch)
    assert(batch.map(p => (p._1, p._2)) ===
      Set((10L, 1L), (10L, 2L), (12L, 1L), (12L, 2L)))
    corpusSets.unpersist()
  }

  test("streamingCanonicalize replays the batch dictionary walk, stateless") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val maps = Seq("table" -> "tbl", "a a" -> "aa")
    val batch = graft.text.Blocklist.canonicalizeDocs(docs, maps).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("canonical"), r.getAs[Long]("n_replaced")))).toMap
    assert(batch.values.exists(_._2 > 0L))
    val rows = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        StreamDoc(id, new Timestamp(1704067200000L + id * 1000L), text) }
    val in = MemoryStream[StreamDoc]
    val q = Streaming.streamingCanonicalize(in.toDS(), maps)
      .writeStream.format("memory").queryName("canon_stream")
      .outputMode("append").start()
    rows.grouped(100).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("canon_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("canonical"), r.getAs[Long]("n_replaced")))).toMap
    assert(got === batch)
    val plan = Streaming.streamingCanonicalize(in.toDS(), maps)
      .queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"),
      "streamingCanonicalize must remain a stateless projection")
  }

  test("streamingBlocklistCounts: windowed needle monitor == batch twin") {
    import graft.streaming.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    val pats = Seq("table", "a a", "zzqx")
    // two hour-windows over the sf0.001 corpus, split by doc parity
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1)
      .map { case (id, text) =>
        val ts = if (id % 2 == 0) t("2024-01-01 00:10:00")
          else t("2024-01-01 01:20:00")
        StreamDoc(id, ts, text) }
    val in = MemoryStream[StreamDoc]
    val q = Streaming.streamingBlocklistCounts(in.toDS(), pats)
      .writeStream.format("memory").queryName("bl_counts_stream")
      .outputMode("append").start()
    docs.grouped(20).foreach { chunk =>
      in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    // a far-future doc advances the watermark past both windows
    in.addData(StreamDoc(9999L, t("2024-01-02 12:00:00"), "x"))
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val streamed = canon(spark.table("bl_counts_stream")
      .filter(col("window_start") < t("2024-01-02 00:00:00")))
    assert(streamed.size === 2 * pats.length) // 2 windows x 3 needles
    // batch twin: the same operator over one batch frame
    val batchDs = spark.createDataset(docs.toIndexedSeq)(
      org.apache.spark.sql.Encoders.product[StreamDoc])
    val batch = canon(Streaming.streamingBlocklistCounts(batchDs, pats)
      .filter(col("window_start") < t("2024-01-02 00:00:00")))
    assert(streamed === batch)
    // the absent needle reports full doc counts with zero hits
    streamed.filter(_._1._2 == 2L).values.foreach { case (nd, ndh, nh) =>
      assert(nd > 0L && ndh === 0L && nh === 0L) }
    assert(streamed.filter(_._1._2 == 0L).values.exists(_._3 > 0L))
  }

  test("streamingTopKPerKey: streamed leaderboards == batch twin across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // two hour-windows x two event types; values collide (i % 7) so
    // the id tie-break is exercised; event 13 is RE-DELIVERED across
    // a micro-batch boundary (must collapse, not duplicate)
    val events = (1L to 200L).map { i =>
      val ts = if (i % 2 == 0) t("2024-01-01 00:10:00") else t("2024-01-01 01:20:00")
      Event(i, ts, i, if (i % 3 == 0) "a" else "b", (i % 7).toDouble)
    }
    in.addData(events.take(100): _*)
    val out = Streaming.streamingTopKPerKey(in.toDF(), col("event_type"),
      col("value"), col("event_id"), k = 5)
    val q = out.writeStream.format("memory").queryName("topk_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(events.drop(100) :+ events(12): _*) // re-delivery of event 13
    q.processAllAvailable()
    in.addData(Event(9999, t("2024-01-02 12:00:00"), 1, "a", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("topk_stream")
      .filter(col("window_start") < t("2024-01-02 00:00:00")).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    // bit-identical to the same operator over one batch (watermark a
    // no-op there), and to the plain rank-window spelling
    val batchDf = spark.createDataFrame(events)
    val batchTwin = Streaming.streamingTopKPerKey(batchDf, col("event_type"),
        col("value"), col("event_id"), k = 5).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(streamed === batchTwin)
    import org.apache.spark.sql.expressions.Window
    val win = spark.createDataFrame(events)
      .withColumn("window_start", window(col("ts"), "1 hour")("start"))
      .withColumn("rank", row_number().over(Window
        .partitionBy("window_start", "event_type")
        .orderBy(col("value").desc, col("event_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("window_start", "event_type", "rank", "value", "event_id")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(streamed === win)
    assert(streamed.size == 20) // 2 windows x 2 types x k=5
  }

  test("streamingKmvSketch: streamed arrays == batch sketch, set algebra composes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // two hour-windows with overlapping user sets: window 0 sees users
    // 0..59, window 1 sees 40..99 — 20 shared
    val events = (1L to 600L).map { i =>
      if (i % 2 == 0) Event(i, t("2024-01-01 00:10:00"), i / 2 % 60, "c", 1.0)
      else Event(i, t("2024-01-01 01:20:00"), 40 + (i / 2 % 60), "c", 1.0)
    }
    in.addData(events.take(250): _*)
    val out = Streaming.streamingKmvSketch(in.toDF(),
      concat(lit("u:"), col("user_id")), k = 32)
    val q = out.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    in.addData(events.drop(250): _*)
    q.processAllAvailable()
    in.addData(Event(9999, t("2024-01-02 12:00:00"), 1, "c", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmv_stream")
      .filter(col("window_start") < t("2024-01-02 00:00:00"))
      .collect()
      .map(r => r.getTimestamp(0).toString -> r.getSeq[Long](1)).toMap
    // micro-batch boundaries must not show: bit-identical to one batch
    val batchDf = spark.createDataFrame(events)
      .withColumn("window_start", window(col("ts"), "1 hour")("start"))
    val batch = graft.stats.Kmv.sketch(batchDf, Seq("window_start"),
        concat(lit("u:"), col("user_id")), k = 32)
      .collect()
      .map(r => r.getTimestamp(0).toString -> r.getSeq[Long](1)).toMap
    assert(streamed === batch)
    assert(streamed.size == 2 && streamed.values.forall(_.size == 32))
    // set algebra over the STREAMED artifacts: union ≈ 100 distinct
    // users, intersection ≈ 20 shared — answered from the two arrays
    import spark.implicits._
    val Seq(w0, w1) = streamed.toSeq.sortBy(_._1).map(_._2)
    val est = Seq((w0, w1)).toDF("a", "b").select(
      graft.stats.Kmv.distinctEstimate(
        graft.stats.Kmv.unionSketch(col("a"), col("b"), 32), 32).as("u"),
      graft.stats.Kmv.intersectEstimate(col("a"), col("b"), 32).as("i"))
      .head
    assert(math.abs(est.getDouble(0) - 100.0) < 4.0 * 100.0 / math.sqrt(30.0))
    assert(est.getDouble(1) > 0.0 && est.getDouble(1) < 60.0,
      s"intersect est ${est.getDouble(1)}")
  }
}
