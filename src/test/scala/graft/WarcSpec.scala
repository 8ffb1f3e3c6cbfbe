package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Warc, WarcFormat}

class WarcSpec extends AnyFunSuite with SparkSpec {

  private def tmpDir(tag: String): Path = {
    val d = Files.createTempDirectory(s"warc-$tag")
    d.toFile.deleteOnExit(); d
  }

  private def enc(i: Int, wtype: String = "response",
                  payload: Array[Byte] = null): Array[Byte] =
    WarcFormat.encode(
      warcType = wtype,
      recordId = s"<urn:uuid:rec-$i>",
      targetUri = Some(s"http://example.com/doc/$i"),
      dateMicros = 1700000000000000L + i * 1000000L,
      contentType = "text/plain",
      payload = if (payload != null) payload else s"body $i".getBytes(UTF_8))

  // ---- codec ----

  test("codec round-trips records, preserving headers and payload bytes") {
    val bytes = enc(1) ++ enc(2, "request") ++ enc(3)
    val rs = WarcFormat.records(new ByteArrayInputStream(bytes), gzipped = false).toList
    assert(rs.map(_.warcType) == List(Some("response"), Some("request"), Some("response")))
    assert(rs.map(_.targetUri.get) ==
      List(1, 2, 3).map(i => s"http://example.com/doc/$i"))
    assert(rs(1).payload.sameElements("body 2".getBytes(UTF_8)))
    assert(rs(0).dateMicros.contains(1700000001000000L))
  }

  test("payload containing CRLFCRLF and a nested WARC record is read intact") {
    // framing is length-delimited: a payload that embeds the record
    // separator, or an entire nested record, must not confuse the parser
    val evil = "x\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\ny".getBytes(UTF_8)
    val bytes = enc(1, payload = evil) ++ enc(2)
    val rs = WarcFormat.records(new ByteArrayInputStream(bytes), gzipped = false).toList
    assert(rs.size == 2)
    assert(rs(0).payload.sameElements(evil))
    assert(rs(1).recordId.contains("<urn:uuid:rec-2>"))
  }

  test("multi-member gzip stream parses record-per-member") {
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 1 to 3) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(enc(i)); gz.finish()
    }
    val rs = WarcFormat.records(
      new ByteArrayInputStream(out.toByteArray), gzipped = true).toList
    assert(rs.map(_.recordId.get) == (1 to 3).map(i => s"<urn:uuid:rec-$i>").toList)
  }

  test("truncated payload raises with offset context") {
    val whole = enc(1)
    val cut = whole.take(whole.length - 12)
    val e = intercept[Exception] {
      WarcFormat.records(new ByteArrayInputStream(cut), gzipped = false).toList
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("record without Content-Length raises") {
    val bad = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(UTF_8)
    val e = intercept[IllegalArgumentException] {
      WarcFormat.records(new ByteArrayInputStream(bad), gzipped = false).toList
    }
    assert(e.getMessage.contains("Content-Length"))
  }

  test("skipPayload skips bytes without materializing them") {
    val bytes = enc(1) ++ enc(2, "request") ++ enc(3)
    val rs = WarcFormat.records(new ByteArrayInputStream(bytes), gzipped = false,
      skipPayload = hs => hs.exists(h => h._2 == "request")).toList
    assert(rs(1).payload.isEmpty)      // skipped
    assert(rs(0).payload.nonEmpty && rs(2).payload.nonEmpty)
    assert(rs(2).recordId.contains("<urn:uuid:rec-3>")) // framing survived the skip
  }

  // ---- DSv2 read ----

  private def writeCorpus(dir: Path, gzip: Boolean): Unit = {
    import spark.implicits._
    val df = (1 to 20).map { i =>
      (s"<urn:uuid:rec-$i>",
        if (i % 4 == 0) "request" else "response",
        s"http://example.com/doc/$i",
        new java.sql.Timestamp(1700000000000L + i * 1000L),
        s"payload number $i".getBytes(UTF_8))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date", "payload")
      .repartition(3, col("record_id"))
    Warc.write(df, dir.toString, gzip = gzip)
  }

  test("DSv2 reads back what the sink wrote (plain and gzip)") {
    for (gzip <- Seq(false, true)) {
      val dir = tmpDir(if (gzip) "gz" else "plain")
      writeCorpus(dir, gzip)
      val got = Warc.read(spark, dir.toString)
        .select("record_id", "warc_type", "target_uri", "content_length")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1)
      assert(got.length == 20)
      assert(got.forall { case (id, t, uri, len) =>
        val i = id.stripPrefix("<urn:uuid:rec-").stripSuffix(">").toInt
        t == (if (i % 4 == 0) "request" else "response") &&
          uri == s"http://example.com/doc/$i" &&
          len == s"payload number $i".getBytes(UTF_8).length
      })
      val text = Warc.read(spark, dir.toString)
        .select(col("record_id"), col("payload").cast("string").as("t"))
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      assert(text("<urn:uuid:rec-7>") == "payload number 7")
    }
  }

  test("warc_type filter pushes down and prunes correctly") {
    val dir = tmpDir("push")
    writeCorpus(dir, gzip = false)
    val q = Warc.read(spark, dir.toString)
      .filter(col("warc_type") === "response")
      .select("record_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("warc_type IN (response)"),
      s"type filter did not reach the scan:\n$plan")
    assert(q.count() == 15)
  }

  test("column pruning drops payload from the read schema") {
    val dir = tmpDir("prune")
    writeCorpus(dir, gzip = false)
    val q = Warc.read(spark, dir.toString).select("record_id", "content_length")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("cols=record_id,content_length") ||
      !plan.contains("payload"),
      s"payload survived pruning:\n$plan")
    assert(q.count() == 20)
  }

  test("headers map and record offsets are exposed") {
    val dir = tmpDir("hdrs")
    writeCorpus(dir, gzip = false)
    val r = Warc.read(spark, dir.toString)
      .filter(col("record_id") === "<urn:uuid:rec-3>")
      .select(col("headers")("WARC-Type"), col("record_offset"), col("path"))
      .collect().head
    assert(r.getString(0) == "response")
    assert(r.getLong(1) >= 0L)
    assert(r.getString(2).endsWith(".warc"))
  }

  test("readStream tails a landing directory, one exactly-once batch per new file") {
    import spark.implicits._
    val dir = tmpDir("stream")
    // batch 1: two segment files land
    val mk = (ids: Seq[Int], part: Int) => {
      val df = ids.map { i =>
        (s"<urn:uuid:s-$i>", "response", s"http://x/$i",
          new java.sql.Timestamp(1700000000000L + i), s"p$i".getBytes(UTF_8))
      }.toDF("record_id", "warc_type", "target_uri", "warc_date", "payload")
        .coalesce(1)
      Warc.write(df, dir.resolve(s"seg$part").toString, gzip = true)
      // move part file up into the watched dir (distinct names per call)
      val f = dir.resolve(s"seg$part").toFile.listFiles().head
      Files.move(f.toPath, dir.resolve(s"segment-$part.warc.gz"))
    }
    mk(Seq(1, 2, 3), 0); mk(Seq(4, 5), 1)
    val q = spark.readStream.format("warc").load(dir.toString + "/*.warc.gz")
      .select("record_id")
      .writeStream.format("memory").queryName("warc_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("warc_stream").count() == 5)
    // batch 2: a third file lands; a fresh AvailableNow run picks up all
    mk(Seq(6, 7), 2)
    val q2 = spark.readStream.format("warc").load(dir.toString + "/*.warc.gz")
      .select("record_id")
      .writeStream.format("memory").queryName("warc_stream2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.table("warc_stream2").count() == 7)
    // offset round-trip: late-arriving names that sort earlier are still new
    val o = graft.sources.WarcOffset(Seq("b.warc", "z \"q\".warc"))
    assert(graft.sources.WarcOffset.fromJson(o.json()) == o)
  }

  test("compacted offsets: watermark/frontier semantics, legacy parse, merge") {
    import graft.sources.WarcOffset
    val wm = WarcOffset(Map("/d" -> "/d/s05"), Seq("/d/s07", "/d/s09"))
    assert(wm.seen("/d/s03") && wm.seen("/d/s05")) // under the watermark
    assert(wm.seen("/d/s07") && !wm.seen("/d/s08")) // frontier vs gap
    assert(!wm.seen("/e/s01")) // another directory
    assert(WarcOffset.fromJson(wm.json()) == wm)
    // names with quotes/backslashes survive the compact json too
    val odd = WarcOffset(Map("/d" -> "/d/a\"b"), Seq("/d/z \"q\".warc"))
    assert(WarcOffset.fromJson(odd.json()) == odd)
    // pre-compaction offset logs (plain array) still parse
    assert(WarcOffset.fromJson("[\"/d/a.warc\"]") ==
      WarcOffset(Seq("/d/a.warc")))
    // monotone merge: per-dir max watermark, under-watermark frontier
    // names dropped
    val m = WarcOffset(Seq("/d/a.warc")).merge(wm)
    assert(m.watermarks == Map("/d" -> "/d/s05"))
    assert(m.frontier == Seq("/d/s07", "/d/s09"))
  }

  test("compacted offsets: checkpoint log stays bounded, restart replays " +
      "exactly once") {
    import spark.implicits._
    val dir = tmpDir("stream_compact")
    val ckpt = tmpDir("ckpt_compact").toString
    def mk(ids: Seq[Int], part: Int): Unit = {
      val df = ids.map { i =>
        (s"<urn:uuid:c-$i>", "response", s"http://x/$i",
          new java.sql.Timestamp(1700000000000L + i), s"p$i".getBytes(UTF_8))
      }.toDF("record_id", "warc_type", "target_uri", "warc_date", "payload")
        .coalesce(1)
      Warc.write(df, dir.resolve(s"seg$part").toString, gzip = true)
      val f = dir.resolve(s"seg$part").toFile.listFiles().head
      Files.move(f.toPath, dir.resolve(s"segment-$part.warc.gz"))
    }
    val got = new java.util.concurrent.atomic.AtomicLong
    def run(): Long = {
      got.set(0)
      val q = spark.readStream.format("warc")
        .option("offsetFrontierKeep", "0")
        .load(dir.toString + "/*.warc.gz")
        .select("record_id")
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
          got.addAndGet(df.count()); ()
        })
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      got.get
    }
    mk(Seq(1, 2, 3), 0); mk(Seq(4, 5), 1); mk(Seq(6), 2)
    assert(run() == 6)
    // three more segments land; the SAME checkpoint resumes: exactly
    // the new records, none of the old
    mk(Seq(7, 8), 3); mk(Seq(9), 4); mk(Seq(10), 5)
    assert(run() == 4)
    // the committed offset is the compacted form: a watermark entry
    // plus a frontier bounded by the batch (not the all-time 6 files)
    val offDir = new java.io.File(ckpt, "offsets")
    val last = offDir.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    val lines = new String(Files.readAllBytes(last.toPath), UTF_8)
      .split("\n")
    val off = graft.sources.WarcOffset.fromJson(lines.last)
    assert(off.watermarks.nonEmpty, lines.last)
    assert(off.frontier.length <= 3, off.frontier.toString)
    // every file is summarized as seen — a fresh run finds nothing new
    assert(run() == 0)
  }

  test("compacted offsets: name reuse below the watermark is out of " +
      "contract (silently skipped); fresh names still land") {
    // Retention deletes under-watermark segments; the compacted offset
    // cannot distinguish a RE-CREATED old name from the original
    // (seen(f) = f <= watermark). The documented contract excludes
    // name reuse (crawlers write serial/timestamp-monotone names and
    // never recycle); this pins the failure mode the exclusion buys:
    // the reused name is skipped without error, while genuinely new
    // names above the watermark keep landing exactly once.
    import spark.implicits._
    val dir = tmpDir("stream_reuse")
    val ckpt = tmpDir("ckpt_reuse").toString
    var scratch = 0
    def mk(ids: Seq[Int], part: Int): Unit = {
      scratch += 1
      val df = ids.map { i =>
        (s"<urn:uuid:r-$i>", "response", s"http://x/$i",
          new java.sql.Timestamp(1700000000000L + i), s"p$i".getBytes(UTF_8))
      }.toDF("record_id", "warc_type", "target_uri", "warc_date", "payload")
        .coalesce(1)
      Warc.write(df, dir.resolve(s"scratch$scratch").toString, gzip = true)
      val f = dir.resolve(s"scratch$scratch").toFile.listFiles().head
      Files.move(f.toPath, dir.resolve(s"segment-$part.warc.gz"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val got = new java.util.concurrent.atomic.AtomicLong
    def run(): Long = {
      got.set(0)
      val q = spark.readStream.format("warc")
        .option("offsetFrontierKeep", "0") // watermark advances eagerly
        .load(dir.toString + "/*.warc.gz")
        .select("record_id")
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
          got.addAndGet(df.count()); ()
        })
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      got.get
    }
    mk(Seq(1, 2), 0); mk(Seq(3), 1); mk(Seq(4), 2)
    assert(run() == 4)
    // retention: segment-0 ages out and is deleted (below watermark —
    // keep=0 pushes the watermark to the last fully-committed name)
    Files.delete(dir.resolve("segment-0.warc.gz"))
    assert(run() == 0) // deletion alone changes nothing
    // OUT OF CONTRACT: a new segment REUSES the retired name. The
    // compacted summary says seen (name <= watermark) - skipped, no
    // error, no duplicate. This is the precise cost of compaction;
    // offsetFrontierKeep=-1 (exact mode) has no such exclusion.
    mk(Seq(7, 8, 9), 0)
    assert(run() == 0, "reused under-watermark name must be skipped")
    // a genuinely fresh name above the watermark still lands, and the
    // reused name stays excluded rather than corrupting the stream
    mk(Seq(5, 6), 9)
    assert(run() == 2)
  }

  test("one input partition per file (the CC-scale parallelism unit)") {
    val dir = tmpDir("parts")
    writeCorpus(dir, gzip = false) // repartition(3) -> 3 part files
    val n = Warc.read(spark, dir.toString).rdd.getNumPartitions
    assert(n == 3, s"expected 3 file-partitions, got $n")
  }

  test("listing + compacted-offset planning at crawl scale (12k segments)") {
    // a Common Crawl crawl is ~72k segment files behind one prefix;
    // this probe pins the driver-side costs that shape depends on —
    // directory listing, one-partition-per-file batch planning, and
    // the compacted streaming offset — at 12k names, with measured
    // wall-time ceilings (generous: local FS lists this in well under
    // a second; the assert catches accidental quadratic regressions)
    val dir = tmpDir("crawl12k")
    val rec = enc(0)
    val n = 12000
    var i = 0
    while (i < n) {
      Files.write(dir.resolve(f"segment-$i%05d.warc"), rec)
      i += 1
    }
    // batch: list + plan (no read) — one partition per file
    val t0 = System.nanoTime()
    val parts = Warc.read(spark, dir.toString).rdd.getNumPartitions
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(parts === n, s"expected $n file-partitions, got $parts")
    assert(planSec < 30.0, f"batch listing+planning took $planSec%.1f s")
    // streaming: first offset carries the full fresh frontier; after
    // the commit, the next listing compacts everything but the keep
    // window behind one per-directory watermark
    import graft.sources.{WarcDataSource, WarcMicroBatchStream, WarcOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val mbs = new WarcMicroBatchStream(WarcDataSource.schema, None,
      Map("path" -> (dir.toString + "/*.warc")))
    val t1 = System.nanoTime()
    val o1 = mbs.latestOffset(WarcOffset.empty, ReadLimit.allAvailable())
      .asInstanceOf[WarcOffset]
    val offSec = (System.nanoTime() - t1) / 1e9
    assert(o1.frontier.length === n)
    assert(offSec < 30.0, f"first offset listing took $offSec%.1f s")
    assert(mbs.planInputPartitions(WarcOffset.empty, o1).length === n)
    mbs.commit(o1)
    Files.write(dir.resolve("segment-99999.warc"), rec) // one late arrival
    val t2 = System.nanoTime()
    val o2 = mbs.latestOffset(o1, ReadLimit.allAvailable())
      .asInstanceOf[WarcOffset]
    val compactSec = (System.nanoTime() - t2) / 1e9
    assert(compactSec < 30.0, f"compacting offset took $compactSec%.1f s")
    // frontier bounded by the keep window (default 1024) + arrivals,
    // NOT by the 12k history; the serialized offset stays checkpoint-
    // log sized
    assert(o2.frontier.length <= 1024 + 1,
      s"frontier not compacted: ${o2.frontier.length} names")
    assert(o2.watermarks.nonEmpty)
    assert(o2.json().length < 200000,
      s"offset json ${o2.json().length} bytes — checkpoint log at risk")
    // exactly the late arrival plans against the committed anchor
    val fresh = mbs.planInputPartitions(o1, o2)
    assert(fresh.length === 1)
  }
}
