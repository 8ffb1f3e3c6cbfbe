package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.zip.GZIPInputStream

/** WARC (ISO 28500) record codec — the container format of Common Crawl
  * and every large-scale web-text corpus. Pure JVM, no Spark types, so
  * the DSv2 reader, the writer, and the tests all share one
  * implementation.
  *
  * Framing (WARC/1.0 and 1.1):
  *
  * {{{
  * WARC/1.0\r\n
  * <name>: <value>\r\n ...          (headers; Content-Length required)
  * \r\n
  * <Content-Length bytes of payload>
  * \r\n\r\n                         (record boundary)
  * }}}
  *
  * Payload bytes are length-delimited, NEVER scanned for a sentinel — a
  * payload containing `\r\n\r\n` or even a full nested WARC record is
  * read intact.
  *
  * `.warc.gz` follows the spec's one-gzip-member-per-record convention;
  * `java.util.zip.GZIPInputStream` decompresses concatenated members
  * transparently, so the same streaming parser serves both layouts.
  */
object WarcFormat {

  /** One parsed record. `headers` preserves the original name order and
    * casing; lookups go through the case-insensitive accessors. */
  final case class Record(
      version: String,
      headers: Seq[(String, String)],
      payload: Array[Byte],
      offset: Long) {

    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }

    def recordId: Option[String] = header("WARC-Record-ID")
    def warcType: Option[String] = header("WARC-Type")
    def targetUri: Option[String] = header("WARC-Target-URI")
    def contentType: Option[String] = header("Content-Type")

    /** WARC-Date, parsed as ISO-8601 instant → epoch micros. */
    def dateMicros: Option[Long] = header("WARC-Date").flatMap { s =>
      try {
        val i = Instant.from(DateTimeFormatter.ISO_DATE_TIME.parse(s))
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      } catch { case _: Exception => None }
    }
  }

  private val CRLF = "\r\n".getBytes(UTF_8)

  /** Serialize one record. `date` is epoch micros. Content-Length and
    * the WARC/1.0 version line are supplied here; callers pass only the
    * semantic fields. */
  def encode(
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      dateMicros: Long,
      contentType: String,
      payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val date = DateTimeFormatter.ISO_INSTANT.format(
      Instant.ofEpochSecond(dateMicros / 1000000L,
        (dateMicros % 1000000L) * 1000L))
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Record-ID: $recordId\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    targetUri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload); out.write(CRLF); out.write(CRLF)
    out.toByteArray
  }

  /** Streaming record iterator over a (possibly member-gzipped) WARC
    * stream. `skipPayload(r)` lets a pruning reader avoid materializing
    * payload bytes it will drop — the bytes are skipped, not copied.
    * Malformed framing raises with the byte offset for operability. */
  def records(
      in: InputStream,
      gzipped: Boolean,
      skipPayload: Seq[(String, String)] => Boolean = _ => false)
      : Iterator[Record] = {
    val stream = if (gzipped) new GZIPInputStream(in, 1 << 16)
                 else new BufferedInputStream(in, 1 << 16)
    new Iterator[Record] {
      private var offset = 0L
      private var nextRec: Record = _
      private var done = false

      private def readLine(): String = {
        // header lines are ASCII-ish and short; CR LF terminated
        val buf = new ByteArrayOutputStream(128)
        var b = stream.read()
        while (b != -1 && b != '\n') { buf.write(b); offset += 1; b = stream.read() }
        if (b == '\n') offset += 1
        else if (buf.size == 0) return null // clean EOF between records
        val bytes = buf.toByteArray
        val n = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1
                else bytes.length
        new String(bytes, 0, n, UTF_8)
      }

      private def readFully(len: Int): Array[Byte] = {
        val a = new Array[Byte](len)
        var done = 0
        while (done < len) {
          val n = stream.read(a, done, len - done)
          if (n < 0) throw new EOFException(
            s"truncated WARC payload at offset $offset: needed $len bytes, got $done")
          done += n; offset += n
        }
        a
      }

      private def skipFully(len: Long): Unit = {
        var left = len
        while (left > 0) {
          val n = stream.skip(left)
          if (n > 0) { left -= n; offset += n }
          else if (stream.read() >= 0) { left -= 1; offset += 1 }
          else throw new EOFException(
            s"truncated WARC payload at offset $offset: $left bytes short")
        }
      }

      private def advance(): Unit = {
        // skip inter-record blank lines
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) { done = true; return }
        val recStart = offset - line.length - 2
        if (!line.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"expected WARC version line at offset $recStart, got: " +
              line.take(40))
        val version = line
        val hdrs = Seq.newBuilder[(String, String)]
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) throw new IllegalArgumentException(
            s"malformed WARC header at offset $offset: ${h.take(40)}")
          hdrs += ((h.substring(0, i).trim, h.substring(i + 1).trim))
          h = readLine()
        }
        if (h == null) throw new EOFException(
          s"truncated WARC headers at offset $offset")
        val headers = hdrs.result()
        val len = headers.collectFirst {
          case (k, v) if k.equalsIgnoreCase("Content-Length") => v.toLong
        }.getOrElse(throw new IllegalArgumentException(
          s"WARC record at offset $recStart has no Content-Length"))
        val payload =
          if (skipPayload(headers)) { skipFully(len); Array.emptyByteArray }
          else readFully(len.toInt)
        nextRec = Record(version, headers, payload, recStart)
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): Record = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }
}
