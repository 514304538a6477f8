package graft

import graft.functions.WarcKernels

/** WARC framing: plain + per-record-gzip round trips and the
  * all-or-nothing hostile-input contract (a truncated shard must be
  * caught, not silently half-read).
  */
class WarcSpec extends SparkSpec {

  private def rec(tpe: String, body: String): String =
    s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" +
      body + "\r\n\r\n"

  private val twoRecs =
    rec("warcinfo", "software: test\r\n") +
      rec("response", "HTTP/1.1 200 OK\r\n\r\nhello world")

  test("plain framing round trip") {
    val rs = WarcKernels.warcRecords(twoRecs.getBytes("UTF-8"))
    assert(rs != null && rs.length === 2)
    assert(new String(rs(0), "UTF-8").endsWith("software: test\r\n"))
    assert(new String(rs(1), "UTF-8").endsWith("hello world"))
    assert(new String(rs(1), "UTF-8").startsWith("WARC/1.0"))
  }

  test("per-record gzip members (the .warc.gz shape) parse identically") {
    val out = new java.io.ByteArrayOutputStream()
    Seq(rec("warcinfo", "software: test\r\n"),
      rec("response", "HTTP/1.1 200 OK\r\n\r\nhello world")).foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r.getBytes("UTF-8")); gz.finish()
    }
    val rs = WarcKernels.warcRecords(out.toByteArray)
    assert(rs != null && rs.length === 2)
    assert(new String(rs(1), "UTF-8").endsWith("hello world"))
  }

  test("hostile inputs: all-or-nothing, never a throw") {
    val good = twoRecs.getBytes("UTF-8")
    // a cut BETWEEN records is a legal shorter file; a cut INSIDE a
    // record must fail whole — never a partial record in the output
    val expected = Seq(rec("warcinfo", "software: test\r\n"),
      rec("response", "HTTP/1.1 200 OK\r\n\r\nhello world"))
      .map(_.dropRight(4)) // slices exclude the trailing \r\n\r\n
    var n = 1
    while (n < good.length) {
      val t = WarcKernels.warcRecords(java.util.Arrays.copyOf(good, n))
      assert(t == null ||
        t.toSeq.map(new String(_, "UTF-8")) == expected.take(t.length),
        s"truncation at $n must fail whole or end on a record boundary")
      n += 1
    }
    assert(WarcKernels.warcRecords(null) == null)
    assert(WarcKernels.warcRecords(Array.emptyByteArray) == null)
    assert(WarcKernels.warcRecords("not a warc at all".getBytes) == null)
    // missing Content-Length
    assert(WarcKernels.warcRecords(
      "WARC/1.0\r\nWARC-Type: x\r\n\r\nbody".getBytes) == null)
    // declared length runs past the end
    assert(WarcKernels.warcRecords(
      "WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort".getBytes) == null)
    // corrupt gzip stream
    val gz = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 42, 42)
    assert(WarcKernels.warcRecords(gz) == null)
  }
}
