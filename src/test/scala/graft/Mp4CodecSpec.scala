package graft

import org.apache.spark.sql.functions._
import graft.functions.Mp4CodecKernels
import graft.ops.Multimodal

/** ISO-BMFF mux/demux: round trips through every table-parse path
  * (stco + co64, v0 + v1 mdhd, per-sample + uniform stsz, present +
  * absent stss, 32-bit + 64-bit + to-EOF box sizes) and the hostile-
  * input contract (corrupt blobs → ok=0/null, never a throw).
  */
class Mp4CodecSpec extends SparkSpec {

  private def mkSamples(n: Int): Array[Array[Byte]] =
    Array.tabulate(n) { i =>
      val len = 4 + i % 5
      Array.tabulate(len)(j => (0x30 + i * 7 + j).toByte)
    }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** File offset of the first box with the given tag (linear byte scan —
    * fixtures are small; used to patch boxes in place for edge cases).
    */
  private def tagAt(p: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    var i = 4
    while (i + 4 <= p.length) {
      if (p(i) == t(0) && p(i + 1) == t(1) && p(i + 2) == t(2) &&
          p(i + 3) == t(3)) return i - 4
      i += 1
    }
    -1
  }

  test("mux/demux round trip: tables, duration, keyframes, sample bytes") {
    val samples = mkSamples(9)
    val p = Mp4CodecKernels.mp4Encode(samples, 12800, 512, 3)

    val l = Mp4CodecKernels.layout(p)
    assert(l != null)
    assert(l.nSamples === 9)
    assert(l.sizes.toSeq === samples.map(_.length).toSeq)
    assert(l.durationMs === 9L * 512 * 1000 / 12800) // 360
    assert(l.syncIdx.toSeq === Seq(0, 3, 6))

    // the real test: bytes EXTRACTED through stsc/stco match the inputs
    val sync = Mp4CodecKernels.mp4SyncSamples(p)
    assert(sync.length === 3)
    assert(sync(0).toSeq === samples(0).toSeq)
    assert(sync(1).toSeq === samples(3).toSeq)
    assert(sync(2).toSeq === samples(6).toSeq)

    val st = Mp4CodecKernels.mp4DemuxStats(p)
    assert(st(0) === 1L && st(1) === 9L && st(2) === 3L && st(3) === 360L)
    assert(st(4) === samples.map(_.length).sum.toLong)

    // a contiguous reader (ignoring the 2,3-cycle chunk gaps… there are
    // none inside mdat, but chunk 2+ offsets come only from stco) must
    // still agree — now corrupt one stco entry and watch it refuse
    val stco = tagAt(p, "stco")
    assert(stco > 0)
    val broken = p.clone()
    broken(stco + 12) = 0x7f.toByte // first chunk offset → far out of range
    assert(Mp4CodecKernels.layout(broken) == null)
    assert(Mp4CodecKernels.mp4DemuxStats(broken)(0) === 0L)
  }

  test("co64, v1 mdhd, uniform stsz, absent stss, largesize/to-EOF boxes") {
    val samples = mkSamples(7)
    // co64 (64-bit chunk offsets) + version-1 mdhd (64-bit duration)
    val wide = Mp4CodecKernels.mp4EncodeOpt(samples, 1000, 100, 2,
      useCo64 = true, mdhdV1 = true)
    val lw = Mp4CodecKernels.layout(wide)
    assert(lw != null && lw.nSamples === 7 && lw.durationMs === 700L)
    assert(lw.syncIdx.toSeq === Seq(0, 2, 4, 6))
    assert(Mp4CodecKernels.mp4SyncSamples(wide)(3).toSeq === samples(6).toSeq)

    // uniform stsz: equal-size samples, then zero out the per-sample
    // table by setting the uniform field (the parser's other branch)
    val eq = Array.tabulate(6)(i => Array.tabulate(5)(j => (i * 5 + j).toByte))
    val u = Mp4CodecKernels.mp4Encode(eq, 600, 60, 2)
    val stsz = tagAt(u, "stsz")
    u(stsz + 12 + 3) = 5 // sample_size = 5 (was 0 = per-sample)
    val lu = Mp4CodecKernels.layout(u)
    assert(lu != null && lu.sizes.toSeq === Seq.fill(6)(5))
    assert(Mp4CodecKernels.mp4SyncSamples(u)(2).toSeq === eq(4).toSeq)

    // absent stss = every sample is sync: rename the box to a free box
    val noSync = Mp4CodecKernels.mp4Encode(samples, 1000, 100, 3).clone()
    val stss = tagAt(noSync, "stss")
    System.arraycopy("free".getBytes("US-ASCII"), 0, noSync, stss + 4, 4)
    val ln = Mp4CodecKernels.layout(noSync)
    assert(ln != null && ln.syncIdx.toSeq === (0 until 7))

    // moov as a size-1 largesize box (8 extra header bytes): mdat
    // precedes moov, so stco offsets survive the rewrite
    val base = Mp4CodecKernels.mp4Encode(samples, 1000, 100, 2)
    val moov = tagAt(base, "moov")
    val moovSz = be32(base, moov)
    val large = new Array[Byte](base.length + 8)
    System.arraycopy(base, 0, large, 0, moov)
    val bb = java.nio.ByteBuffer.wrap(large, moov, 16)
    bb.putInt(1); bb.put("moov".getBytes("US-ASCII")); bb.putLong(moovSz + 8L)
    System.arraycopy(base, moov + 8, large, moov + 16, base.length - moov - 8)
    val ll = Mp4CodecKernels.layout(large)
    assert(ll != null && ll.nSamples === 7)

    // moov with size 0 (= to end of file)
    val toEof = base.clone()
    java.nio.ByteBuffer.wrap(toEof, moov, 4).putInt(0)
    assert(Mp4CodecKernels.layout(toEof) != null)
  }

  test("hostile co64 offset near Long.MaxValue must not wrap the bound") {
    // `off + size` on a near-MaxValue co64 entry wraps negative, which
    // a naive `> p.length` check would PASS — the parser must reject
    // it via the overflow-safe subtracted bound, never reach the
    // arraycopy/digest with a wild offset
    val wide = Mp4CodecKernels.mp4EncodeOpt(mkSamples(7), 1000, 100, 2,
      useCo64 = true, mdhdV1 = true)
    for (huge <- Seq(Long.MaxValue, Long.MaxValue - 2, Long.MinValue)) {
      val c = wide.clone()
      val co = tagAt(c, "co64")
      assert(co > 0)
      java.nio.ByteBuffer.wrap(c, co + 16, 8).putLong(huge)
      assert(Mp4CodecKernels.layout(c) == null)
      assert(Mp4CodecKernels.mp4DemuxStats(c)(0) === 0L)
      assert(Mp4CodecKernels.mp4SyncSamples(c) == null)
    }
  }

  test("mdhd zero timescale: duration stays -1, never raw stts units") {
    // without a timescale there is no ms conversion — the parser must
    // surface "unknown" (-1), not stts duration units in a _ms field
    val p = Mp4CodecKernels.mp4Encode(mkSamples(5), 1000, 100, 2).clone()
    val mdhd = tagAt(p, "mdhd")
    assert(mdhd > 0)
    java.nio.ByteBuffer.wrap(p, mdhd + 8 + 12, 4).putInt(0) // v0 timescale
    val l = Mp4CodecKernels.layout(p)
    assert(l != null && l.nSamples === 5)
    assert(l.durationMs === -1L)
    assert(Mp4CodecKernels.mp4DemuxStats(p)(0) === 1L)
    assert(Mp4CodecKernels.mp4DemuxStats(p)(3) === -1L)
  }

  test("hostile inputs never throw: truncation, bad tables, junk") {
    val good = Mp4CodecKernels.mp4Encode(mkSamples(9), 12800, 512, 3)
    // every truncation point of a valid file
    var n = 0
    while (n < good.length) {
      val t = java.util.Arrays.copyOf(good, n)
      val st = Mp4CodecKernels.mp4DemuxStats(t)
      assert(st(0) === 0L || n === good.length,
        s"truncation at $n must not parse ok")
      assert(Mp4CodecKernels.mp4SyncSamples(t) == null || st(0) === 1L)
      n += 97
    }
    // assorted corruptions, each must come back ok=0/null, never throw
    def corrupt(f: Array[Byte] => Unit): Unit = {
      val c = good.clone(); f(c)
      assert(Mp4CodecKernels.mp4DemuxStats(c)(0) === 0L)
      assert(Mp4CodecKernels.mp4SyncIndices(c) == null)
    }
    corrupt { c => // stsz count → enormous claim
      val i = tagAt(c, "stsz")
      java.nio.ByteBuffer.wrap(c, i + 16, 4).putInt(Int.MaxValue)
    }
    corrupt { c => // stsc first_chunk 0 (must be 1-based)
      val i = tagAt(c, "stsc")
      java.nio.ByteBuffer.wrap(c, i + 16, 4).putInt(0)
    }
    corrupt { c => // a child box claiming size < 8
      val i = tagAt(c, "stts")
      java.nio.ByteBuffer.wrap(c, i, 4).putInt(4)
    }
    corrupt { c => // sample size pushed past the payload end
      val i = tagAt(c, "stsz")
      java.nio.ByteBuffer.wrap(c, i + 20, 4).putInt(1 << 24)
    }
    // junk that only resembles a container
    assert(Mp4CodecKernels.mp4DemuxStats("ftypftypftypftyp".getBytes)(0) === 0L)
    assert(Mp4CodecKernels.mp4DemuxStats(Array.fill[Byte](64)(0x41))(0) === 0L)
    assert(Mp4CodecKernels.mp4DemuxStats(null)(0) === 0L)
    assert(Mp4CodecKernels.layout(Array.emptyByteArray) == null)
  }

  test("Spark ops: demuxMp4Stats + sampleSyncFrames match the kernel") {
    val docs = Tables.load(spark, sf, "documents")
      .filter(length(col("text")) > 0).limit(50)
    val parts = (0 until 9).map { i =>
      val st = Seq(0, 4, 9, 15, 22, 30, 34, 39, 45)(i)
      s"cast(substring(repeat(text, 52 div length(text) + 1), " +
        s"${st + 1}, ${4 + i % 5}) as binary)"
    }
    val media = docs.select(col("doc_id").as("media_id"),
      graft.functions.Mp4CodecExpressions.mp4Encode(
        expr(s"array(${parts.mkString(",")})"), 12800, 512, 3).as("payload"))

    val stats = Multimodal.demuxMp4Stats(media).cache()
    assert(stats.count() === 50)
    assert(stats.filter(col("ok") === 1).count() === 50)
    assert(stats.filter(col("n_samples") === 9 && col("n_keyframes") === 3 &&
      col("duration_ms") === 360 && col("total_sample_bytes") === 52)
      .count() === 50)

    val frames = Multimodal.sampleSyncFrames(media).cache()
    assert(frames.count() === 150)
    assert(frames.select("frame_idx").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(0L, 3L, 6L))
    // frame bytes equal the text slices they were muxed from
    val joined = frames.join(docs, col("media_id") === col("doc_id"))
      .withColumn("expected", expr(
        "cast(substring(repeat(text, 52 div length(text) + 1), " +
          "CASE frame_idx WHEN 0 THEN 1 WHEN 3 THEN 16 ELSE 35 END, " +
          "CASE frame_idx WHEN 0 THEN 4 WHEN 3 THEN 7 ELSE 5 END) as binary)"))
    assert(joined.filter(col("frame_payload") =!= col("expected")).count() === 0)

    // hostile payloads vanish from the frame stream, stats say ok=0
    val mixed = media.withColumn("payload",
      when(col("media_id") % 5 === 0, lit("junkjunkjunkjunk".getBytes))
        .otherwise(col("payload")))
    assert(Multimodal.demuxMp4Stats(mixed).filter(col("ok") === 0).count() ===
      mixed.filter(col("media_id") % 5 === 0).count())
    assert(Multimodal.sampleSyncFrames(mixed)
      .join(mixed.filter(col("media_id") % 5 === 0), Seq("media_id"))
      .count() === 0)
  }
}
