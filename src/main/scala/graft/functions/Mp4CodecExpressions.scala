package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Real ISO-BMFF (MP4) container demux — the honest limit of "video
  * decode" without a codec library. Demuxing IS real work a 100-TB
  * video-corpus pipeline does before any decoder runs: walk
  * moov→trak→mdia→minf→stbl, join the four sample tables
  * (stts durations, stsz sizes, stsc sample→chunk map, stco/co64 chunk
  * offsets, stss sync marks), and pull the actual access-unit bytes out
  * of mdat. Only INTER-FRAME PIXEL decode (H.264 etc.) stays out — no
  * such codec ships in the JDK.
  *
  * Encode exists so tests and oracle queries can mint byte-exact
  * containers from deterministic payloads (the [[MediaCodecKernels]]
  * pattern); the demuxer is the operator under test. The muxer writes
  * multi-sample chunks (cycle 2,3 samples per chunk) so the stsc/stco
  * indirection BINDS — a reader that assumes one-sample-per-chunk or
  * contiguous samples gets every offset after chunk 1 wrong.
  *
  * Reference behavior: the reference treats media payloads as opaque
  * bytes end-to-end; this extends the probe-only surface
  * (`Multimodal.Probe`'s mvhd/tkhd walk) to real sample extraction.
  */
object Mp4CodecKernels {

  /** Max samples a payload may declare — corpus-scale hostile-input
    * bound (a 4-byte count field can claim 2^32).
    */
  private val MaxSamples = 1 << 20

  private def ascii(p: Array[Byte], i: Int, n: Int): String =
    new String(p, i, n, "US-ASCII")
  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
  private def be32u(p: Array[Byte], i: Int): Long = be32(p, i).toLong & 0xffffffffL
  private def be64(p: Array[Byte], i: Int): Long =
    (be32u(p, i) << 32) | be32u(p, i + 4)

  /** Parsed sample layout: everything a frame sampler needs. `offsets`
    * are absolute file offsets resolved through stsc/stco — already
    * bounds-checked against the payload.
    */
  final class Layout(val sizes: Array[Int], val offsets: Array[Long],
                     val syncIdx: Array[Int], val durationMs: Long) {
    def nSamples: Int = sizes.length
    def totalBytes: Long = { var s = 0L; var i = 0
      while (i < sizes.length) { s += sizes(i); i += 1 }; s }
  }

  /** Walk the container and resolve the full sample layout; null on any
    * hostile/malformed input (corrupt blobs are data at corpus scale,
    * not exceptions). Handles size-0 (to-EOF) and size-1 (64-bit
    * largesize) boxes, co64, v0/v1 mdhd, and absent stss (= all sync).
    */
  def layout(p: Array[Byte]): Layout = {
    if (p == null || p.length < 16 || ascii(p, 4, 4) != "ftyp") return null
    // (type, payloadStart, end) of the box at i, or null when malformed
    def boxAt(i: Int, until: Int): (String, Int, Int) = {
      if (i + 8 > until) return null
      var size = be32u(p, i)
      var ps = i + 8
      if (size == 1) {
        if (i + 16 > until) return null
        size = be64(p, i + 8)
        ps = i + 16
      } else if (size == 0) size = until.toLong - i
      val end = i + size
      if (size < 8 || end > until || end <= i || ps > end) null
      else (ascii(p, i + 4, 4), ps, end.toInt)
    }
    def findChild(from: Int, until: Int, tpe: String): (Int, Int) = {
      var i = from
      while (i + 8 <= until) {
        val b = boxAt(i, until)
        if (b == null) return null
        if (b._1 == tpe) return (b._2, b._3)
        i = b._3
      }
      null
    }
    val moov = findChild(0, p.length, "moov")
    if (moov == null) return null

    // first trak whose stbl carries a sample-size table is the media
    // track; iterate traks rather than assuming the first is it
    var stbl: (Int, Int) = null
    var mdhd: (Int, Int) = null
    var ti = moov._1
    while (stbl == null && ti + 8 <= moov._2) {
      val b = boxAt(ti, moov._2)
      if (b == null) return null
      if (b._1 == "trak") {
        val mdia = findChild(b._2, b._3, "mdia")
        if (mdia != null) {
          val minf = findChild(mdia._1, mdia._2, "minf")
          val st = if (minf == null) null
            else findChild(minf._1, minf._2, "stbl")
          if (st != null && findChild(st._1, st._2, "stsz") != null) {
            stbl = st
            mdhd = findChild(mdia._1, mdia._2, "mdhd")
          }
        }
      }
      ti = b._3
    }
    if (stbl == null) return null

    // ---- mdhd: media timescale + duration (v0 32-bit, v1 64-bit) ----
    var durationMs = -1L
    if (mdhd != null && mdhd._1 < mdhd._2) {
      val ps = mdhd._1
      val v = p(ps) & 0xff
      if (v == 0 && ps + 20 <= mdhd._2) {
        val ts = be32u(p, ps + 12); val d = be32u(p, ps + 16)
        if (ts > 0) durationMs = d * 1000L / ts
      } else if (v == 1 && ps + 32 <= mdhd._2) {
        val ts = be32u(p, ps + 20); val d = be64(p, ps + 24)
        if (ts > 0 && d >= 0) durationMs = d * 1000L / ts
      }
    }

    // ---- stsz: per-sample sizes (or one uniform size) ----
    val stsz = findChild(stbl._1, stbl._2, "stsz")
    if (stsz == null || stsz._1 + 12 > stsz._2) return null
    val uniform = be32(p, stsz._1 + 4)
    val n = be32(p, stsz._1 + 8)
    if (n < 0 || n > MaxSamples) return null
    val sizes = new Array[Int](n)
    if (uniform != 0) {
      if (uniform < 0) return null
      java.util.Arrays.fill(sizes, uniform)
    } else {
      if (stsz._1 + 12 + 4L * n > stsz._2) return null
      var i = 0
      while (i < n) {
        val s = be32(p, stsz._1 + 12 + 4 * i)
        if (s < 0) return null
        sizes(i) = s; i += 1
      }
    }

    // ---- stco / co64: chunk offsets ----
    var co = findChild(stbl._1, stbl._2, "stco")
    var wide = false
    if (co == null) { co = findChild(stbl._1, stbl._2, "co64"); wide = true }
    if (co == null || co._1 + 8 > co._2) return null
    val nc = be32(p, co._1 + 4)
    if (nc < 0 || nc > MaxSamples ||
        co._1 + 8 + (if (wide) 8L else 4L) * nc > co._2) return null
    val chunkOff = new Array[Long](nc)
    var ci = 0
    while (ci < nc) {
      chunkOff(ci) =
        if (wide) be64(p, co._1 + 8 + 8 * ci) else be32u(p, co._1 + 8 + 4 * ci)
      ci += 1
    }

    // ---- stsc: run-compressed samples-per-chunk ----
    val stsc = findChild(stbl._1, stbl._2, "stsc")
    if (stsc == null || stsc._1 + 8 > stsc._2) return null
    val ne = be32(p, stsc._1 + 4)
    if (ne <= 0 || ne > MaxSamples ||
        stsc._1 + 8 + 12L * ne > stsc._2) return null
    val runFirst = new Array[Int](ne) // 1-based first chunk of each run
    val runSpc = new Array[Int](ne)
    var ei = 0
    while (ei < ne) {
      runFirst(ei) = be32(p, stsc._1 + 8 + 12 * ei)
      runSpc(ei) = be32(p, stsc._1 + 8 + 12 * ei + 4)
      if (runFirst(ei) < 1 || runSpc(ei) < 0 ||
          (ei > 0 && runFirst(ei) <= runFirst(ei - 1))) return null
      ei += 1
    }

    // ---- resolve absolute per-sample offsets through the chunk map ----
    val offsets = new Array[Long](n)
    var s = 0
    var run = 0
    ci = 0
    while (ci < nc && s < n) {
      while (run + 1 < ne && runFirst(run + 1) <= ci + 1) run += 1
      var off = chunkOff(ci)
      var j = 0
      while (j < runSpc(run) && s < n) {
        // overflow-safe bound: a hostile co64 offset near Long.MaxValue
        // would wrap `off + sizes(s)` negative and slip past a
        // `> p.length` check — compare against the subtracted bound
        // instead (a size larger than the payload makes the RHS
        // negative, which any off >= 0 correctly fails)
        if (off < 0 || off > p.length.toLong - sizes(s)) return null
        offsets(s) = off
        off += sizes(s)
        s += 1; j += 1
      }
      ci += 1
    }
    if (s != n) return null // tables disagree on the sample count

    // NO stts fallback when mdhd is absent/zero: stts durations are in
    // timescale units, and without a timescale there is no conversion
    // to milliseconds — surfacing raw units in a field named
    // duration_ms would silently change the column's unit with the
    // container's shape. durationMs stays -1 (= unknown).

    // ---- stss: sync samples (1-based); absent = every sample syncs ----
    val stss = findChild(stbl._1, stbl._2, "stss")
    val syncIdx: Array[Int] =
      if (stss == null) Array.tabulate(n)(identity)
      else {
        if (stss._1 + 8 > stss._2) return null
        val k = be32(p, stss._1 + 4)
        if (k < 0 || k > n || stss._1 + 8 + 4L * k > stss._2) return null
        val out = new Array[Int](k)
        var i = 0
        while (i < k) {
          val sn = be32(p, stss._1 + 8 + 4 * i)
          if (sn < 1 || sn > n || (i > 0 && sn <= out(i - 1) + 1)) return null
          out(i) = sn - 1; i += 1
        }
        out
      }
    new Layout(sizes, offsets, syncIdx, durationMs)
  }

  /** 60-bit MD5 prefix of a payload slice — bit-identical to the
    * engine-portable `h60` used across the oracle board
    * (`conv(substring(md5(x),1,15),16,10)`): the first 15 hex chars are
    * the digest's top 60 bits.
    */
  private def sliceH60(p: Array[Byte], off: Long, len: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(p, off.toInt, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Demux stats: `[ok, n_samples, n_keyframes, duration_ms,
    * total_sample_bytes, samples_h60_xor]`. The checksum XORs the h60 of
    * every sample's ACTUAL bytes pulled out of mdat through the
    * stsc/stco/stsz indirection — a reader that only parses headers
    * cannot produce it. Hostile input → ok=0 row of zeros, never a throw.
    */
  def mp4DemuxStats(p: Array[Byte]): Array[Long] = {
    val out = new Array[Long](6)
    val l = layout(p)
    if (l == null) return out
    var xor = 0L
    var i = 0
    while (i < l.nSamples) {
      xor ^= sliceH60(p, l.offsets(i), l.sizes(i))
      i += 1
    }
    out(0) = 1L
    out(1) = l.nSamples.toLong
    out(2) = l.syncIdx.length.toLong
    out(3) = l.durationMs
    out(4) = l.totalBytes
    out(5) = xor
    out
  }

  /** 0-based sample indices of the sync (key) frames; null on hostile
    * input.
    */
  def mp4SyncIndices(p: Array[Byte]): Array[Int] = {
    val l = layout(p)
    if (l == null) null else l.syncIdx
  }

  /** The sync samples' raw access-unit bytes, extracted from mdat in
    * stss order; null on hostile input. This is the REAL frame sampler:
    * the returned blobs are exactly what a downstream decoder would be
    * handed.
    */
  def mp4SyncSamples(p: Array[Byte]): Array[Array[Byte]] = {
    val l = layout(p)
    if (l == null) return null
    val out = new Array[Array[Byte]](l.syncIdx.length)
    var i = 0
    while (i < l.syncIdx.length) {
      val s = l.syncIdx(i)
      val b = new Array[Byte](l.sizes(s))
      System.arraycopy(p, l.offsets(s).toInt, b, 0, l.sizes(s))
      out(i) = b
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Muxer (fixture minting)
  // ------------------------------------------------------------------

  /** Chunk sample-counts for n samples: cycle 2,3 with the remainder in
    * the last chunk — multi-sample, non-uniform chunks so stsc binds.
    */
  private def chunkPlan(n: Int): Array[Int] = {
    val b = Array.newBuilder[Int]
    var left = n
    var k = 0
    while (left > 0) {
      val c = math.min(if (k % 2 == 0) 2 else 3, left)
      b += c
      left -= c
      k += 1
    }
    b.result()
  }

  def mp4Encode(samples: Array[Array[Byte]], timescale: Int, delta: Int,
                keyEvery: Int): Array[Byte] =
    mp4EncodeOpt(samples, timescale, delta, keyEvery,
      useCo64 = false, mdhdV1 = false)

  /** Write a minimal-but-valid ISO-BMFF file: ftyp, mdat (samples in
    * cycle-2,3 chunks), moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
    * minf(vmhd, dinf, stbl(stsd, stts, stss, stsc, stsz, stco))))).
    * `useCo64`/`mdhdV1` exist so specs exercise the 64-bit parse paths.
    */
  def mp4EncodeOpt(samples: Array[Array[Byte]], timescale: Int, delta: Int,
                   keyEvery: Int, useCo64: Boolean,
                   mdhdV1: Boolean): Array[Byte] = {
    val n = samples.length
    require(n > 0 && timescale > 0 && delta > 0 && keyEvery > 0,
      s"bad mux params: n=$n timescale=$timescale delta=$delta key=$keyEvery")
    var total = 0L
    samples.foreach { s => require(s != null, "null sample"); total += s.length }
    require(total <= (1 << 28), s"fixture too large: $total")

    val chunks = chunkPlan(n)
    val nc = chunks.length
    // stsc run-compress the chunk plan
    val runs = Array.newBuilder[(Int, Int)] // (firstChunk 1-based, spc)
    var i = 0
    while (i < nc) {
      if (i == 0 || chunks(i) != chunks(i - 1)) runs += ((i + 1, chunks(i)))
      i += 1
    }
    val stscRuns = runs.result()
    val nk = (n + keyEvery - 1) / keyEvery // keyframes at 1, 1+k, ...

    val ftypSz = 24
    val mdatSz = 8 + total.toInt
    val mdhdSz = if (mdhdV1) 44 else 32
    val stsdSz = 16 + 86
    val sttsSz = 24
    val stssSz = 16 + 4 * nk
    val stscSz = 16 + 12 * stscRuns.length
    val stszSz = 20 + 4 * n
    val stcoSz = 16 + (if (useCo64) 8 else 4) * nc
    val stblSz = 8 + stsdSz + sttsSz + stssSz + stscSz + stszSz + stcoSz
    val minfSz = 8 + 20 + 36 + stblSz
    val mdiaSz = 8 + mdhdSz + 38 + minfSz
    val trakSz = 8 + 92 + mdiaSz
    val moovSz = 8 + 108 + trakSz

    val buf = java.nio.ByteBuffer.allocate(ftypSz + mdatSz + moovSz)
    def tag(s: String): Unit = buf.put(s.getBytes("US-ASCII"))

    // ftyp
    buf.putInt(ftypSz); tag("ftyp"); tag("isom"); buf.putInt(0x200)
    tag("isom"); tag("iso2")

    // mdat — chunk offsets recorded as we write
    buf.putInt(mdatSz); tag("mdat")
    val chunkOff = new Array[Long](nc)
    var s = 0
    i = 0
    while (i < nc) {
      chunkOff(i) = buf.position().toLong
      var j = 0
      while (j < chunks(i)) { buf.put(samples(s)); s += 1; j += 1 }
      i += 1
    }

    val duration = n.toLong * delta
    // moov / mvhd (v0)
    buf.putInt(moovSz); tag("moov")
    buf.putInt(108); tag("mvhd"); buf.putInt(0) // version 0, flags 0
    buf.putInt(0); buf.putInt(0) // ctime, mtime
    buf.putInt(timescale); buf.putInt(duration.toInt)
    buf.putInt(0x00010000); buf.putShort(0x0100.toShort); buf.putShort(0)
    buf.putLong(0) // reserved
    // identity matrix
    buf.putInt(0x00010000); buf.putInt(0); buf.putInt(0)
    buf.putInt(0); buf.putInt(0x00010000); buf.putInt(0)
    buf.putInt(0); buf.putInt(0); buf.putInt(0x40000000)
    var k = 0
    while (k < 6) { buf.putInt(0); k += 1 } // predefined
    buf.putInt(2) // next track id

    // trak / tkhd (v0, flags=7: enabled|in-movie|in-preview)
    buf.putInt(trakSz); tag("trak")
    buf.putInt(92); tag("tkhd"); buf.putInt(7)
    buf.putInt(0); buf.putInt(0) // ctime, mtime
    buf.putInt(1); buf.putInt(0) // track id, reserved
    buf.putInt(duration.toInt)
    buf.putLong(0) // reserved
    buf.putShort(0); buf.putShort(0); buf.putShort(0); buf.putShort(0)
    buf.putInt(0x00010000); buf.putInt(0); buf.putInt(0)
    buf.putInt(0); buf.putInt(0x00010000); buf.putInt(0)
    buf.putInt(0); buf.putInt(0); buf.putInt(0x40000000)
    buf.putInt(16 << 16); buf.putInt(16 << 16) // 16.16 width, height

    // mdia / mdhd
    buf.putInt(mdiaSz); tag("mdia")
    buf.putInt(mdhdSz); tag("mdhd")
    if (mdhdV1) {
      buf.putInt(0x01000000) // version 1
      buf.putLong(0); buf.putLong(0) // 64-bit ctime, mtime
      buf.putInt(timescale); buf.putLong(duration)
    } else {
      buf.putInt(0)
      buf.putInt(0); buf.putInt(0)
      buf.putInt(timescale); buf.putInt(duration.toInt)
    }
    buf.putShort(0x55c4.toShort); buf.putShort(0) // lang "und", predefined

    // hdlr (name "graft\0")
    buf.putInt(38); tag("hdlr"); buf.putInt(0); buf.putInt(0)
    tag("vide"); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    tag("graft"); buf.put(0.toByte)

    // minf / vmhd / dinf(dref(url))
    buf.putInt(minfSz); tag("minf")
    buf.putInt(20); tag("vmhd"); buf.putInt(1)
    buf.putShort(0); buf.putShort(0); buf.putShort(0); buf.putShort(0)
    buf.putInt(36); tag("dinf")
    buf.putInt(28); tag("dref"); buf.putInt(0); buf.putInt(1)
    buf.putInt(12); tag("url "); buf.putInt(1) // flag 1: self-contained

    // stbl
    buf.putInt(stblSz); tag("stbl")
    // stsd: one minimal mp4v visual sample entry (no esds — demux
    // fixtures carry deterministic bytes, not a real bitstream)
    buf.putInt(stsdSz); tag("stsd"); buf.putInt(0); buf.putInt(1)
    buf.putInt(86); tag("mp4v")
    buf.putInt(0); buf.putShort(0); buf.putShort(1) // reserved, dref idx
    k = 0
    while (k < 4) { buf.putInt(0); k += 1 } // predefined/reserved (16)
    buf.putShort(16); buf.putShort(16) // width, height
    buf.putInt(0x00480000); buf.putInt(0x00480000) // 72 dpi
    buf.putInt(0); buf.putShort(1) // reserved, frame count
    k = 0
    while (k < 32) { buf.put(0.toByte); k += 1 } // compressorname
    buf.putShort(24); buf.putShort(-1) // depth, predefined
    // stts: one run
    buf.putInt(sttsSz); tag("stts"); buf.putInt(0); buf.putInt(1)
    buf.putInt(n); buf.putInt(delta)
    // stss: 1-based keyframe sample numbers
    buf.putInt(stssSz); tag("stss"); buf.putInt(0); buf.putInt(nk)
    k = 0
    while (k < nk) { buf.putInt(1 + k * keyEvery); k += 1 }
    // stsc
    buf.putInt(stscSz); tag("stsc"); buf.putInt(0); buf.putInt(stscRuns.length)
    stscRuns.foreach { case (fc, spc) =>
      buf.putInt(fc); buf.putInt(spc); buf.putInt(1)
    }
    // stsz: per-sample sizes
    buf.putInt(stszSz); tag("stsz"); buf.putInt(0); buf.putInt(0); buf.putInt(n)
    samples.foreach(sm => buf.putInt(sm.length))
    // stco / co64
    buf.putInt(stcoSz); tag(if (useCo64) "co64" else "stco"); buf.putInt(0)
    buf.putInt(nc)
    chunkOff.foreach(o => if (useCo64) buf.putLong(o) else buf.putInt(o.toInt))

    require(buf.remaining() == 0, s"mux size math off by ${buf.remaining()}")
    buf.array()
  }

  /** ArrayData adapter for the encode expression's codegen path. */
  def mp4EncodeData(samples: ArrayData, timescale: Int, delta: Int,
                    keyEvery: Int): Array[Byte] = {
    val n = samples.numElements()
    val arr = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { arr(i) = samples.getBinary(i); i += 1 }
    mp4Encode(arr, timescale, delta, keyEvery)
  }
}

/** `mp4_encode(samples)`: array<binary> access units → ISO-BMFF file. */
case class Mp4Encode(child: Expression, timescale: Int, delta: Int,
                     keyEvery: Int) extends UnaryExpression {
  require(timescale > 0 && delta > 0 && keyEvery > 0,
    s"bad mux params: timescale=$timescale delta=$delta key=$keyEvery")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mp4_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mp4_encode requires array<binary>, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    Mp4CodecKernels.mp4EncodeData(
      v.asInstanceOf[ArrayData], timescale, delta, keyEvery)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.Mp4CodecKernels.mp4EncodeData($v, $timescale, " +
        s"$delta, $keyEvery)")
  override protected def withNewChildInternal(
      newChild: Expression): Mp4Encode = copy(child = newChild)
}

/** `mp4_demux_stats(payload)` → [ok, n_samples, n_keyframes,
  * duration_ms, total_sample_bytes, samples_h60_xor].
  */
case class Mp4DemuxStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mp4_demux_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mp4_demux_stats requires binary, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      Mp4CodecKernels.mp4DemuxStats(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Mp4CodecKernels.mp4DemuxStats($v))")
  override protected def withNewChildInternal(
      newChild: Expression): Mp4DemuxStats = copy(child = newChild)
}

/** `mp4_sync_indices(payload)` → array<int> 0-based keyframe sample
  * indices; null on hostile input (BmpResizeNn null contract).
  */
case class Mp4SyncIndices(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "mp4_sync_indices"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mp4_sync_indices requires binary, got ${t.catalogString}")
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = Mp4CodecKernels.mp4SyncIndices(v.asInstanceOf[Array[Byte]])
    if (s == null) null else new GenericArrayData(s)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val s = ctx.freshName("syncIdx")
      s"""int[] $s = graft.functions.Mp4CodecKernels.mp4SyncIndices($v);
         |${ev.isNull} = $s == null;
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($s);
         |}""".stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): Mp4SyncIndices = copy(child = newChild)
}

/** `mp4_sync_samples(payload)` → array<binary> keyframe access-unit
  * bytes extracted from mdat; null on hostile input.
  */
case class Mp4SyncSamples(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "mp4_sync_samples"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mp4_sync_samples requires binary, got ${t.catalogString}")
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = Mp4CodecKernels.mp4SyncSamples(v.asInstanceOf[Array[Byte]])
    if (s == null) null
    else new GenericArrayData(s.asInstanceOf[Array[AnyRef]])
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val s = ctx.freshName("syncSamples")
      s"""byte[][] $s = graft.functions.Mp4CodecKernels.mp4SyncSamples($v);
         |${ev.isNull} = $s == null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util
         |    .GenericArrayData((Object[]) $s);
         |}""".stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): Mp4SyncSamples = copy(child = newChild)
}

object Mp4CodecExpressions {
  def mp4Encode(samples: Column, timescale: Int, delta: Int,
                keyEvery: Int): Column =
    ColumnBridge.column(Mp4Encode(
      ColumnBridge.expression(samples), timescale, delta, keyEvery))
  def mp4DemuxStats(payload: Column): Column =
    ColumnBridge.column(Mp4DemuxStats(ColumnBridge.expression(payload)))
  def mp4SyncIndices(payload: Column): Column =
    ColumnBridge.column(Mp4SyncIndices(ColumnBridge.expression(payload)))
  def mp4SyncSamples(payload: Column): Column =
    ColumnBridge.column(Mp4SyncSamples(ColumnBridge.expression(payload)))
}
