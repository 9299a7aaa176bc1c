package graft.multimodal

/** Pure-JVM FLAC codec (RFC 9639 subset): mono, 16-bit, fixed
  * blocking. The encoder emits real FLAC — `fLaC` magic, STREAMINFO
  * with the audio MD5, frames with CONSTANT / FIXED(0-2) subframes and
  * rice-coded residuals (escape partitions when raw is cheaper), CRC-8
  * frame headers and CRC-16 frame footers; the decoder handles the
  * full CONSTANT / VERBATIM / FIXED(0-4) subframe family, any rice
  * partition order, both rice methods' parameter widths, and verifies
  * sync, both CRCs and the STREAMINFO MD5 — so "decoded" means
  * bit-verified lossless, not merely parsed.
  *
  * This is the training-pipeline audio format TIFF/LZW is to images:
  * a REAL lossless compressed interchange format within JVM reach
  * (mp3/aac stay environment-stubbed — they need native decoders this
  * container does not ship). Everything here follows the public spec;
  * the fixed predictors are the published order-k difference filters,
  * rice parameters are chosen by exact cost.
  */
object Flac {

  private val Crc8Table: Array[Int] = Array.tabulate(256) { b =>
    var r = b
    var i = 0
    while (i < 8) { r = if ((r & 0x80) != 0) (r << 1) ^ 0x07 else r << 1; i += 1 }
    r & 0xFF
  }
  private val Crc16Table: Array[Int] = Array.tabulate(256) { b =>
    var r = b << 8
    var i = 0
    while (i < 8) { r = if ((r & 0x8000) != 0) (r << 1) ^ 0x8005 else r << 1; i += 1 }
    r & 0xFFFF
  }
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = Crc8Table(c ^ (bytes(i) & 0xFF)); i += 1 }
    c
  }
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) {
      c = ((c << 8) ^ Crc16Table(((c >> 8) ^ (bytes(i) & 0xFF)) & 0xFF)) & 0xFFFF
      i += 1
    }
    c
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(v: Long, bits: Int): Unit = {
      var b = bits
      var x = if (bits == 64) v else v & ((1L << bits) - 1)
      while (b > 0) {
        val take = math.min(8 - nbits, b)
        acc = (acc << take) | ((x >>> (b - take)) & ((1L << take) - 1))
        nbits += take
        b -= take
        if (nbits == 8) { buf.write(acc.toInt & 0xFF); acc = 0; nbits = 0 }
        // remaining low bits of x are selected by the shrinking b
      }
    }
    def alignByte(): Unit = if (nbits > 0) write(0, 8 - nbits)
    def toBytes: Array[Byte] = { require(nbits == 0, "unaligned"); buf.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    def bytePos: Int = (pos / 8).toInt
    def read(bits: Int): Long = {
      var got = 0
      var v = 0L
      while (got < bits) {
        val byteIx = (pos / 8).toInt
        val bitIx = (pos % 8).toInt
        val take = math.min(8 - bitIx, bits - got)
        val chunk = ((bytes(byteIx) & 0xFF) >>> (8 - bitIx - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        got += take
        pos += take
      }
      v
    }
    def readSigned(bits: Int): Long = {
      val v = read(bits)
      if (bits > 0 && (v & (1L << (bits - 1))) != 0) v - (1L << bits) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0) q += 1
      q
    }
    def alignByte(): Unit = if (pos % 8 != 0) pos += 8 - (pos % 8)
  }

  /** UTF-8-style coded number (RFC 9639 §9.1.5) — frame index for
    * fixed blocking. */
  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.write(v, 8)
    else if (v < 0x800) {
      w.write(0xC0L | (v >> 6), 8); w.write(0x80L | (v & 0x3F), 8)
    } else {
      require(v < 0x10000, "frame index beyond encoder range")
      w.write(0xE0L | (v >> 12), 8)
      w.write(0x80L | ((v >> 6) & 0x3F), 8)
      w.write(0x80L | (v & 0x3F), 8)
    }
  }
  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.read(8)
    if ((b0 & 0x80) == 0) b0
    else {
      var extra = 0
      var mask = 0x40
      while ((b0 & mask) != 0) { extra += 1; mask >>= 1 }
      var v = b0 & (mask - 1)
      var i = 0
      while (i < extra) {
        val c = r.read(8)
        require((c & 0xC0) == 0x80, "bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
        i += 1
      }
      v
    }
  }

  private def zigzag(r: Long): Long = if (r >= 0) r << 1 else (-r << 1) - 1
  private def unzigzag(u: Long): Long = if ((u & 1) == 0) u >>> 1 else -((u + 1) >>> 1)

  /** Order-k fixed-predictor residuals (the published difference
    * filters, k = 0..2 used by this encoder). */
  private def fixedResiduals(s: Array[Int], order: Int): Array[Long] =
    order match {
      case 0 => s.map(_.toLong)
      case 1 => Array.tabulate(s.length - 1)(i => (s(i + 1) - s(i)).toLong)
      case 2 => Array.tabulate(s.length - 2)(i =>
        s(i + 2).toLong - 2L * s(i + 1) + s(i))
      case _ => sys.error("encoder uses orders 0-2")
    }

  /** Exact bit cost of rice parameter k over the residuals. */
  private def riceCost(res: Array[Long], k: Int): Long =
    res.foldLeft(0L)((c, r) => c + (zigzag(r) >>> k) + 1 + k)

  /** Exact bit costs of ALL rice parameters 0..14 in ONE unboxed pass
    * (r11): the per-k [[riceCost]] minBy scanned the residuals 15
    * times through a boxing foldLeft — the encoder's hottest loop.
    * costs(k) == riceCost(res, k) by construction. */
  private def riceCostsAll(res: Array[Long]): Array[Long] = {
    val costs = new Array[Long](15)
    var i = 0
    while (i < res.length) {
      val u = zigzag(res(i))
      var k = 0
      while (k < 15) { costs(k) += (u >>> k); k += 1 }
      i += 1
    }
    var k = 0
    while (k < 15) { costs(k) += res.length.toLong * (1 + k); k += 1 }
    costs
  }

  private def bitsFor(res: Array[Long]): Int = {
    var w = 1
    var i = 0
    while (i < res.length) {
      val r = res(i)
      var need = 64 - java.lang.Long.numberOfLeadingZeros(math.abs(r)) + 1
      if (r == 0) need = 1
      if (need > w) w = need
      i += 1
    }
    math.min(w, 31)
  }

  /** The complete encode decision for one subframe, planned ONCE so
    * the assignment-cost comparison and the writer can never disagree
    * about what a subframe costs. */
  private case class SubPlan(constant: Boolean, order: Int,
                             res: Array[Long], k: Int, rice: Boolean,
                             rawBits: Int, bits: Long)

  private def planSubframe(block: Array[Int], bps: Int): SubPlan =
    if (block.forall(_ == block(0)))
      SubPlan(constant = true, 0, Array.empty, 0, rice = false, 0, 8L + bps)
    else {
      // unboxed order/parameter search (r11): same first-minimum
      // tie-breaks as the former minBy spellings, one pass each
      var order = 0
      var res: Array[Long] = null
      var bestAbs = Long.MaxValue
      var o = 0
      val maxO = math.min(2, block.length - 1)
      while (o <= maxO) {
        val r = fixedResiduals(block, o)
        var sum = 0L
        var i = 0
        while (i < r.length) { sum += math.abs(r(i)); i += 1 }
        if (sum < bestAbs) { bestAbs = sum; order = o; res = r }
        o += 1
      }
      val costs = riceCostsAll(res)
      var kBest = 0
      var k = 1
      while (k < 15) { if (costs(k) < costs(kBest)) kBest = k; k += 1 }
      val rawBits = bitsFor(res)
      val rice = costs(kBest) <= 5L + rawBits.toLong * res.length
      val resBits = if (rice) 4L + costs(kBest)
                    else 4L + 5L + rawBits.toLong * res.length
      SubPlan(constant = false, order, res, kBest, rice, rawBits,
        8L + order.toLong * bps + 6L + resBits)
    }

  private def writeSubframe(fw: BitWriter, block: Array[Int], bps: Int,
                            p: SubPlan): Unit =
    if (p.constant) {
      fw.write(0, 1); fw.write(0, 6); fw.write(0, 1) // CONSTANT
      fw.write(block(0).toLong & ((1L << bps) - 1), bps)
    } else {
      fw.write(0, 1); fw.write(8 + p.order, 6); fw.write(0, 1) // FIXED
      var i = 0
      while (i < p.order) {
        fw.write(block(i).toLong & ((1L << bps) - 1), bps); i += 1
      }
      fw.write(0, 2)  // residual method: rice, 4-bit params
      fw.write(0, 4)  // partition order 0
      if (p.rice) {
        fw.write(p.k, 4)
        p.res.foreach { r =>
          val u = zigzag(r)
          var q = (u >>> p.k).toInt
          while (q > 0) { fw.write(0, 1); q -= 1 }
          fw.write(1, 1)
          fw.write(u & ((1L << p.k) - 1), p.k)
        }
      } else {
        fw.write(15, 4)          // escape
        fw.write(p.rawBits, 5)   // raw bit width
        p.res.foreach(r => fw.write(r, p.rawBits))
      }
    }

  /** Encode mono 16-bit samples as a FLAC stream, blocksize 64 (last
    * frame short). Every frame picks CONSTANT when flat, else the
    * cheapest of FIXED(0/1/2) by residual magnitude, with the rice
    * parameter (or raw escape) chosen by exact bit cost. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty, "flac payload needs at least one sample")
    encodeChannels(sampleRate, Array(samples.map(_.toInt)))
  }

  /** Stereo 16-bit FLAC with per-frame CHANNEL DECORRELATION: every
    * frame plans all four spec assignments — independent L/R,
    * left/side, right/side, mid/side (side = L−R at 17 bits,
    * mid = (L+R)>>1; RFC 9639 §4.2) — and writes the cheapest by
    * exact bit cost, so correlated program material compresses through
    * the side channel while uncorrelated channels fall back to
    * independent coding. */
  def encodeStereo(sampleRate: Int, left: Array[Short],
                   right: Array[Short]): Array[Byte] = {
    require(left.nonEmpty && left.length == right.length,
      "stereo payload needs equal-length non-empty channels")
    encodeChannels(sampleRate,
      Array(left.map(_.toInt), right.map(_.toInt)))
  }

  private def encodeChannels(sampleRate: Int,
                             chans: Array[Array[Int]]): Array[Byte] =
    encodeChannelsMeta(sampleRate, chans, seekEveryFrames = 0, Nil, "", 0L)

  /** One SEEKTABLE entry (RFC 9639 §8.4): first sample of a frame, the
    * frame's byte offset relative to the first frame header, and its
    * sample count. */
  final case class SeekPoint(sampleNumber: Long, byteOffset: Long,
                             frameSamples: Int)

  /** One CUESHEET track (RFC 9639 §8.5): first sample and track
    * number; ISRC optional (12 ASCII chars or empty). */
  final case class CueTrack(offsetSamples: Long, number: Int,
                            isrc: String = "")

  /** Parsed + validated stream metadata (see [[readMeta]]). */
  final case class StreamMeta(seekPoints: Seq[SeekPoint], catalog: String,
                              leadIn: Long, cueTracks: Seq[CueTrack],
                              firstFramePos: Int)

  /** The non-CD lead-out track number (RFC 9639: 255; CD cue sheets
    * use 170). [[encodeChannelsMeta]] appends the lead-out
    * automatically; [[readMeta]] requires it last. */
  val LeadOutTrack = 255

  /** [[encode]] plus optional SEEKTABLE / CUESHEET metadata blocks. A
    * seek table every `seekEveryFrames` frames lets [[decodeAt]] start
    * mid-stream without walking prior frames — the random-access
    * primitive a 100 TB audio corpus needs (decode only the window you
    * sample). With both params at their defaults the byte stream is
    * IDENTICAL to [[encode]]'s (FlacMetaSpec pins it), so the existing
    * gate queries are untouched by this extension. */
  def encodeWithMeta(sampleRate: Int, samples: Array[Short],
                     seekEveryFrames: Int = 0,
                     cueTracks: Seq[CueTrack] = Nil,
                     catalog: String = "", leadIn: Long = 0L): Array[Byte] = {
    require(samples.nonEmpty, "empty audio payload")
    encodeChannelsMeta(sampleRate, Array(samples.map(_.toInt)),
      seekEveryFrames, cueTracks, catalog, leadIn)
  }

  def encodeStereoWithMeta(sampleRate: Int, left: Array[Short],
                           right: Array[Short], seekEveryFrames: Int = 0,
                           cueTracks: Seq[CueTrack] = Nil,
                           catalog: String = "", leadIn: Long = 0L): Array[Byte] = {
    require(left.nonEmpty && left.length == right.length,
      "stereo payload needs equal-length non-empty channels")
    encodeChannelsMeta(sampleRate,
      Array(left.map(_.toInt), right.map(_.toInt)),
      seekEveryFrames, cueTracks, catalog, leadIn)
  }

  private def encodeChannelsMeta(sampleRate: Int, chans: Array[Array[Int]],
                                 seekEveryFrames: Int,
                                 cueTracks: Seq[CueTrack], catalog: String,
                                 leadIn: Long): Array[Byte] = {
    val nCh = chans.length
    require(nCh == 1 || nCh == 2, "encoder handles 1 or 2 channels")
    require(seekEveryFrames >= 0, "seekEveryFrames must be >= 0")
    require(catalog.length <= 128 && catalog.forall(c => c >= 0x20 && c <= 0x7E),
      "catalog number is up to 128 printable ASCII chars")
    cueTracks.foreach { t =>
      require(t.number >= 1 && t.number <= 99,
        s"cue track numbers are 1..99, got ${t.number}")
      require(t.isrc.isEmpty || (t.isrc.length == 12 &&
        t.isrc.forall(c => c >= 0x20 && c <= 0x7E)),
        "ISRC is empty or exactly 12 printable ASCII chars")
    }
    require(cueTracks.map(_.number).distinct.length == cueTracks.length,
      "duplicate cue track numbers")
    require(cueTracks.map(_.offsetSamples) == cueTracks.map(_.offsetSamples).sorted,
      "cue track offsets must be non-decreasing")
    val total = chans(0).length
    val B = 64
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (type 0, length 34; last-block only if no other meta)
    val si = new BitWriter
    si.write(B, 16); si.write(B, 16)          // min/max blocksize
    si.write(0, 24); si.write(0, 24)          // min/max framesize unknown
    si.write(sampleRate, 20)
    si.write(nCh - 1, 3)                      // channels - 1
    si.write(15, 5)                           // bps - 1
    si.write(total.toLong, 36)
    // audio MD5: channel-interleaved little-endian 16-bit
    val md5 = java.security.MessageDigest.getInstance("MD5")
    var mi = 0
    while (mi < total) {
      var c = 0
      while (c < nCh) {
        val s = chans(c)(mi)
        md5.update((s & 0xFF).toByte); md5.update(((s >> 8) & 0xFF).toByte)
        c += 1
      }
      mi += 1
    }
    md5.digest().foreach(b => si.write(b & 0xFFL, 8))
    val siBytes = si.toBytes
    val hasSeek = seekEveryFrames > 0
    val hasCue = cueTracks.nonEmpty
    def blockHeader(bt: Int, len: Int, isLast: Boolean): Unit = {
      out.write((if (isLast) 0x80 else 0) | bt)
      out.write((len >> 16) & 0xFF); out.write((len >> 8) & 0xFF)
      out.write(len & 0xFF)
    }
    blockHeader(0, siBytes.length, isLast = !hasSeek && !hasCue)
    out.write(siBytes, 0, siBytes.length)

    // frames render FIRST into their own buffer so seek points carry
    // real first-frame-relative byte offsets (two-pass composition)
    val frames = new java.io.ByteArrayOutputStream()
    val seekPts = scala.collection.mutable.ArrayBuffer.empty[SeekPoint]
    var off = 0
    var frameIx = 0L
    while (off < total) {
      val n = math.min(B, total - off)
      def slice(ch: Int) = Array.tabulate(n)(i => chans(ch)(off + i))
      // per-frame assignment choice: (chanCode, subframes as
      // (block, bps) pairs), cheapest total planned bits wins;
      // ties resolve to the earliest candidate (stable minBy)
      val candidates: Seq[(Int, Seq[(Array[Int], Int)])] =
        if (nCh == 1) Seq(0 -> Seq(slice(0) -> 16))
        else {
          val l = slice(0); val r = slice(1)
          val side = Array.tabulate(n)(i => l(i) - r(i))
          val mid = Array.tabulate(n)(i => (l(i) + r(i)) >> 1)
          Seq(
            1 -> Seq(l -> 16, r -> 16),     // independent
            8 -> Seq(l -> 16, side -> 17),  // left/side
            9 -> Seq(side -> 17, r -> 16),  // right/side
            10 -> Seq(mid -> 16, side -> 17)) // mid/side
        }
      val planned = candidates.map { case (code, subs) =>
        (code, subs.map { case (b, bps) => (b, bps, planSubframe(b, bps)) })
      }
      val (chanCode, subs) = planned.minBy(_._2.map(_._3.bits).sum)
      val w = new BitWriter
      // frame header: sync(14) 0b11111111111110, reserved 0, fixed blocking 0
      w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
      w.write(7, 4)    // blocksize: 16-bit (n-1) at header end
      w.write(13, 4)   // sample rate: 16-bit Hz at header end
      w.write(chanCode, 4)
      w.write(4, 3)    // sample size: 16 bit
      w.write(0, 1)    // reserved
      writeCodedNumber(w, frameIx)
      w.write(n - 1, 16)
      w.write(sampleRate, 16)
      // the header above is byte-aligned by construction (32 header
      // bits + whole coded-number bytes + two 16-bit tails); close it
      // to compute the CRC-8, then continue in a fresh writer
      val headBytes = w.toBytes
      val crcH = crc8(headBytes, 0, headBytes.length)
      val fw = new BitWriter
      headBytes.foreach(b => fw.write(b & 0xFFL, 8))
      fw.write(crcH, 8)
      subs.foreach { case (b, bps, p) => writeSubframe(fw, b, bps, p) }
      fw.alignByte()
      val frameBytes = fw.toBytes
      val crcF = crc16(frameBytes, 0, frameBytes.length)
      if (hasSeek && frameIx % seekEveryFrames == 0)
        seekPts += SeekPoint(off.toLong, frames.size.toLong, n)
      frames.write(frameBytes, 0, frameBytes.length)
      frames.write((crcF >> 8) & 0xFF); frames.write(crcF & 0xFF)
      off += n
      frameIx += 1
    }

    if (hasSeek) {
      val st = new BitWriter
      seekPts.foreach { p =>
        st.write(0, 28); st.write(p.sampleNumber, 36) // u64 sample number
        st.write(0, 32); st.write(p.byteOffset, 32)   // u64 byte offset
        st.write(p.frameSamples, 16)
      }
      val stBytes = st.toBytes
      blockHeader(3, stBytes.length, isLast = !hasCue)
      out.write(stBytes, 0, stBytes.length)
    }
    if (hasCue) {
      val cs = new BitWriter
      val cat = catalog.padTo(128, ' ')
      cat.foreach(c => cs.write(c.toLong & 0xFF, 8))
      cs.write(0, 32); cs.write(leadIn, 32)           // u64 lead-in
      cs.write(0, 8)                                  // is-CD=0 + 7 reserved
      (0 until 258).foreach(_ => cs.write(0, 8))      // reserved
      val all = cueTracks :+ CueTrack(total.toLong, LeadOutTrack)
      cs.write(all.length, 8)
      all.foreach { t =>
        cs.write(0, 32); cs.write(t.offsetSamples, 32) // u64 track offset
        cs.write(t.number, 8)
        t.isrc.padTo(12, ' ').foreach(c => cs.write(c.toLong & 0xFF, 8))
        cs.write(0, 8)                                 // type=0, no pre-emph, 6 reserved
        (0 until 13).foreach(_ => cs.write(0, 8))      // reserved
        val nIdx = if (t.number == LeadOutTrack) 0 else 1
        cs.write(nIdx, 8)
        if (nIdx == 1) {
          cs.write(0, 32); cs.write(0, 32)             // index offset 0
          cs.write(1, 8)                               // index number 1
          (0 until 3).foreach(_ => cs.write(0, 8))     // reserved
        }
      }
      val csBytes = cs.toBytes
      blockHeader(5, csBytes.length, isLast = true)
      out.write(csBytes, 0, csBytes.length)
    }
    val fb = frames.toByteArray
    out.write(fb, 0, fb.length)
    out.toByteArray
  }

  /** Parse + VALIDATE the stream's SEEKTABLE / CUESHEET metadata.
    * Rejections: a seek-table length not a multiple of 18, seek points
    * not strictly increasing in sample number, a byte offset that does
    * not land on a frame-sync boundary inside the stream, a cue sheet
    * without the mandatory trailing lead-out track, or track offsets
    * out of order — a directory that lies about the stream is an
    * error, not a hint (the [[Ico]] discipline). */
  def readMeta(bytes: Array[Byte]): StreamMeta = {
    require(bytes.length > 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "payload is not FLAC")
    var pos = 4
    var last = false
    var seek = Seq.empty[SeekPoint]
    var cat = ""; var leadIn = 0L; var tracks = Seq.empty[CueTrack]
    while (!last) {
      require(pos + 4 <= bytes.length,
        "metadata block header truncated")
      val h = bytes(pos) & 0xFF
      last = (h & 0x80) != 0
      val btype = h & 0x7F
      val len = ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      require(pos + 4 + len <= bytes.length,
        s"metadata block (type $btype, length $len) overruns the stream")
      if (btype == 3) {
        require(len % 18 == 0, "SEEKTABLE length not a multiple of 18")
        val r = new BitReader(bytes, pos + 4)
        seek = (0 until len / 18).map { _ =>
          val sn = (r.read(32) << 32) | r.read(32)
          val bo = (r.read(32) << 32) | r.read(32)
          SeekPoint(sn, bo, r.read(16).toInt)
        }.filter(_.sampleNumber != -1L) // placeholder points skip
        require(seek.map(_.sampleNumber) ==
          seek.map(_.sampleNumber).sorted.distinct,
          "seek points must be strictly increasing")
      } else if (btype == 5) {
        val r = new BitReader(bytes, pos + 4)
        cat = (0 until 128).map(_ => r.read(8).toChar)
          .mkString.takeWhile(_ != ' ')
        leadIn = (r.read(32) << 32) | r.read(32)
        r.read(8); (0 until 258).foreach(_ => r.read(8))
        val n = r.read(8).toInt
        require(n >= 1, "cue sheet needs at least the lead-out track")
        tracks = (0 until n).map { _ =>
          val o = (r.read(32) << 32) | r.read(32)
          val num = r.read(8).toInt
          val isrc = (0 until 12).map(_ => r.read(8).toChar)
            .mkString.takeWhile(_ != ' ')
          r.read(8); (0 until 13).foreach(_ => r.read(8))
          val nIdx = r.read(8).toInt
          (0 until nIdx).foreach { _ =>
            r.read(32); r.read(32); r.read(8)
            (0 until 3).foreach(_ => r.read(8))
          }
          CueTrack(o, num, isrc)
        }
        require(tracks.last.number == LeadOutTrack || tracks.last.number == 170,
          "cue sheet must end with the lead-out track")
        require(tracks.map(_.offsetSamples) ==
          tracks.map(_.offsetSamples).sorted,
          "cue track offsets out of order")
      }
      pos += 4 + len
    }
    // every seek point must land on a frame-sync boundary
    seek.foreach { p =>
      val o = pos + p.byteOffset
      require(o >= pos && o + 1 < bytes.length &&
        (bytes(o.toInt) & 0xFF) == 0xFF &&
        (bytes(o.toInt + 1) & 0xFC) == 0xF8,
        s"seek point ${p.sampleNumber} does not land on a frame sync")
    }
    StreamMeta(seek, cat, leadIn, tracks, pos)
  }

  /** Random access via the SEEKTABLE: decode from the greatest seek
    * point at or before `targetSample` to the end of the stream,
    * WITHOUT touching any earlier frame's bytes. Returns (sample rate,
    * first decoded sample index, per-channel samples from there).
    * Frame sync + CRC-8 + CRC-16 verify on every decoded frame, and
    * each frame's coded number must agree with the sample position —
    * the stream-level MD5 cannot cover a partial decode, so the
    * per-frame integrity surface is the guarantee (FlacMetaSpec pins
    * suffix-equality against a full decode). */
  def decodeAt(bytes: Array[Byte], targetSample: Long)
      : (Int, Long, Array[Array[Int]]) = {
    val meta = readMeta(bytes)
    require(meta.seekPoints.nonEmpty, "stream has no seek table")
    val r0 = new BitReader(bytes, headerStreamInfoPos(bytes) + 4)
    val minBlock = r0.read(16).toInt
    r0.read(16); r0.read(24); r0.read(24)
    val rate = r0.read(20).toInt
    val nCh = r0.read(3).toInt + 1
    r0.read(5)
    val total = r0.read(36)
    require(meta.seekPoints.head.sampleNumber <= targetSample,
      s"targetSample $targetSample precedes the first seek point " +
        s"(${meta.seekPoints.head.sampleNumber}); a window starting " +
        "after the target would be silently wrong")
    val start = meta.seekPoints.filter(_.sampleNumber <= targetSample).last
    var pos = meta.firstFramePos + start.byteOffset.toInt
    val outs = Array.fill(nCh)(new java.util.ArrayList[Int]())
    var sampleAt = start.sampleNumber
    while (sampleAt + outs(0).size < total) {
      val (chansOut, blockSize, codedIx, _, nextPos) =
        decodeFrame(bytes, pos, nCh)
      require(codedIx * minBlock == sampleAt + outs(0).size,
        "frame coded number disagrees with seek position")
      var i = 0
      while (i < blockSize && sampleAt + outs(0).size < total) {
        var c = 0
        while (c < nCh) { outs(c).add(chansOut(c)(i)); c += 1 }
        i += 1
      }
      pos = nextPos
    }
    (rate, sampleAt, outs.map(b => Array.tabulate(b.size)(b.get)))
  }

  /** Decode ONE frame at `frameStart` with full integrity checks
    * (sync, header CRC-8, frame CRC-16). Returns (per-channel samples,
    * block size, coded frame number, channel assignment, next byte
    * position). Shared by the sequential [[decodeAll]] walk and the
    * seek-table random access of [[decodeAt]]. */
  private def decodeFrame(bytes: Array[Byte], frameStart: Int, nCh: Int)
      : (Array[Array[Int]], Int, Long, Int, Int) = {
    val r = new BitReader(bytes, frameStart)
    require(r.read(14) == 0x3FFE, "lost frame sync")
    r.read(1) // reserved
    r.read(1) // blocking strategy
    val bsCode = r.read(4).toInt
    val srCode = r.read(4).toInt
    val chan = r.read(4).toInt
    val ssCode = r.read(3).toInt
    r.read(1)
    require(ssCode == 4, "decoder handles 16-bit frames")
    // subframe widths per assignment: the SIDE subframe carries one
    // extra bit (left/side: ch1; right/side: ch0; mid/side: ch1)
    val widths: Seq[Int] = chan match {
      case 0 => Seq(16)
      case 1 => Seq(16, 16)
      case 8 => Seq(16, 17)
      case 9 => Seq(17, 16)
      case 10 => Seq(16, 17)
      case c => sys.error(s"unsupported channel assignment $c")
    }
    require(widths.length == nCh,
      "frame channel assignment disagrees with STREAMINFO")
    val codedIx = readCodedNumber(r)
    val blockSize = bsCode match {
      case 6 => r.read(8).toInt + 1
      case 7 => r.read(16).toInt + 1
      case c if c >= 1 => BlockSizes(c)
      case _ => sys.error("reserved blocksize code")
    }
    srCode match {
      case 0 => ()
      case 12 => r.read(8)
      case 13 | 14 => r.read(16)
      case c if c <= 11 => ()
      case _ => sys.error("invalid sample rate code")
    }
    val headerEnd = r.bytePos
    val hCrc = r.read(8).toInt
    require(hCrc == crc8(bytes, frameStart, headerEnd), "frame header CRC-8 mismatch")
    val subs = widths.map(wd => readSubframe(r, blockSize, wd)).toArray
    // reconstruct L/R from the side assignments (RFC 9639 §4.2)
    val chansOut: Array[Array[Int]] = chan match {
      case 0 | 1 => subs
      case 8 => // left/side: R = L - side
        Array(subs(0), Array.tabulate(blockSize)(i => subs(0)(i) - subs(1)(i)))
      case 9 => // right/side: L = R + side
        Array(Array.tabulate(blockSize)(i => subs(1)(i) + subs(0)(i)), subs(1))
      case 10 => // mid/side: m2 = (mid<<1)|(side&1); L=(m2+s)/2, R=(m2-s)/2
        val mid = subs(0); val side = subs(1)
        val l = new Array[Int](blockSize); val rr = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) {
          val m2 = (mid(i) << 1) | (side(i) & 1)
          l(i) = (m2 + side(i)) >> 1
          rr(i) = (m2 - side(i)) >> 1
          i += 1
        }
        Array(l, rr)
    }
    r.alignByte()
    val footerStart = r.bytePos
    val fCrc = r.read(16).toInt
    require(fCrc == crc16(bytes, frameStart, footerStart), "frame CRC-16 mismatch")
    (chansOut, blockSize, codedIx, chan, r.bytePos)
  }

  private def headerStreamInfoPos(bytes: Array[Byte]): Int = {
    var pos = 4
    while (true) {
      val h = bytes(pos) & 0xFF
      if ((h & 0x7F) == 0) return pos
      pos += 4 + (((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF))
      require((h & 0x80) == 0, "no STREAMINFO")
    }
    -1
  }

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  /** Decode a mono 16-bit FLAC stream, verifying sync, header CRC-8,
    * frame CRC-16 and the STREAMINFO audio MD5. Returns (sampleRate,
    * samples). */
  def decode(bytes: Array[Byte]): (Int, Array[Int]) = {
    val (rate, chans, _) = decodeAll(bytes)
    require(chans.length == 1, "decoder handles mono 16-bit")
    (rate, chans(0))
  }

  /** Decode a mono or stereo 16-bit FLAC stream with the same
    * verification set as [[decode]]. Returns (sampleRate,
    * channels) — one sample array per channel, side assignments
    * already reconstructed to L/R. */
  def decodeChannels(bytes: Array[Byte]): (Int, Array[Array[Int]]) = {
    val (rate, chans, _) = decodeAll(bytes)
    (rate, chans)
  }

  /** Spec-facing: the channel-assignment code of every frame, so a
    * test can assert the stereo encoder genuinely mixes assignment
    * regimes without trusting the encoder's own bookkeeping. */
  private[graft] def frameAssignments(bytes: Array[Byte]): Array[Int] =
    decodeAll(bytes)._3

  /** One subframe: type/wasted-bits header, warmup + residuals,
    * predictor reconstruction. `sbps` is the subframe's sample width
    * (bps, +1 for a side channel). */
  private def readSubframe(r: BitReader, blockSize: Int,
                           sbps: Int): Array[Int] = {
    require(r.read(1) == 0, "bad subframe padding bit")
    val sfType = r.read(6).toInt
    val wastedFlag = r.read(1)
    var wasted = 0
    if (wastedFlag == 1) { wasted = 1; while (r.read(1) == 0) wasted += 1 }
    val bps = sbps - wasted
    val block = new Array[Int](blockSize)
    if (sfType == 0) {
      val v = r.readSigned(bps).toInt
      java.util.Arrays.fill(block, v)
    } else if (sfType == 1) {
      var i = 0
      while (i < blockSize) { block(i) = r.readSigned(bps).toInt; i += 1 }
    } else if (sfType >= 8 && sfType <= 12) {
      val order = sfType - 8
      var i = 0
      while (i < order) { block(i) = r.readSigned(bps).toInt; i += 1 }
      val res = new Array[Long](blockSize - order)
      val method = r.read(2).toInt
      require(method <= 1, "reserved residual method")
      val pWidth = if (method == 0) 4 else 5
      val escape = if (method == 0) 15 else 31
      val pOrder = r.read(4).toInt
      val parts = 1 << pOrder
      require(blockSize % parts == 0, "partition order does not divide blocksize")
      var ri = 0
      var p = 0
      while (p < parts) {
        val count = (blockSize >> pOrder) - (if (p == 0) order else 0)
        val param = r.read(pWidth).toInt
        if (param == escape) {
          val raw = r.read(5).toInt
          var j = 0
          while (j < count) { res(ri) = r.readSigned(raw); ri += 1; j += 1 }
        } else {
          var j = 0
          while (j < count) {
            val q = r.readUnary()
            val low = r.read(param)
            res(ri) = unzigzag((q.toLong << param) | low)
            ri += 1; j += 1
          }
        }
        p += 1
      }
      // undo the fixed predictor
      i = order
      while (i < blockSize) {
        val pred = order match {
          case 0 => 0L
          case 1 => block(i - 1).toLong
          case 2 => 2L * block(i - 1) - block(i - 2)
          case 3 => 3L * block(i - 1) - 3L * block(i - 2) + block(i - 3)
          case 4 => 4L * block(i - 1) - 6L * block(i - 2) + 4L * block(i - 3) - block(i - 4)
        }
        block(i) = (pred + res(i - order)).toInt
        i += 1
      }
    } else sys.error(s"unsupported subframe type $sfType")
    if (wasted > 0) { var i = 0; while (i < blockSize) { block(i) <<= wasted; i += 1 } }
    block
  }

  private def decodeAll(bytes: Array[Byte])
      : (Int, Array[Array[Int]], Array[Int]) = {
    require(bytes.length > 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "payload is not FLAC")
    var pos = 4
    var rate = -1; var totalSamples = 0L
    var nCh = 1
    var md5Expect: Array[Byte] = null
    var last = false
    while (!last) {
      val h = bytes(pos) & 0xFF
      last = (h & 0x80) != 0
      val btype = h & 0x7F
      val len = ((bytes(pos + 1) & 0xFF) << 16) | ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      if (btype == 0) {
        val r = new BitReader(bytes, pos + 4)
        r.read(16); r.read(16); r.read(24); r.read(24)
        rate = r.read(20).toInt
        nCh = r.read(3).toInt + 1
        val bps = r.read(5).toInt + 1
        require(nCh <= 2 && bps == 16, "decoder handles mono/stereo 16-bit")
        totalSamples = r.read(36)
        md5Expect = Array.tabulate(16)(i => r.read(8).toByte)
      }
      pos += 4 + len
    }
    require(rate > 0, "no STREAMINFO")
    val outs = Array.fill(nCh)(new java.util.ArrayList[Int]())
    val assigns = new java.util.ArrayList[Int]()
    while (outs(0).size < totalSamples) {
      val (chansOut, blockSize, _, chan, nextPos) = decodeFrame(bytes, pos, nCh)
      assigns.add(chan)
      var i = 0
      while (i < blockSize && outs(0).size < totalSamples) {
        var c = 0
        while (c < nCh) { outs(c).add(chansOut(c)(i)); c += 1 }
        i += 1
      }
      pos = nextPos
    }
    val chansArr = outs.map(b => Array.tabulate(b.size)(b.get))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < chansArr(0).length) {
      var c = 0
      while (c < nCh) {
        val s = chansArr(c)(i)
        md5.update((s & 0xFF).toByte); md5.update(((s >> 8) & 0xFF).toByte)
        c += 1
      }
      i += 1
    }
    require(java.util.Arrays.equals(md5.digest(), md5Expect),
      "decoded audio MD5 mismatch — stream is not lossless")
    (rate, chansArr, Array.tabulate(assigns.size)(assigns.get))
  }
}
