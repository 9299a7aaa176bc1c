package graft.multimodal

import java.util.zip.CRC32

/** APNG (the W3C PNG-spec animation extension, folded into the PNG
  * Third Edition; historically the Mozilla APNG spec) on top of
  * [[Png]]'s 8-bit truecolor subset: an animated stream is the plain
  * PNG chunk grammar plus
  *
  *   acTL  num_frames(4) num_plays(4)         — before the first IDAT
  *   fcTL  seq(4) w(4) h(4) x(4) y(4)
  *         delay_num(2) delay_den(2)
  *         dispose_op(1) blend_op(1)          — one per frame
  *   fdAT  seq(4) frame-data                  — frames after the first
  *
  * The FIRST frame's data is the ordinary IDAT stream (this encoder
  * always makes the default image frame 0 of the animation); every
  * later frame is one or more fdAT chunks whose payloads concatenate
  * to a complete zlib scanline stream. fcTL and fdAT share ONE
  * sequence-number space that must be exactly 0,1,2,… in stream order
  * — the spec's defense against reordered/dropped frames, enforced
  * here. Subset: full-canvas frames (x=y=0, frame w/h = canvas),
  * dispose_op NONE and blend_op SOURCE — each frame stands alone, so
  * losslessness is per-frame checkable. All animation chunks are
  * ancillary (lowercase first type byte), so [[Png.decode]] on an
  * APNG still decodes the default image — spec-pinned; an APNG is a
  * valid PNG to a decoder that does not know about animation.
  */
object Apng {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** Encode full-canvas frames (all width×height 0xRRGGBB) with a
    * shared per-frame delay of delayNum/delayDen seconds; numPlays 0 =
    * loop forever. */
  def encode(width: Int, height: Int, frames: Seq[Array[Int]],
             delayNum: Int = 1, delayDen: Int = 10,
             numPlays: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "an animation needs at least one frame")
    require(frames.forall(_.length == width * height),
      "every frame must be full-canvas")
    require(delayDen > 0 && delayNum >= 0 && numPlays >= 0, "bad timing")
    // fcTL carries the delay in 16-bit fields; be16 would silently
    // truncate larger values into a valid-but-different stream
    require(delayNum <= 0xFFFF && delayDen <= 0xFFFF,
      "fcTL delay fields are 16-bit")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Png.PngSignature, 0, Png.PngSignature.length)
    Png.writeChunk(out, "IHDR", Png.ihdrBytes(width, height))
    Png.writeChunk(out, "acTL",
      be32(frames.length.toLong) ++ be32(numPlays.toLong))
    var seq = 0L
    def fctl(): Unit = {
      Png.writeChunk(out, "fcTL",
        be32(seq) ++ be32(width.toLong) ++ be32(height.toLong) ++
          be32(0) ++ be32(0) ++ be16(delayNum) ++ be16(delayDen) ++
          Array[Byte](0 /* DISPOSE_OP_NONE */, 0 /* BLEND_OP_SOURCE */))
      seq += 1
    }
    fctl()
    Png.writeChunk(out, "IDAT",
      Png.filterAndDeflate(width, height, frames.head))
    frames.tail.foreach { fr =>
      fctl()
      Png.writeChunk(out, "fdAT",
        be32(seq) ++ Png.filterAndDeflate(width, height, fr))
      seq += 1
    }
    Png.writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an animated stream: (width, height, frames, (delayNum,
    * delayDen)). Enforces the full PNG structural surface (signature,
    * chunk grammar, CRC-32 of every chunk, IHDR fields) PLUS the
    * animation grammar: acTL before IDAT, an fcTL for every frame,
    * strictly consecutive sequence numbers across fcTL∪fdAT, declared
    * frame count == delivered frames, full-canvas frame geometry, the
    * dispose/blend subset, and per-frame exact inflated length. */
  def decode(bytes: Array[Byte]): (Int, Int, Seq[Array[Int]], (Int, Int)) = {
    require(bytes.length >= 8 + 12 * 4, "payload too short for an APNG")
    var i = 0
    while (i < 8) {
      require(bytes(i) == Png.PngSignature(i), s"bad PNG signature byte $i")
      i += 1
    }
    def u32(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    def u16(o: Int): Int =
      ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
    var pos = 8
    var width = -1; var height = -1
    var sawIhdr = false; var sawIend = false
    var numFrames = -1L
    var expectSeq = 0L
    var delay: (Int, Int) = null
    // frame assembly: each fcTL opens a frame; frame 0's data is the
    // IDAT stream, later frames' data the concatenated fdAT payloads
    val frameStreams = scala.collection.mutable.ArrayBuffer
      .empty[java.io.ByteArrayOutputStream]
    var openFrames = 0
    def requireSeq(got: Long, what: String): Unit = {
      require(got == expectSeq,
        s"$what sequence number $got, expected $expectSeq")
      expectSeq += 1
    }
    while (!sawIend) {
      require(pos + 12 <= bytes.length, "truncated chunk header")
      val len = u32(pos)
      require(len <= Int.MaxValue - 12 && pos + 12 + len <= bytes.length,
        "chunk length overruns payload")
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      val crcStored = u32(dataOff + len.toInt)
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      require(crc.getValue == crcStored, s"CRC mismatch on $tpe chunk")
      tpe match {
        case "IHDR" =>
          require(!sawIhdr && pos == 8, "IHDR must be the first chunk")
          require(len == 13, s"IHDR length $len")
          width = u32(dataOff).toInt; height = u32(dataOff + 4).toInt
          require(width > 0 && height > 0 &&
            3L * width * height + height <= Int.MaxValue,
            s"bad dimensions ${width}x$height")
          require(bytes(dataOff + 8) == 8 && bytes(dataOff + 9) == 2 &&
            bytes(dataOff + 10) == 0 && bytes(dataOff + 11) == 0 &&
            bytes(dataOff + 12) == 0, "unsupported IHDR for this subset")
          sawIhdr = true
        case "acTL" =>
          require(sawIhdr, "acTL before IHDR")
          require(numFrames < 0, "duplicate acTL")
          require(frameStreams.isEmpty, "acTL must precede the first frame")
          require(len == 8, s"acTL length $len")
          numFrames = u32(dataOff)
          require(numFrames >= 1, "acTL declares zero frames")
        case "fcTL" =>
          require(numFrames >= 0, "fcTL before acTL")
          require(len == 26, s"fcTL length $len")
          requireSeq(u32(dataOff), "fcTL")
          require(u32(dataOff + 4) == width && u32(dataOff + 8) == height &&
            u32(dataOff + 12) == 0 && u32(dataOff + 16) == 0,
            "decoder subset requires full-canvas frames")
          val thisDelay = (u16(dataOff + 20), u16(dataOff + 22))
          if (delay == null) delay = thisDelay
          else require(delay == thisDelay,
            "decoder subset requires a uniform frame delay")
          require(bytes(dataOff + 24) == 0, "only DISPOSE_OP_NONE supported")
          require(bytes(dataOff + 25) == 0, "only BLEND_OP_SOURCE supported")
          frameStreams += new java.io.ByteArrayOutputStream()
          openFrames += 1
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          require(numFrames >= 0, "not an animated PNG (no acTL before IDAT)")
          require(frameStreams.length == 1,
            "the IDAT stream must belong to frame 0 (one fcTL before it)")
          frameStreams.head.write(bytes, dataOff, len.toInt)
        case "fdAT" =>
          require(len >= 4, "fdAT too short for its sequence number")
          requireSeq(u32(dataOff), "fdAT")
          require(frameStreams.length >= 2,
            "fdAT before the second frame's fcTL")
          require(frameStreams.head.size() > 0, "fdAT before any IDAT")
          frameStreams.last.write(bytes, dataOff + 4, len.toInt - 4)
        case "IEND" =>
          require(len == 0, "IEND must be empty")
          sawIend = true
        case other =>
          require(sawIhdr, s"$other before IHDR")
          require((bytes(pos + 4) & 0x20) != 0,
            s"unknown critical chunk $other")
      }
      pos += 12 + len.toInt
    }
    require(pos == bytes.length, "trailing bytes after IEND")
    require(numFrames >= 0, "not an animated PNG (no acTL)")
    require(frameStreams.length.toLong == numFrames,
      s"acTL declared $numFrames frames, stream delivered ${frameStreams.length}")
    require(frameStreams.forall(_.size() > 0), "a frame has no data")
    val frames = frameStreams.toSeq.map(s =>
      Png.inflateAndReconstruct(width, height, s.toByteArray))
    (width, height, frames, delay)
  }
}
