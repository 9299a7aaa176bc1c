package graft.multimodal

/** WebP lossless (VP8L, RFC 9649) — the largest crawl image format
  * still within pure-JVM reach: a RIFF container around an
  * LZ77 + canonical-Huffman entropy-coded ARGB stream with spatial
  * transforms and a color cache. Implemented from the public spec for
  * the subset this repo's codecs standardize on (8-bit opaque
  * truecolor, the [[Png]] color-type-2 restriction):
  *
  *  - ENCODER: subtract-green transform, 8-bit color cache, real LZ77
  *    backward references (hash-chained, linear-distance plane codes),
  *    per-channel canonical Huffman codes with code-length-coded
  *    headers (zero-run codes 17/18) and the spec's simple-code form
  *    for degenerate trees — every VP8L coding tool except the
  *    predictor/cross-color transforms and meta-Huffman partitioning.
  *  - DECODER: enforces the container grammar (RIFF/WEBP/VP8L tags,
  *    chunk sizes vs buffer length), the 0x2F signature, version 0,
  *    transform/cache-bit ranges, complete (neither over- nor
  *    under-subscribed) Huffman codes, in-bounds backward references
  *    and cache indices, exactly width*height decoded pixels, and at
  *    most 7 trailing padding bits. Subset boundaries REJECT loudly
  *    rather than guess: predictor/cross-color/color-indexing
  *    transforms, meta-Huffman, short-distance plane codes (the
  *    spec's 120-entry neighbor table) and non-opaque alpha are
  *    errors naming the unsupported feature — the [[Ico]] discipline:
  *    a stream that needs a tool we don't implement must never decode
  *    to silently wrong pixels.
  *
  * Like QOI/BMP the format carries no checksum, so losslessness is
  * proved by the query layer comparing decoded pixels to the source
  * formula (the shared [[Qoi.testImage]]), and WebpSpec's token
  * walker asserts the encoder genuinely exercises literals, LZ77
  * copies and cache hits (coverage is a property to test, not hope
  * for). Bit conventions per the spec: bytes are consumed LSB-first;
  * canonical Huffman codes are packed starting from the code's most
  * significant bit.
  */
object Webp {

  private val CodeLengthOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
  private val NumLiterals = 256
  private val NumLengthCodes = 24
  private val NumDistanceCodes = 40
  private val CacheBits = 8 // encoder's choice; decoder accepts 1..11
  private val MaxCopyLen = 4096 // prefix code 23's ceiling
  private val HashMul = 0x1e35a7bd

  // ---------------------------------------------------------------- bits

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def writeBits(v: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 32 && (bits == 32 || (v >>> bits) == 0),
        s"writeBits($v, $bits)")
      acc |= (v & ((1L << bits) - 1)) << n
      n += bits
      while (n >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; n -= 8 }
    }
    /** Canonical Huffman code: MSB of the code value first. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { out.write((acc & 0xFF).toInt); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    def bitsConsumed: Long = (pos - start).toLong * 8 + bit
    def readBits(bits: Int): Int = {
      require(bits >= 0 && bits <= 24, s"readBits($bits)")
      var v = 0
      var i = 0
      while (i < bits) {
        require(pos < end, "truncated VP8L bitstream")
        v |= ((bytes(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readBit(): Int = readBits(1)
  }

  // ------------------------------------------------------------- huffman

  /** Canonical decode tables: per-length symbol counts + symbols in
    * canonical order. `single` marks the spec's 0-bit one-symbol code
    * (only reachable through the simple-code form). */
  private final class HuffTree(val lengths: Array[Int], alphabet: Int) {
    require(lengths.length == alphabet, "length table size")
    val maxLen = 15
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach { l =>
      require(l >= 0 && l <= maxLen, s"code length $l out of range")
      if (l > 0) blCount(l) += 1
    }
    private val nUsed = blCount.sum
    val single: Int =
      if (nUsed == 1) lengths.indexWhere(_ > 0) else -1
    // Kraft completeness: a decoder that accepts an over- or
    // under-subscribed code walks off the table on valid-looking input
    if (nUsed > 1) {
      var kraft = 0L
      (1 to maxLen).foreach(l => kraft += blCount(l).toLong << (maxLen - l))
      require(kraft == (1L << maxLen),
        s"Huffman code not complete (kraft ${kraft} != ${1L << maxLen})")
    } else require(nUsed == 1 || alphabet == 0, "empty Huffman code")
    // symbols sorted by (length, symbol) — canonical order
    val sorted: Array[Int] = lengths.indices.filter(lengths(_) > 0)
      .sortBy(s => (lengths(s), s)).toArray
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= maxLen) {
        code = (code << 1) | br.readBit()
        val count = blCount(len)
        if (code - first < count) return sorted(index + code - first)
        index += count
        first = (first + count) << 1
        len += 1
      }
      sys.error("invalid Huffman code in stream")
    }
  }

  /** Canonical code values from lengths (deflate assignment: codes in
    * (length, symbol) order). */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.foldLeft(0)(math.max)
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    (1 to maxLen).foreach { l =>
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
    }
    val codes = new Array[Int](lengths.length)
    lengths.indices.foreach { s =>
      if (lengths(s) > 0) { codes(s) = nextCode(lengths(s)); nextCode(lengths(s)) += 1 }
    }
    codes
  }

  /** Huffman code lengths from frequencies, limited to `limit` bits.
    * Deterministic: ties break on the smallest contained symbol. If the
    * unlimited tree exceeds the limit, frequencies are halved (floor,
    * min 1) and rebuilt — converges to a flat tree. Requires >= 2 used
    * symbols (degenerate trees go through the simple-code form or get
    * a dummy second symbol before calling this). */
  private def huffLengths(freqIn: Array[Long], limit: Int): Array[Int] = {
    val used = freqIn.indices.filter(freqIn(_) > 0)
    require(used.size >= 2, s"huffLengths needs >=2 symbols, got ${used.size}")
    var freq = freqIn.clone()
    while (true) {
      // nodes: (weight, minSymbol, either leaf symbol or children)
      final case class Node(w: Long, min: Int, sym: Int,
                            l: Node = null, r: Node = null)
      val pq = scala.collection.mutable.PriorityQueue.empty[Node](
        Ordering.by[Node, (Long, Int)](n => (n.w, n.min)).reverse)
      freq.indices.foreach(s => if (freq(s) > 0) pq.enqueue(Node(freq(s), s, s)))
      while (pq.size > 1) {
        val a = pq.dequeue(); val b = pq.dequeue()
        pq.enqueue(Node(a.w + b.w, math.min(a.min, b.min), -1, a, b))
      }
      val lengths = new Array[Int](freq.length)
      var maxSeen = 0
      def walk(n: Node, d: Int): Unit =
        if (n.sym >= 0) { lengths(n.sym) = math.max(d, 1); maxSeen = math.max(maxSeen, math.max(d, 1)) }
        else { walk(n.l, d + 1); walk(n.r, d + 1) }
      walk(pq.dequeue(), 0)
      if (maxSeen <= limit) return lengths
      freq = freq.map(f => if (f > 0) math.max(1L, f >> 1) else 0L)
    }
    throw new IllegalStateException("unreachable")
  }

  // --------------------------------------------------- prefix (LZ77) code

  /** VP8L prefix coding of a value >= 1: (code, extraBits, extraVal).
    * Decode mirror: code < 4 -> code + 1; else extra = (code-2) >> 1,
    * value = ((2 + (code & 1)) << extra) + extras + 1. */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"prefix value $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      val vm = v - 1
      val h = 31 - Integer.numberOfLeadingZeros(vm)
      val code = 2 * h + ((vm >> (h - 1)) & 1)
      (code, h - 1, vm & ((1 << (h - 1)) - 1))
    }
  }

  private def prefixDecode(code: Int, br: BitReader): Int = {
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      ((2 + (code & 1)) << extra) + br.readBits(extra) + 1
    }
  }

  private def cacheIndex(argb: Int, bits: Int): Int =
    (HashMul * argb) >>> (32 - bits)

  // -------------------------------------------------------------- tokens

  private sealed trait Token
  private final case class Lit(argb: Int) extends Token
  private final case class Copy(len: Int, dist: Int) extends Token
  private final case class CacheHit(idx: Int) extends Token

  /** Tokenize the (transformed) pixel stream: LZ77 backward refs when a
    * >=3-pixel match exists (most recent occurrence of the 3-pixel
    * key), else a color-cache hit, else a literal — mirroring exactly
    * the cache updates the decoder will perform (literals and copied
    * pixels insert; cache hits don't need to, the slot already holds
    * the value). */
  private def tokenize(px: Array[Int]): Vector[Token] = {
    val n = px.length
    val cache = new Array[Int](1 << CacheBits)
    val cacheSet = new Array[Boolean](1 << CacheBits)
    val lastPos = new java.util.HashMap[Long, Integer]()
    def key(i: Int): Long =
      (px(i).toLong & 0xFFFFFFFFL) * 506832829L ^
        ((px(i + 1).toLong & 0xFFFFFFFFL) * 2654435761L) ^
        ((px(i + 2).toLong & 0xFFFFFFFFL) * 2246822519L)
    def insertPos(i: Int): Unit =
      if (i + 2 < n) lastPos.put(key(i), i)
    def insertCache(argb: Int): Unit = {
      val ix = cacheIndex(argb, CacheBits)
      cache(ix) = argb; cacheSet(ix) = true
    }
    val out = Vector.newBuilder[Token]
    var pos = 0
    while (pos < n) {
      var matched = false
      if (pos + 2 < n) {
        val prev = lastPos.get(key(pos))
        if (prev != null) {
          val p = prev.intValue
          // hash collisions are possible: verify the actual pixels
          // dist+120 must fit the 40-code prefix space (<= 1048456)
          if (pos - p <= 1048456 &&
              px(p) == px(pos) && px(p + 1) == px(pos + 1) &&
              px(p + 2) == px(pos + 2)) {
            var len = 3
            while (pos + len < n && len < MaxCopyLen &&
                px(p + len) == px(pos + len)) len += 1
            val dist = pos - p
            out += Copy(len, dist)
            var i = 0
            while (i < len) {
              insertCache(px(pos + i)); insertPos(pos + i); i += 1
            }
            pos += len
            matched = true
          }
        }
      }
      if (!matched) {
        val argb = px(pos)
        val ix = cacheIndex(argb, CacheBits)
        if (cacheSet(ix) && cache(ix) == argb) out += CacheHit(ix)
        else { out += Lit(argb); insertCache(argb) }
        insertPos(pos)
        pos += 1
      }
    }
    out.result()
  }

  // -------------------------------------------------- huffman code header

  /** Emit one Huffman code header per the spec: the simple form for
    * <=2 used symbols all below 256, else the normal code-length-coded
    * form (zero runs via 17/18). A single used symbol >= 256 gets a
    * dummy length-1 partner (symbol 0) so the code stays complete. */
  private def writeHuffmanCode(w: BitWriter, freqIn: Array[Long]): Array[Int] = {
    val freq = freqIn.clone()
    val used = freq.indices.filter(freq(_) > 0)
    if (used.isEmpty) {
      // tree never read (e.g. distance code with no refs): 1-symbol
      // simple code, zero data bits
      w.writeBits(1, 1); w.writeBits(0, 1) // simple, one symbol
      w.writeBits(0, 1); w.writeBits(0, 1) // 1-bit symbol encoding of 0
      val lengths = new Array[Int](freq.length)
      return lengths // never decoded against
    }
    if (used.size <= 2 && used.forall(_ < 256)) {
      w.writeBits(1, 1) // simple
      w.writeBits(used.size - 1, 1)
      val s0 = used.head
      if (s0 <= 1) { w.writeBits(0, 1); w.writeBits(s0, 1) }
      else { w.writeBits(1, 1); w.writeBits(s0, 8) }
      if (used.size == 2) {
        require(used(1) < 256, "simple-code symbol out of byte range")
        w.writeBits(used(1), 8)
      }
      val lengths = new Array[Int](freq.length)
      used.foreach(lengths(_) = if (used.size == 1) 0 else 1)
      if (used.size == 1) lengths(used.head) = 0 // 0-bit single code
      return lengths
    }
    // normal form — ensure >= 2 used symbols for a complete code
    if (used.size == 1) freq(if (used.head == 0) 1 else 0) = 1
    val lengths = huffLengths(freq, limit = 15)
    // RLE the symbol lengths into code-length symbols (17/18 zero runs)
    val toks = Vector.newBuilder[(Int, Int, Int)] // (clSym, extraVal, extraBits)
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) == 0) {
        var run = 0
        while (i + run < lengths.length && lengths(i + run) == 0) run += 1
        i += run
        while (run >= 11) {
          val take = math.min(run, 138)
          toks += ((18, take - 11, 7)); run -= take
        }
        if (run >= 3) { toks += ((17, run - 3, 3)); run = 0 }
        while (run > 0) { toks += ((0, 0, 0)); run -= 1 }
      } else {
        toks += ((lengths(i), 0, 0)); i += 1
      }
    }
    val tokens = toks.result()
    val clFreq = new Array[Long](19)
    tokens.foreach(t => clFreq(t._1) += 1)
    // the code-length code itself needs >= 2 symbols too
    if (clFreq.count(_ > 0) == 1) {
      val s = clFreq.indexWhere(_ > 0)
      clFreq(if (s == 0) 1 else 0) = 1
    }
    val clLengths = huffLengths(clFreq, limit = 7)
    val clCodes = canonicalCodes(clLengths)
    w.writeBits(0, 1) // not simple
    val lastNeeded = CodeLengthOrder.lastIndexWhere(clLengths(_) > 0)
    val numCodes = math.max(lastNeeded + 1, 4)
    w.writeBits(numCodes - 4, 4)
    (0 until numCodes).foreach(i => w.writeBits(clLengths(CodeLengthOrder(i)), 3))
    w.writeBits(0, 1) // no explicit max_symbol: lengths run to alphabet end
    tokens.foreach { case (sym, extraVal, extraBits) =>
      w.writeCode(clCodes(sym), clLengths(sym))
      if (extraBits > 0) w.writeBits(extraVal, extraBits)
    }
    lengths
  }

  /** Read one Huffman code header (mirror of [[writeHuffmanCode]],
    * plus the spec features the encoder doesn't use: code 16, the
    * explicit max_symbol form). */
  private def readHuffmanCode(br: BitReader, alphabet: Int): HuffTree = {
    if (br.readBit() == 1) { // simple
      val numSymbols = br.readBit() + 1
      val lengths = new Array[Int](alphabet)
      val first8 = br.readBit()
      val s0 = br.readBits(if (first8 == 1) 8 else 1)
      require(s0 < alphabet, s"simple-code symbol $s0 out of alphabet")
      lengths(s0) = 1 // one symbol -> HuffTree's 0-bit single-code path
      if (numSymbols == 2) {
        val s1 = br.readBits(8)
        require(s1 < alphabet && s1 != s0, s"simple-code symbol $s1 invalid")
        lengths(s1) = 1
      }
      new HuffTree(lengths, alphabet)
    } else {
      val numCodes = br.readBits(4) + 4
      require(numCodes <= 19, s"code-length code count $numCodes")
      val clLengths = new Array[Int](19)
      (0 until numCodes).foreach(i =>
        clLengths(CodeLengthOrder(i)) = br.readBits(3))
      val clTree = new HuffTree(clLengths, 19)
      val maxSymbol =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          val m = 2 + br.readBits(nbits)
          require(m <= alphabet, s"max_symbol $m > alphabet $alphabet")
          m
        } else alphabet
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var prev = 8
      var budget = maxSymbol
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val cl = clTree.decode(br)
        cl match {
          case l if l < 16 =>
            lengths(sym) = l; sym += 1
            if (l != 0) prev = l
          case 16 =>
            val rep = 3 + br.readBits(2)
            require(sym + rep <= alphabet, "repeat overruns alphabet")
            (0 until rep).foreach { _ => lengths(sym) = prev; sym += 1 }
          case 17 =>
            val rep = 3 + br.readBits(3)
            require(sym + rep <= alphabet, "zero-run overruns alphabet")
            sym += rep
          case 18 =>
            val rep = 11 + br.readBits(7)
            require(sym + rep <= alphabet, "zero-run overruns alphabet")
            sym += rep
        }
      }
      new HuffTree(lengths, alphabet)
    }
  }

  // -------------------------------------------------------------- encode

  /** Encode row-major 0xRRGGBB pixels as a lossless VP8L WebP
    * (subtract-green transform, 8-bit color cache, LZ77 + Huffman). */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 16384 && height <= 16384,
      s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    // transform: subtract green from red and blue; alpha fixed 0xFF
    val px = new Array[Int](pixels.length)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      val r = (p >>> 16) & 0xFF; val g = (p >>> 8) & 0xFF; val b = p & 0xFF
      px(i) = (0xFF << 24) | (((r - g) & 0xFF) << 16) | (g << 8) | ((b - g) & 0xFF)
      i += 1
    }
    val tokens = tokenize(px)
    // histograms
    val cacheSize = 1 << CacheBits
    val gFreq = new Array[Long](NumLiterals + NumLengthCodes + cacheSize)
    val rFreq = new Array[Long](256)
    val bFreq = new Array[Long](256)
    val aFreq = new Array[Long](256)
    val dFreq = new Array[Long](NumDistanceCodes)
    tokens.foreach {
      case Lit(argb) =>
        gFreq((argb >>> 8) & 0xFF) += 1
        rFreq((argb >>> 16) & 0xFF) += 1
        bFreq(argb & 0xFF) += 1
        aFreq((argb >>> 24) & 0xFF) += 1
      case Copy(len, dist) =>
        gFreq(NumLiterals + prefixEncode(len)._1) += 1
        dFreq(prefixEncode(dist + 120)._1) += 1
      case CacheHit(idx) =>
        gFreq(NumLiterals + NumLengthCodes + idx) += 1
    }
    val w = new BitWriter
    w.writeBits(0x2F, 8) // VP8L signature
    w.writeBits((width - 1).toLong, 14)
    w.writeBits((height - 1).toLong, 14)
    w.writeBits(0, 1) // alpha hint: opaque
    w.writeBits(0, 3) // version 0
    w.writeBits(1, 1); w.writeBits(2, 2) // transform: SUBTRACT_GREEN
    w.writeBits(0, 1) // no more transforms
    w.writeBits(1, 1); w.writeBits(CacheBits, 4) // color cache
    w.writeBits(0, 1) // no meta-Huffman
    val gLen = writeHuffmanCode(w, gFreq)
    val rLen = writeHuffmanCode(w, rFreq)
    val bLen = writeHuffmanCode(w, bFreq)
    val aLen = writeHuffmanCode(w, aFreq)
    val dLen = writeHuffmanCode(w, dFreq)
    val gCode = canonicalCodes(gLen); val rCode = canonicalCodes(rLen)
    val bCode = canonicalCodes(bLen); val aCode = canonicalCodes(aLen)
    val dCode = canonicalCodes(dLen)
    def put(codes: Array[Int], lens: Array[Int], sym: Int): Unit = {
      // 0-length with a single used symbol = the 0-bit simple code
      if (lens(sym) > 0) w.writeCode(codes(sym), lens(sym))
      else require(lens.forall(_ == 0) || lens(sym) > 0,
        s"symbol $sym has no code")
    }
    tokens.foreach {
      case Lit(argb) =>
        put(gCode, gLen, (argb >>> 8) & 0xFF)
        put(rCode, rLen, (argb >>> 16) & 0xFF)
        put(bCode, bLen, argb & 0xFF)
        put(aCode, aLen, (argb >>> 24) & 0xFF)
      case Copy(len, dist) =>
        val (lc, leb, lev) = prefixEncode(len)
        put(gCode, gLen, NumLiterals + lc)
        if (leb > 0) w.writeBits(lev, leb)
        val (dc, deb, dev) = prefixEncode(dist + 120)
        put(dCode, dLen, dc)
        if (deb > 0) w.writeBits(dev, deb)
      case CacheHit(idx) =>
        put(gCode, gLen, NumLiterals + NumLengthCodes + idx)
    }
    val payload = w.toBytes
    // RIFF container: WEBP form with one VP8L chunk (word-aligned)
    val padded = payload.length + (payload.length & 1)
    val out = new java.io.ByteArrayOutputStream(padded + 20)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    ascii("RIFF"); le32(4 + 8 + padded); ascii("WEBP")
    ascii("VP8L"); le32(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  // -------------------------------------------------------------- decode

  /** Decode a lossless VP8L WebP (this codec's subset — see the object
    * scaladoc for the loud rejection boundaries). Returns
    * (width, height, row-major 0xRRGGBB pixels). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, px, _) = decodeWithStats(bytes)
    (w, h, px)
  }

  /** [[decode]] plus (literals, copies, cacheHits) token counts — the
    * independent coverage walker WebpSpec asserts against. */
  private[multimodal] def decodeWithStats(
      bytes: Array[Byte]): (Int, Int, Array[Int], (Long, Long, Long)) = {
    require(bytes.length >= 20, "payload too short for RIFF/WEBP")
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def le32(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
        ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
    require(tag(0) == "RIFF" && tag(8) == "WEBP", "payload is not RIFF/WEBP")
    require(le32(4) == bytes.length - 8,
      s"RIFF size ${le32(4)} != ${bytes.length - 8}")
    require(tag(12) == "VP8L", "not a lossless (VP8L) WebP")
    val chunkLen = le32(16)
    require(chunkLen >= 5 && 20 + chunkLen <= bytes.length,
      s"VP8L chunk length $chunkLen overruns the buffer")
    require(bytes.length - (20 + chunkLen) <= 1,
      "trailing bytes after the VP8L chunk")
    val br = new BitReader(bytes, 20, 20 + chunkLen)
    require(br.readBits(8) == 0x2F, "bad VP8L signature byte")
    val width = br.readBits(14) + 1
    val height = br.readBits(14) + 1
    br.readBit() // alpha hint (informational)
    require(br.readBits(3) == 0, "unsupported VP8L version")
    var subtractGreen = false
    while (br.readBit() == 1) {
      val t = br.readBits(2)
      require(t == 2,
        s"transform type $t (predictor/cross-color/color-indexing) " +
          "not supported by this subset")
      require(!subtractGreen, "duplicate subtract-green transform")
      subtractGreen = true
    }
    var cacheBits = 0
    if (br.readBit() == 1) {
      cacheBits = br.readBits(4)
      require(cacheBits >= 1 && cacheBits <= 11, s"cache bits $cacheBits")
    }
    require(br.readBit() == 0,
      "meta-Huffman partitioning not supported by this subset")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val gTree = readHuffmanCode(br, NumLiterals + NumLengthCodes + cacheSize)
    val rTree = readHuffmanCode(br, 256)
    val bTree = readHuffmanCode(br, 256)
    val aTree = readHuffmanCode(br, 256)
    val dTree = readHuffmanCode(br, NumDistanceCodes)
    val n = width * height
    val px = new Array[Int](n)
    val cache = new Array[Int](math.max(cacheSize, 1))
    var pos = 0
    var lits = 0L; var copies = 0L; var hits = 0L
    while (pos < n) {
      val s = gTree.decode(br)
      if (s < NumLiterals) {
        val g = s
        val r = rTree.decode(br)
        val b = bTree.decode(br)
        val a = aTree.decode(br)
        val argb = (a << 24) | (r << 16) | (g << 8) | b
        px(pos) = argb
        if (cacheSize > 0) cache(cacheIndex(argb, cacheBits)) = argb
        pos += 1; lits += 1
      } else if (s < NumLiterals + NumLengthCodes) {
        val len = prefixDecode(s - NumLiterals, br)
        val planeCode = prefixDecode(dTree.decode(br), br)
        require(planeCode > 120,
          s"short-distance plane code $planeCode (the 120-entry " +
            "neighbor table) not supported by this subset")
        val dist = planeCode - 120
        require(dist >= 1 && dist <= pos, s"backward ref distance $dist at $pos")
        require(pos + len <= n, s"backward ref overruns image by ${pos + len - n}")
        var i = 0
        while (i < len) {
          val argb = px(pos - dist + i)
          px(pos + i) = argb
          if (cacheSize > 0) cache(cacheIndex(argb, cacheBits)) = argb
          i += 1
        }
        pos += len; copies += 1
      } else {
        val idx = s - NumLiterals - NumLengthCodes
        require(cacheSize > 0 && idx < cacheSize, s"cache index $idx")
        px(pos) = cache(idx)
        pos += 1; hits += 1
      }
    }
    val spare = chunkLen.toLong * 8 - br.bitsConsumed
    require(spare >= 0 && spare < 8,
      s"$spare trailing bits after the pixel stream")
    // inverse transforms, in reverse read order
    if (subtractGreen) {
      var i = 0
      while (i < n) {
        val p = px(i)
        val g = (p >>> 8) & 0xFF
        val r = ((p >>> 16) + g) & 0xFF
        val b = (p + g) & 0xFF
        px(i) = (p & 0xFF000000) | (r << 16) | (g << 8) | b
        i += 1
      }
    }
    // subset: opaque truecolor (the Png color-type-2 restriction)
    var i2 = 0
    val rgb = new Array[Int](n)
    while (i2 < n) {
      require((px(i2) >>> 24) == 0xFF,
        "non-opaque alpha not supported by this subset")
      rgb(i2) = px(i2) & 0xFFFFFF
      i2 += 1
    }
    (width, height, rgb, (lits, copies, hits))
  }
}
