package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaCodec, Multimodal}

/** Multimodal-column EXT queries. `mm_meta` treats the documents' text
  * bytes as opaque payloads: byte-level metadata, content addressing,
  * and frame-sampling arithmetic, oracle-checked. `mm_image_decode`
  * runs a REAL image pipeline — deterministic PNGs encoded and decoded
  * through the JDK's `javax.imageio` per partition — whose decoded
  * dimensions and pixel means the oracle checks arithmetically (PNG is
  * lossless, so decode must reproduce the generator's parameters
  * exactly); `mm_image_resize` adds the exact nearest-neighbor
  * resample. `mm_audio_decode` (WAV/PCM via a RIFF chunk walker) and
  * `mm_video_frames` (YUV4MPEG2 frame sampling) make the audio and
  * video columns real for uncompressed formats; `mm_image_jpeg` runs
  * the real COMPRESSED image path (JDK JPEG encode at q=0.9 →
  * imageio decode — uniform fields are DC-only, so even the lossy
  * codec is exactly oracle-checkable); `mm_audio_adpcm` runs the real
  * COMPRESSED audio path (IMA-ADPCM, a pure-JVM 4-bit adaptive-delta
  * codec); `mm_video_mjpeg` runs the real COMPRESSED video path
  * (MJPEG-in-AVI: RIFF container walk + per-frame JDK JPEG decode).
  * Only codecs that need native libraries this environment does not
  * ship (mp3/aac; inter-frame h264/vp9) stay stubbed — see
  * [[graft.multimodal.Multimodal]].
  */
object MmQueries {

  /** Input to every codec stage: the id column, spread round-robin
    * across the session's full parallelism. The parquet scan's
    * partitioning is BYTE-based (`maxPartitionBytes`), which is right
    * for IO-bound scans and wrong for a CPU-bound per-row codec stage —
    * a few MB of ids plan as one or two partitions and the decode runs
    * on as many cores while the rest idle. Repartitioning the skinny id
    * column costs O(ids) shuffle bytes and is exactly what a production
    * decode stage does: media work is scheduled by ROW count, not input
    * bytes. */
  private def codecIds(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
  }

  val defs: Map[String, Q] = checked(
    // Encode→decode image round trip, batched per partition (codec init
    // once per partition — the mapInPandas-shaped plumbing with a real
    // JVM codec).
    "mm_image_decode" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.imageIO.open()
          it.map { id =>
            val png = Multimodal.makePng(
              8 + (id % 16).toInt, 8 + ((id * 3) % 16).toInt,
              ((id * 37) % 256).toInt)
            val (w, h, meanGray) = codec.decode(png)
            (id, w, h, meanGray)
          }
        }
        .toDF("doc_id", "width", "height", "mean_gray")
        .orderBy(col("doc_id"))
    },

    // COMPRESSED-image round trip: encode through the JDK's real JPEG
    // writer (explicit q=0.9), decode through the same imageio codec
    // as mm_image_decode. Uniform fields are DC-only, which JPEG
    // round-trips exactly (verified for all 256 grays), so the lossy
    // path gets the same exact arithmetic oracle as the lossless one —
    // the compressed-codec stub now covers audio/video only.
    "mm_image_jpeg" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.imageIO.open()
          it.map { id =>
            val jpg = Multimodal.makeJpeg(
              8 + (id % 16).toInt, 8 + ((id * 3) % 16).toInt,
              ((id * 37) % 256).toInt)
            val (w, h, meanGray) = codec.decode(jpg)
            (id, w, h, meanGray)
          }
        }
        .toDF("doc_id", "width", "height", "mean_gray")
        .orderBy(col("doc_id"))
    },

    // Second COMPRESSED-image container: TIFF with explicit LZW
    // compression through the JDK's own writer. TIFF/LZW is LOSSLESS,
    // so the payload is a full per-pixel gradient (not the uniform
    // field JPEG needs) — strip layout, LZW codes and IFD walking are
    // all exercised and the pixel mean stays exact integer arithmetic.
    "mm_image_tiff" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.imageIO.open()
          it.map { id =>
            val tif = Multimodal.makeTiff(
              8 + (id % 16).toInt, 8 + ((id * 3) % 16).toInt,
              ((id * 37) % 256).toInt)
            val (w, h, meanGray) = codec.decode(tif)
            (id, w, h, meanGray)
          }
        }
        .toDF("doc_id", "width", "height", "mean_gray")
        .orderBy(col("doc_id"))
    },

    // Decode→RESIZE→featurize, the image-normalization step of a
    // multimodal training pipeline, with a REAL nearest-neighbor
    // resample: gradient PNGs (row y = gray (g0+y)%256) are resized to
    // 8×8, and the oracle recomputes in SQL exactly which source rows
    // nearest-neighbor sampling keeps — a wrong sampling index changes
    // the mean, so the resample arithmetic itself is value-checked.
    "mm_image_resize" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.imageResize(8, 8).open()
          it.map { id =>
            val png = Multimodal.makeGradientPng(
              8 + (id % 16).toInt, 8 + ((id * 3) % 16).toInt,
              ((id * 37) % 256).toInt)
            val (w, h, meanGray) = codec.decode(png)
            (id, w, h, meanGray)
          }
        }
        .toDF("doc_id", "width", "height", "mean_gray")
        .orderBy(col("doc_id"))
    },

    // REAL audio decode: deterministic 16-bit PCM WAVs parsed by the
    // hand-rolled RIFF chunk walker (PCM is raw samples behind a
    // chunked header — no codec libs needed), per-partition codec
    // init; decoded rate / sample count / mean |amplitude| are exact
    // arithmetic the oracle recomputes.
    // REAL compressed-audio decode: deterministic triangle-wave signals
    // IMA-ADPCM-encoded (4-bit adaptive delta, format tag 0x11) and
    // decoded by the pure-JVM state machine. Sample rate, decoded
    // count and exact payload byte size are arithmetic the oracle
    // recomputes; `tracked` asserts the reconstruction follows the
    // source within the codec's adaptation bound (AdpcmSpec measures
    // the family's true worst case; the query uses 2x headroom).
    "mm_audio_adpcm" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.wavAdpcm.open()
          it.map { id =>
            val n = 64 + (id % 64).toInt
            val rate = 8000 + (id % 8).toInt * 1000
            val d = 16 * (1 + (id % 3).toInt) // samples/step slope
            val a = 1024
            val src = Array.tabulate(n) { i =>
              val t = (((id % 7) + i) * d % (4 * a)).toInt
              (a - math.abs(t - 2 * a)).toShort
            }
            val payload = Multimodal.makeAdpcmWav(rate, src)
            val (r, ns, out) = codec.decode(payload)
            var maxErr = 0
            var i = 0
            while (i < math.min(ns, n)) {
              maxErr = math.max(maxErr, math.abs(out(i) - src(i))); i += 1
            }
            (id, r, ns, payload.length, ns == n && maxErr <= 256)
          }
        }
        .toDF("doc_id", "sample_rate", "n_samples", "payload_bytes", "tracked")
        .orderBy(col("doc_id"))
    },

    // REAL telephony-codec audio: G.711 μ-law (format tag 7) encoded
    // and decoded by the exact integer segment/mantissa arithmetic of
    // the public ITU spec — the decoded mean |amplitude| INCLUDES the
    // codec's quantization, and the oracle recomputes
    // decode(encode(x)) per sample in pure SQL integer ops, so the
    // lossy path is value-checked, not tolerance-banded.
    "mm_audio_ulaw" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.wavUlaw.open()
          it.map { id =>
            val n = 64 + (id % 64).toInt
            val rate = 8000 + (id % 8).toInt * 1000
            val samples = Array.tabulate(n)(i =>
              (((id + i.toLong * 37) % 2048) - 1024).toShort)
            val (r, ns, meanAbs) =
              codec.decode(Multimodal.makeUlawWav(rate, samples))
            (id, r, ns, meanAbs)
          }
        }
        .toDF("doc_id", "sample_rate", "n_samples", "mean_abs")
        .orderBy(col("doc_id"))
    },

    // G.711 A-law (format tag 6), μ-law's European sibling: a second
    // telephony codec whose LOSSY decoded value is hash-checked — the
    // oracle recomputes decode(encode(x)) per sample in SQL from the
    // same public integer arithmetic. The signal spans the full 16-bit
    // range so all eight A-law segments are exercised.
    "mm_audio_alaw" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.wavAlaw.open()
          it.map { id =>
            val n = 64 + (id % 64).toInt
            val rate = 8000 + (id % 8).toInt * 1000
            val samples = Array.tabulate(n)(i =>
              (((id + i.toLong * 101) % 65536) - 32768).toShort)
            val (r, ns, meanAbs) =
              codec.decode(Multimodal.makeAlawWav(rate, samples))
            (id, r, ns, meanAbs)
          }
        }
        .toDF("doc_id", "sample_rate", "n_samples", "mean_abs")
        .orderBy(col("doc_id"))
    },

    // REAL lossless compressed audio: FLAC (RFC 9639 subset — fixed
    // predictors, rice residuals, CRC-8/16 + audio MD5, see
    // graft.multimodal.Flac). The signal mixes a constant head (every
    // 4th id) with a wrapped quadratic, so frames exercise CONSTANT
    // and FIXED(0-2) subframes plus the rice/escape split; `lossless`
    // is decoded==source sample-for-sample ON TOP of the decoder's own
    // MD5 check, and mean_abs is over the DECODED samples — since FLAC
    // is lossless the oracle recomputes it from the source formula in
    // pure SQL, so a single flipped sample goes red.
    "mm_audio_flac" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.flac.open()
          it.map { id =>
            val n = 96 + (id % 64).toInt
            val rate = 8000 + (id % 8).toInt * 1000
            val src = Array.tabulate(n) { i =>
              if (id % 4 == 0 && i < 64) 512.toShort
              else (((id * 31 + i.toLong * i * 7) % 4096) - 2048).toShort
            }
            val (r, out) = codec.decode(graft.multimodal.Flac.encode(rate, src))
            val lossless = r == rate && out.length == n &&
              out.indices.forall(i => out(i) == src(i).toInt)
            val meanAbs =
              if (out.isEmpty) 0L
              else out.foldLeft(0L)((a, v) => a + math.abs(v.toLong)) / out.length
            (id, r, out.length, meanAbs, lossless)
          }
        }
        .toDF("doc_id", "sample_rate", "n_samples", "mean_abs", "lossless")
        .orderBy(col("doc_id"))
    },

    // STEREO FLAC — the channel-decorrelation layer mono cannot
    // exercise: per frame the encoder plans all four spec assignments
    // (independent, left/side, right/side, mid/side) and writes the
    // cheapest, so the correlated ids (right = left ± tiny wiggle,
    // every 3rd id) compress through the 17-bit side channel while
    // the independent ids fall back to L/R coding — and the decoder
    // reconstructs BOTH regimes back to L/R before the MD5 check.
    // Lossless => the oracle recomputes both channel means from the
    // source formulas in pure SQL; one mis-reconstructed side sample
    // goes value-red.
    "mm_audio_flac_stereo" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.flacStereo.open()
          it.map { id =>
            val n = 96 + (id % 64).toInt
            val rate = 8000 + (id % 8).toInt * 1000
            val left = Array.tabulate(n) { i =>
              if (id % 4 == 0 && i < 64) 512.toShort
              else (((id * 31 + i.toLong * i * 7) % 4096) - 2048).toShort
            }
            val right = Array.tabulate(n) { i =>
              if (id % 3 == 0)
                (left(i) - ((id + 3L * i) % 7 - 3)).toShort
              else (((id * 17 + i.toLong * i * 11) % 4096) - 2048).toShort
            }
            val (r, chans) =
              codec.decode(graft.multimodal.Flac.encodeStereo(rate, left, right))
            val lossless = r == rate && chans.length == 2 &&
              chans(0).length == n && chans(1).length == n &&
              chans(0).indices.forall(i => chans(0)(i) == left(i).toInt) &&
              chans(1).indices.forall(i => chans(1)(i) == right(i).toInt)
            def meanAbs(a: Array[Int]) =
              if (a.isEmpty) 0L
              else a.foldLeft(0L)((acc, v) => acc + math.abs(v.toLong)) / a.length
            (id, r, chans(0).length, meanAbs(chans(0)), meanAbs(chans(1)),
              lossless)
          }
        }
        .toDF("doc_id", "sample_rate", "n_samples", "mean_abs_l",
          "mean_abs_r", "lossless")
        .orderBy(col("doc_id"))
    },

    // RANDOM ACCESS into compressed audio — the primitive for sampling
    // training windows out of a large FLAC corpus without decoding the
    // prefix. Each id encodes a 15-18 frame stream WITH a SEEKTABLE
    // (seek point every 4 frames = every 256 samples at the encoder's
    // fixed 64-sample block size), then [[graft.multimodal.Flac
    // .decodeAt]] decodes ONLY the suffix from the greatest seek point
    // <= a per-id target sample. `start_sample` proves the seek landed
    // on the right grid point — the oracle independently recomputes
    // (target // 256) * 256 — `suffix_len` proves exactly the suffix
    // was produced, and the 64-sample window at the target is checked
    // sample-for-sample against the source formula Spark-side (FLAC is
    // lossless) with its abs-sum value-gated in SQL: a wrong seek
    // offset, a mis-decoded suffix frame, or a window starting after
    // the target all go red.
    "mm_audio_seek" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          it.map { id =>
            val n = 960 + (id % 4).toInt * 64
            val rate = 8000 + (id % 8).toInt * 1000
            val src = Array.tabulate(n) { i =>
              if (id % 4 == 0 && i < 64) 512.toShort
              else (((id * 31 + i.toLong * i * 7) % 4096) - 2048).toShort
            }
            val bytes = graft.multimodal.Flac.encodeWithMeta(rate, src,
              seekEveryFrames = 4)
            val w = 64
            val target = (id * 131) % (n - w)
            val (r, first, chans) =
              graft.multimodal.Flac.decodeAt(bytes, target)
            val off = (target - first).toInt
            val window = chans(0).slice(off, off + w)
            val lossless = r == rate && window.length == w &&
              (0 until w).forall(j =>
                window(j) == src((target + j).toInt).toInt)
            val sumAbs = window.foldLeft(0L)((a, v) => a + math.abs(v.toLong))
            (id, r, target, first, chans(0).length.toLong, sumAbs, lossless)
          }
        }
        .toDF("doc_id", "sample_rate", "target_sample", "start_sample",
          "suffix_len", "window_sum_abs", "lossless")
        .orderBy(col("doc_id"))
    },

    // Third COMPRESSED-image format, this time a HAND-ROLLED public
    // spec (qoiformat.org) rather than a JDK writer: QOI round trip
    // over [[graft.multimodal.Qoi.testImage]], whose four regions make
    // the encoder provably emit the whole op family (RUN/DIFF/INDEX/
    // LUMA/RGB — QoiSpec asserts it with an independent tag walker).
    // QOI is lossless and has NO CRC, so `lossless` is
    // decoded==source pixel-for-pixel and the mean is over DECODED
    // channel bytes — one flipped pixel goes red.
    "mm_image_qoi" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.qoi.open()
          it.map { id =>
            val (w, h, src) = graft.multimodal.Qoi.testImage(id)
            val (dw, dh, px) = codec.decode(
              graft.multimodal.Qoi.encode(w, h, src))
            val lossless = dw == w && dh == h && px.sameElements(src)
            val sum = px.foldLeft(0L)((acc, p) => acc +
              ((p >>> 16) & 0xFF) + ((p >>> 8) & 0xFF) + (p & 0xFF))
            (id, dw, dh, sum / (3L * px.length), lossless)
          }
        }
        .toDF("doc_id", "width", "height", "mean_rgb", "lossless")
        .orderBy(col("doc_id"))
    },

    // UNCOMPRESSED interchange image: 24-bpp BMP round trip over the
    // SAME test image as mm_image_qoi/png (shared oracle arithmetic).
    // BMP is raw padded BGR rows — the format's value here is the
    // interop edge cases: the 8..23-px widths sweep every 4-byte row
    // padding residue, and BmpIcoSpec pins top-down (negative-height)
    // decode plus forged-header rejection.
    "mm_image_bmp" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.bmp.open()
          it.map { id =>
            val (w, h, src) = graft.multimodal.Qoi.testImage(id)
            val (dw, dh, px) = codec.decode(
              graft.multimodal.Bmp.encode(w, h, src))
            val lossless = dw == w && dh == h && px.sameElements(src)
            val sum = px.foldLeft(0L)((acc, p) => acc +
              ((p >>> 16) & 0xFF) + ((p >>> 8) & 0xFF) + (p & 0xFF))
            (id, dw, dh, sum / (3L * px.length), lossless)
          }
        }
        .toDF("doc_id", "width", "height", "mean_rgb", "lossless")
        .orderBy(col("doc_id"))
    },

    // ICON container — the Apng move again: the ICO directory wraps
    // the SAME test image twice, once as a DIB (doubled-height
    // XOR+AND planes) and once as a whole PNG stream, so one payload
    // exercises BOTH decode arms against one source. `lossless` is
    // both entries == source pixel-for-pixel; `forms` pins the
    // per-entry container form the decoder detected; the directory's
    // dimension bytes are cross-checked against the decoded images
    // inside Ico.decode (a lying directory rejects).
    "mm_image_ico" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.ico.open()
          it.map { id =>
            val (w, h, src) = graft.multimodal.Qoi.testImage(id)
            val entries = codec.decode(graft.multimodal.Ico.encode(Seq(
              graft.multimodal.Ico.Entry(w, h, src, asPng = false),
              graft.multimodal.Ico.Entry(w, h, src, asPng = true))))
            val lossless = entries.length == 2 && entries.forall {
              case (dw, dh, px, _) =>
                dw == w && dh == h && px.sameElements(src)
            }
            val sum = entries.head._3.foldLeft(0L)((acc, p) => acc +
              ((p >>> 16) & 0xFF) + ((p >>> 8) & 0xFF) + (p & 0xFF))
            (id, entries.length, w, h, sum / (3L * w * h),
              entries.map(_._4).mkString(","), lossless)
          }
        }
        .toDF("doc_id", "n_entries", "width", "height", "mean_rgb",
          "forms", "lossless")
        .orderBy(col("doc_id"))
    },

    // Fourth compressed-image format and the interchange flagship:
    // PNG round trip over the SAME [[graft.multimodal.Qoi.testImage]]
    // pixels as mm_image_qoi, so the two codecs certify losslessness
    // against the same source formula and share oracle arithmetic.
    // PNG carries CRC-32 per chunk — the decoder VERIFIES it (PngSpec
    // proves a flipped IDAT byte rejects), and the encoder's per-row
    // min-sum-of-abs filter heuristic means the stream genuinely mixes
    // filter types (PngSpec walks the re-inflated filter bytes).
    "mm_image_png" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.png.open()
          it.map { id =>
            val (w, h, src) = graft.multimodal.Qoi.testImage(id)
            val (dw, dh, px) = codec.decode(
              graft.multimodal.Png.encode(w, h, src))
            val lossless = dw == w && dh == h && px.sameElements(src)
            val sum = px.foldLeft(0L)((acc, p) => acc +
              ((p >>> 16) & 0xFF) + ((p >>> 8) & 0xFF) + (p & 0xFF))
            (id, dw, dh, sum / (3L * px.length), lossless)
          }
        }
        .toDF("doc_id", "width", "height", "mean_rgb", "lossless")
        .orderBy(col("doc_id"))
    },

    // Lossless WEBP (VP8L) — the largest crawl image format within
    // pure-JVM reach, hand-rolled from RFC 9649 (see [[graft
    // .multimodal.Webp]]): LZ77 backward references + canonical
    // Huffman codes + subtract-green transform + color cache, over
    // the SAME test image as qoi/png/bmp so all four lossless codecs
    // certify against one source formula and one oracle arithmetic.
    // WebpSpec's token walker proves the streams genuinely exercise
    // literals, copies AND cache hits (no coding tool is dead weight).
    "mm_image_webp" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.webp.open()
          it.map { id =>
            val (w, h, src) = graft.multimodal.Qoi.testImage(id)
            val (dw, dh, px) = codec.decode(
              graft.multimodal.Webp.encode(w, h, src))
            val lossless = dw == w && dh == h && px.sameElements(src)
            val sum = px.foldLeft(0L)((acc, p) => acc +
              ((p >>> 16) & 0xFF) + ((p >>> 8) & 0xFF) + (p & 0xFF))
            (id, dw, dh, sum / (3L * px.length), lossless)
          }
        }
        .toDF("doc_id", "width", "height", "mean_rgb", "lossless")
        .orderBy(col("doc_id"))
    },

    // ANIMATED PNG — the APNG extension over the same hand-rolled PNG
    // layer: acTL/fcTL/fdAT with one strictly-consecutive sequence
    // space, frame 0 in the IDAT stream, later frames as fdAT zlib
    // streams. Each id animates 2-4 frames of the shared test image
    // under per-frame CHANNEL ROTATION (r,g,b) -> shifted by the frame
    // index: the all-frame channel mean is rotation-invariant (so the
    // oracle reuses the four-region mean formula), while the LAST
    // frame's per-channel sums select different SOURCE channels per
    // rotation — a frame-order or rotation bug flips them value-red.
    // `lossless` is every decoded frame == its source frame
    // pixel-for-pixel; the per-frame delay round-trips through fcTL.
    "mm_image_apng" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.apng.open()
          it.map { id =>
            val (w, h, src) = graft.multimodal.Qoi.testImage(id)
            val n = 2 + (id % 3).toInt
            def rot(p: Int, k: Int): Int = {
              val ch = Array((p >>> 16) & 0xFF, (p >>> 8) & 0xFF, p & 0xFF)
              (ch(k % 3) << 16) | (ch((k + 1) % 3) << 8) | ch((k + 2) % 3)
            }
            val frames = (0 until n).map(k => src.map(p => rot(p, k)))
            val bytes = graft.multimodal.Apng.encode(w, h, frames,
              delayNum = 1 + (id % 4).toInt, delayDen = 10)
            val (dw, dh, dec, (dn, dd)) = codec.decode(bytes)
            val lossless = dw == w && dh == h && dec.length == n &&
              (0 until n).forall(k => dec(k).sameElements(frames(k)))
            val sumAll = dec.foldLeft(0L)((a, fr) => a + fr.foldLeft(0L)(
              (b, p) => b + ((p >>> 16) & 0xFF) + ((p >>> 8) & 0xFF) + (p & 0xFF)))
            def chanSum(fr: Array[Int], shift: Int) =
              fr.foldLeft(0L)((a, p) => a + ((p >>> shift) & 0xFF))
            val last = dec.last
            (id, dw, dh, n, sumAll / (3L * n * w * h),
              chanSum(last, 16), chanSum(last, 8), chanSum(last, 0),
              lossless, dn, dd)
          }
        }
        .toDF("doc_id", "width", "height", "n_frames", "mean_rgb",
          "sum_r_last", "sum_g_last", "sum_b_last", "lossless",
          "delay_num", "delay_den")
        .orderBy(col("doc_id"))
    },

    "mm_audio_decode" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.wavPcm.open()
          it.map { id =>
            val n = 64 + (id % 64).toInt
            val rate = 8000 + (id % 8).toInt * 1000
            val samples = Array.tabulate(n)(i =>
              (((id + i.toLong * 37) % 2048) - 1024).toShort)
            val (r, ns, meanAbs) = codec.decode(Multimodal.makeWav(rate, samples))
            (id, r, ns, meanAbs)
          }
        }
        .toDF("doc_id", "sample_rate", "n_samples", "mean_abs")
        .orderBy(col("doc_id"))
    },

    // REAL video frame-sampling: deterministic uncompressed YUV4MPEG2
    // streams (uniform-luma frames) parsed by the hand-rolled .y4m
    // walker; every 3rd frame's Y plane is decoded and the oracle
    // recomputes exactly which frames survive sampling and their mean
    // luma — frame selection arithmetic is value-checked like the
    // image resample's row selection.
    "mm_video_frames" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.y4mFrameSample(3).open()
          it.map { id =>
            val w = 8 + (id % 8).toInt * 2
            val h = 8 + ((id * 3) % 8).toInt * 2
            val nf = 4 + (id % 12).toInt
            val lumas = Array.tabulate(nf)(f => ((id * 13 + f * 7) % 256).toInt)
            val (dw, dh, frames, sampled, meanLuma) =
              codec.decode(Multimodal.makeY4m(w, h, lumas))
            (id, dw, dh, frames, sampled, meanLuma)
          }
        }
        .toDF("doc_id", "width", "height", "n_frames", "n_sampled", "mean_luma")
        .orderBy(col("doc_id"))
    },

    // REAL COMPRESSED-video frame-sampling: the same frame-selection
    // arithmetic as mm_video_frames, but the payload is MJPEG-in-AVI —
    // a RIFF/AVI container whose 00dc chunks each hold a real JDK-encoded
    // JPEG frame, walked and decoded by MediaCodec.aviMjpegFrameSample.
    // Uniform frames are DC-only, so the lossy codec shares the
    // uncompressed path's exact oracle (see makeJpeg); with this, only
    // INTER-frame video codecs (h264/vp9) remain environment-stubbed.
    "mm_video_mjpeg" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.aviMjpegFrameSample(3).open()
          it.map { id =>
            val w = 8 + (id % 8).toInt * 2
            val h = 8 + ((id * 3) % 8).toInt * 2
            val nf = 4 + (id % 12).toInt
            val grays = Array.tabulate(nf)(f => ((id * 13 + f * 7) % 256).toInt)
            val (dw, dh, frames, sampled, meanLuma) =
              codec.decode(Multimodal.makeMjpegAvi(w, h, grays))
            (id, dw, dh, frames, sampled, meanLuma)
          }
        }
        .toDF("doc_id", "width", "height", "n_frames", "n_sampled", "mean_luma")
        .orderBy(col("doc_id"))
    },

    // RANDOM ACCESS into compressed video — the idx1-index twin of
    // mm_audio_seek's FLAC seek table: each id's MJPEG AVI now
    // carries the standard idx1 frame index (offset/size per 00dc
    // chunk, AVIF_HASINDEX declared), and [[graft.multimodal
    // .Multimodal.aviFrameAt]] resolves ONE per-id target frame by
    // walking only the top-level chunk directory and decoding only
    // the indexed byte range — never scanning the movi stream. The
    // index must earn trust (entry count vs declared frames, entry
    // vs pointed-at chunk header, decoded vs declared geometry all
    // cross-checked), and the oracle recomputes the target frame's
    // exact uniform gray from the source formula — a wrong index
    // offset decodes the WRONG frame and value-mismatches.
    "mm_video_seek" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          it.map { id =>
            val w = 8 + (id % 8).toInt * 2
            val h = 8 + ((id * 3) % 8).toInt * 2
            val nf = 4 + (id % 12).toInt
            val grays = Array.tabulate(nf)(f => ((id * 13 + f * 7) % 256).toInt)
            val k = ((id * 5) % nf).toInt
            val (dw, dh, frames, mean) = graft.multimodal.Multimodal
              .aviFrameAt(graft.multimodal.Multimodal.makeMjpegAvi(w, h, grays), k)
            (id, dw, dh, frames, k.toLong, mean)
          }
        }
        .toDF("doc_id", "width", "height", "n_frames", "frame_ix",
          "frame_mean")
        .orderBy(col("doc_id"))
    },

    // Same selection arithmetic again, through the JDK's own
    // multi-image GIF reader (container parsing + LZW + palette all
    // JDK-side) — the third real video container next to the
    // hand-rolled .y4m and AVI walkers. GIF is lossless, so it shares
    // the uncompressed oracle.
    "mm_video_gif" -> { (s, dir) =>
      import s.implicits._
      codecIds(s, dir)
        .mapPartitions { it =>
          val codec = MediaCodec.gifFrameSample(3).open()
          it.map { id =>
            val w = 8 + (id % 8).toInt * 2
            val h = 8 + ((id * 3) % 8).toInt * 2
            val nf = 4 + (id % 12).toInt
            val grays = Array.tabulate(nf)(f => ((id * 13 + f * 7) % 256).toInt)
            val (dw, dh, frames, sampled, meanLuma) =
              codec.decode(Multimodal.makeGif(w, h, grays))
            (id, dw, dh, frames, sampled, meanLuma)
          }
        }
        .toDF("doc_id", "width", "height", "n_frames", "n_sampled", "mean_luma")
        .orderBy(col("doc_id"))
    },

    "mm_meta" -> { (s, dir) =>
      val payload = Multimodal.asPayload(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.byteLen(payload).as("byte_len"),
          Multimodal.contentKey(payload).as("content_key"),
          (lit(64) + pmod(col("doc_id"), lit(64L)).cast("int")).as("width"),
          (lit(64) + pmod(col("doc_id") * 7, lit(64L)).cast("int")).as("height"),
          Multimodal.sampledFrameCount(col("n_chars"), 100).as("n_frames"))
        .orderBy(col("doc_id"))
    }
  )

  /** The four-region per-pixel channel-byte MEAN of Qoi.testImage as a
    * DuckDB expression (the formula the qoi/png oracles spell inline) —
    * shared by the bmp/ico oracles so a formula edit cannot drift
    * between lossless-image gates. */
  private val fourRegionMeanSql: String =
    """CAST(list_sum(list_transform(
      |      range(0, (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)),
      |      i -> CASE
      |        WHEN i // (8 + doc_id % 16) = 0
      |          THEN 3 * ((doc_id * 37) % 256)
      |        WHEN i // (8 + doc_id % 16) = 1
      |          THEN 3 * (((doc_id * 37) % 256 + i % (8 + doc_id % 16)) % 256)
      |        WHEN i // (8 + doc_id % 16) = 2
      |          THEN CASE WHEN (i % (8 + doc_id % 16)) % 2 = 0
      |            THEN 3 * ((doc_id * 37) % 256)
      |            ELSE ((doc_id * 37) % 256 + 97) % 256
      |               + ((doc_id * 37) % 256 + 31) % 256
      |               + ((doc_id * 37) % 256 + 13) % 256 END
      |        ELSE ((doc_id * 37) % 256 + 3 * (i % (8 + doc_id % 16))) % 256
      |           + ((doc_id * 37) % 256 + 11 * (i // (8 + doc_id % 16))) % 256
      |           + ((doc_id * 37) % 256 + 5 * (i % (8 + doc_id % 16))
      |              + 7 * (i // (8 + doc_id % 16))) % 256 END))
      |    // (3 * (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)) AS BIGINT)"""
      .stripMargin

  val oracles: Map[String, String] = checked(
    // BMP is lossless over the SAME test image — identical four-region
    // mean formula as qoi/png.
    "mm_image_bmp" ->
      s"""SELECT doc_id,
         |  CAST(8 + doc_id % 16 AS INT) AS width,
         |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
         |  $fourRegionMeanSql AS mean_rgb,
         |  TRUE AS lossless
         |FROM documents ORDER BY doc_id""".stripMargin,
    // The ICO wraps the same image twice (DIB + PNG entries), both
    // lossless; the decoder must report exactly those two forms.
    "mm_image_ico" ->
      s"""SELECT doc_id,
         |  CAST(2 AS INT) AS n_entries,
         |  CAST(8 + doc_id % 16 AS INT) AS width,
         |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
         |  $fourRegionMeanSql AS mean_rgb,
         |  'dib,png' AS forms,
         |  TRUE AS lossless
         |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_image_decode" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
        |  CAST((doc_id * 37) % 256 AS BIGINT) AS mean_gray
        |FROM documents ORDER BY doc_id""".stripMargin,
    // TIFF/LZW is lossless, so the oracle recomputes the gradient
    // pixel mean exactly: pixel i (row-major) of a w×h image has gray
    // (base + 3·(i mod w) + 11·(i div w)) mod 256.
    "mm_image_tiff" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
        |  CAST(list_sum(list_transform(
        |      range(0, (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)),
        |      i -> ((doc_id * 37) % 256 + 3 * (i % (8 + doc_id % 16))
        |            + 11 * (i // (8 + doc_id % 16))) % 256))
        |    // ((8 + doc_id % 16) * (8 + (doc_id * 3) % 16)) AS BIGINT)
        |    AS mean_gray
        |FROM documents ORDER BY doc_id""".stripMargin,
    // QOI is lossless, so the oracle recomputes the channel-byte mean
    // from Qoi.testImage's four-region formula (w = 8 + id%16,
    // h = 8 + 3id%16, base = 37id%256; x = i%w, y = i//w): row 0
    // uniform 3·base, row 1 the (+1,+1,+1) ramp, row 2 alternating
    // base / (base+97, base+31, base+13), rows 3+ three gradients.
    "mm_image_qoi" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
        |  CAST(list_sum(list_transform(
        |      range(0, (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)),
        |      i -> CASE
        |        WHEN i // (8 + doc_id % 16) = 0
        |          THEN 3 * ((doc_id * 37) % 256)
        |        WHEN i // (8 + doc_id % 16) = 1
        |          THEN 3 * (((doc_id * 37) % 256 + i % (8 + doc_id % 16)) % 256)
        |        WHEN i // (8 + doc_id % 16) = 2
        |          THEN CASE WHEN (i % (8 + doc_id % 16)) % 2 = 0
        |            THEN 3 * ((doc_id * 37) % 256)
        |            ELSE ((doc_id * 37) % 256 + 97) % 256
        |               + ((doc_id * 37) % 256 + 31) % 256
        |               + ((doc_id * 37) % 256 + 13) % 256 END
        |        ELSE ((doc_id * 37) % 256 + 3 * (i % (8 + doc_id % 16))) % 256
        |           + ((doc_id * 37) % 256 + 11 * (i // (8 + doc_id % 16))) % 256
        |           + ((doc_id * 37) % 256 + 5 * (i % (8 + doc_id % 16))
        |              + 7 * (i // (8 + doc_id % 16))) % 256 END))
        |    // (3 * (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)) AS BIGINT)
        |    AS mean_rgb,
        |  TRUE AS lossless
        |FROM documents ORDER BY doc_id""".stripMargin,
    // APNG is lossless per frame and the frame transform is a channel
    // ROTATION, so the all-frame mean reuses the four-region formula
    // (rotation-invariant) while the last frame's per-channel sums
    // select source channels by (n-1) mod 3 — the per-channel sums
    // sr/sg/sb are computed separately from the same region CASEs.
    "mm_image_apng" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    8 + doc_id % 16 AS w,
        |    8 + (doc_id * 3) % 16 AS h,
        |    (doc_id * 37) % 256 AS base,
        |    2 + doc_id % 3 AS n
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, w, h, n,
        |    list_sum(list_transform(range(0, w*h), i -> CASE
        |      WHEN i // w = 0 THEN base
        |      WHEN i // w = 1 THEN (base + i % w) % 256
        |      WHEN i // w = 2 THEN CASE WHEN (i % w) % 2 = 0 THEN base
        |        ELSE (base + 97) % 256 END
        |      ELSE (base + 3 * (i % w)) % 256 END)) AS sr,
        |    list_sum(list_transform(range(0, w*h), i -> CASE
        |      WHEN i // w = 0 THEN base
        |      WHEN i // w = 1 THEN (base + i % w) % 256
        |      WHEN i // w = 2 THEN CASE WHEN (i % w) % 2 = 0 THEN base
        |        ELSE (base + 31) % 256 END
        |      ELSE (base + 11 * (i // w)) % 256 END)) AS sg,
        |    list_sum(list_transform(range(0, w*h), i -> CASE
        |      WHEN i // w = 0 THEN base
        |      WHEN i // w = 1 THEN (base + i % w) % 256
        |      WHEN i // w = 2 THEN CASE WHEN (i % w) % 2 = 0 THEN base
        |        ELSE (base + 13) % 256 END
        |      ELSE (base + 5 * (i % w) + 7 * (i // w)) % 256 END)) AS sb
        |  FROM p)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(n AS INT) AS n_frames,
        |  CAST((sr + sg + sb) // (3 * w * h) AS BIGINT) AS mean_rgb,
        |  CAST(CASE (n - 1) % 3 WHEN 0 THEN sr WHEN 1 THEN sg ELSE sb END
        |    AS BIGINT) AS sum_r_last,
        |  CAST(CASE n % 3 WHEN 0 THEN sr WHEN 1 THEN sg ELSE sb END
        |    AS BIGINT) AS sum_g_last,
        |  CAST(CASE (n + 1) % 3 WHEN 0 THEN sr WHEN 1 THEN sg ELSE sb END
        |    AS BIGINT) AS sum_b_last,
        |  TRUE AS lossless,
        |  CAST(1 + doc_id % 4 AS INT) AS delay_num,
        |  CAST(10 AS INT) AS delay_den
        |FROM s ORDER BY doc_id""".stripMargin,
    // PNG is lossless over the SAME test image as mm_image_qoi, so its
    // oracle is the identical four-region mean formula.
    "mm_image_png" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
        |  CAST(list_sum(list_transform(
        |      range(0, (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)),
        |      i -> CASE
        |        WHEN i // (8 + doc_id % 16) = 0
        |          THEN 3 * ((doc_id * 37) % 256)
        |        WHEN i // (8 + doc_id % 16) = 1
        |          THEN 3 * (((doc_id * 37) % 256 + i % (8 + doc_id % 16)) % 256)
        |        WHEN i // (8 + doc_id % 16) = 2
        |          THEN CASE WHEN (i % (8 + doc_id % 16)) % 2 = 0
        |            THEN 3 * ((doc_id * 37) % 256)
        |            ELSE ((doc_id * 37) % 256 + 97) % 256
        |               + ((doc_id * 37) % 256 + 31) % 256
        |               + ((doc_id * 37) % 256 + 13) % 256 END
        |        ELSE ((doc_id * 37) % 256 + 3 * (i % (8 + doc_id % 16))) % 256
        |           + ((doc_id * 37) % 256 + 11 * (i // (8 + doc_id % 16))) % 256
        |           + ((doc_id * 37) % 256 + 5 * (i % (8 + doc_id % 16))
        |              + 7 * (i // (8 + doc_id % 16))) % 256 END))
        |    // (3 * (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)) AS BIGINT)
        |    AS mean_rgb,
        |  TRUE AS lossless
        |FROM documents ORDER BY doc_id""".stripMargin,
    // WEBP is lossless over the same test image, so it shares the
    // qoi/png/bmp four-region mean formula verbatim.
    "mm_image_webp" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
        |  CAST(list_sum(list_transform(
        |      range(0, (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)),
        |      i -> CASE
        |        WHEN i // (8 + doc_id % 16) = 0
        |          THEN 3 * ((doc_id * 37) % 256)
        |        WHEN i // (8 + doc_id % 16) = 1
        |          THEN 3 * (((doc_id * 37) % 256 + i % (8 + doc_id % 16)) % 256)
        |        WHEN i // (8 + doc_id % 16) = 2
        |          THEN CASE WHEN (i % (8 + doc_id % 16)) % 2 = 0
        |            THEN 3 * ((doc_id * 37) % 256)
        |            ELSE ((doc_id * 37) % 256 + 97) % 256
        |               + ((doc_id * 37) % 256 + 31) % 256
        |               + ((doc_id * 37) % 256 + 13) % 256 END
        |        ELSE ((doc_id * 37) % 256 + 3 * (i % (8 + doc_id % 16))) % 256
        |           + ((doc_id * 37) % 256 + 11 * (i // (8 + doc_id % 16))) % 256
        |           + ((doc_id * 37) % 256 + 5 * (i % (8 + doc_id % 16))
        |              + 7 * (i // (8 + doc_id % 16))) % 256 END))
        |    // (3 * (8 + doc_id % 16) * (8 + (doc_id * 3) % 16)) AS BIGINT)
        |    AS mean_rgb,
        |  TRUE AS lossless
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Same arithmetic as mm_image_decode: the uniform-JPEG round trip
    // is exact (DC-only blocks), so the lossy codec shares the
    // lossless oracle.
    "mm_image_jpeg" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height,
        |  CAST((doc_id * 37) % 256 AS BIGINT) AS mean_gray
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Target row y of the 8×8 resize samples source row (y*h)//8 of an
    // h-row gradient whose row r is gray (g0+r)%256; the 8 uniform
    // target rows average (integer-divide) to the decoded mean.
    "mm_image_resize" ->
      """SELECT doc_id,
        |  CAST(8 AS INT) AS width,
        |  CAST(8 AS INT) AS height,
        |  CAST(list_sum(list_transform(range(0, 8),
        |    y -> ((doc_id * 37) % 256 + (y * (8 + (doc_id * 3) % 16)) // 8) % 256))
        |    // 8 AS BIGINT) AS mean_gray
        |FROM documents ORDER BY doc_id""".stripMargin,
    // payload bytes: 60 fixed (RIFF + extended fmt + fact + data
    // headers) + block = 4 + nibbleBytes + pad, nibbleBytes = n // 2.
    "mm_audio_adpcm" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(64 + doc_id % 64 AS INT) AS n_samples,
        |  CAST(64 + (64 + doc_id % 64) // 2
        |       + ((64 + doc_id % 64) // 2) % 2 AS INT) AS payload_bytes,
        |  TRUE AS tracked
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_audio_decode" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(64 + doc_id % 64 AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(range(0, 64 + doc_id % 64),
        |    i -> abs((doc_id + i * 37) % 2048 - 1024)))
        |    // (64 + doc_id % 64) AS BIGINT) AS mean_abs
        |FROM documents ORDER BY doc_id""".stripMargin,
    // FLAC is LOSSLESS, so the oracle recomputes the decoded mean from
    // the SOURCE signal formula (constant-512 head on every 4th id,
    // wrapped quadratic elsewhere); lossless mirrors TRUE — the Spark
    // side computes it by sample-for-sample comparison after the
    // decoder's CRC/MD5 checks, so any codec defect value-mismatches.
    "mm_audio_flac" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(96 + doc_id % 64 AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(range(0, 96 + doc_id % 64),
        |    i -> abs(CASE WHEN doc_id % 4 = 0 AND i < 64 THEN 512
        |             ELSE (doc_id * 31 + i * i * 7) % 4096 - 2048 END)))
        |    // (96 + doc_id % 64) AS BIGINT) AS mean_abs,
        |  TRUE AS lossless
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Stereo FLAC is lossless like mono, so both channel means
    // recompute from the source formulas (left = the mono signal;
    // right = left minus the small wiggle on every 3rd id, an
    // independent quadratic otherwise).
    "mm_audio_flac_stereo" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 96 + doc_id % 64),
        |      i -> CASE WHEN doc_id % 4 = 0 AND i < 64 THEN 512
        |           ELSE (doc_id * 31 + i * i * 7) % 4096 - 2048 END) AS l,
        |    list_transform(range(0, 96 + doc_id % 64),
        |      i -> CASE WHEN doc_id % 3 = 0 THEN
        |             (CASE WHEN doc_id % 4 = 0 AND i < 64 THEN 512
        |              ELSE (doc_id * 31 + i * i * 7) % 4096 - 2048 END)
        |             - ((doc_id + 3 * i) % 7 - 3)
        |           ELSE (doc_id * 17 + i * i * 11) % 4096 - 2048 END) AS r
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(96 + doc_id % 64 AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(l, x -> abs(x)))
        |    // (96 + doc_id % 64) AS BIGINT) AS mean_abs_l,
        |  CAST(list_sum(list_transform(r, x -> abs(x)))
        |    // (96 + doc_id % 64) AS BIGINT) AS mean_abs_r,
        |  TRUE AS lossless
        |FROM sig ORDER BY doc_id""".stripMargin,
    // Seek-table random access is lossless like the full decode, so
    // the oracle recomputes the target window's abs-sum from the
    // SOURCE formula and — independently of the decoder — where the
    // suffix must START: the greatest 256-sample seek-grid point at
    // or below the per-id target ((t // 256) * 256; non-negative
    // operands, so DuckDB's flooring // and Spark's truncating / agree).
    "mm_audio_seek" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    960 + (doc_id % 4) * 64 AS n,
        |    (doc_id * 131) % (960 + (doc_id % 4) * 64 - 64) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(t AS BIGINT) AS target_sample,
        |  CAST((t // 256) * 256 AS BIGINT) AS start_sample,
        |  CAST(n - (t // 256) * 256 AS BIGINT) AS suffix_len,
        |  CAST(list_sum(list_transform(range(t, t + 64),
        |    i -> abs(CASE WHEN doc_id % 4 = 0 AND i < 64 THEN 512
        |             ELSE (doc_id * 31 + i * i * 7) % 4096 - 2048 END)))
        |    AS BIGINT) AS window_sum_abs,
        |  TRUE AS lossless
        |FROM p ORDER BY doc_id""".stripMargin,
    // μ-law: per sample, the mirror recomputes decode(encode(x)) in
    // pure integer SQL — biased magnitude m = min(|x|,32635)+132,
    // segment e from m's leading bit, decoded |amplitude| =
    // ((mant·8+132) << e) − 132. The lossy value itself is checked.
    // A-law decode(encode(x)) recomputed per sample in SQL: 13-bit
    // magnitude m (negatives one's-complement), segment s by doubling
    // thresholds, then magnitude (mant·16+8) in seg 0 /
    // (mant·16+264)·2^(s−1) above — validated against the codec over
    // 200 ids before wiring (tools-side sim, zero mismatches).
    "mm_audio_alaw" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(64 + doc_id % 64 AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(
        |      list_transform(
        |        list_transform(
        |          list_transform(range(0, 64 + doc_id % 64),
        |            i -> (doc_id + i * 101) % 65536 - 32768),
        |          v -> CASE WHEN v >= 0 THEN v // 8
        |               ELSE ((-v + 7) // 8) - 1 END),
        |      m -> {'m': m, 's': CASE WHEN m < 32 THEN 0
        |            WHEN m < 64 THEN 1 WHEN m < 128 THEN 2
        |            WHEN m < 256 THEN 3 WHEN m < 512 THEN 4
        |            WHEN m < 1024 THEN 5 WHEN m < 2048 THEN 6
        |            ELSE 7 END}),
        |    x -> CASE WHEN x.s = 0 THEN ((x.m >> 1) & 15) * 16 + 8
        |         ELSE ((CASE WHEN x.s < 2 THEN (x.m >> 1) & 15
        |                ELSE (x.m >> x.s) & 15 END) * 16 + 264)
        |              * (1 << (x.s - 1)) END))
        |    // (64 + doc_id % 64) AS BIGINT) AS mean_abs
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_audio_ulaw" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(64 + doc_id % 64 AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(me, x ->
        |      ((((x.m >> (x.e + 3)) & 15) * 8 + 132) << x.e) - 132))
        |    // (64 + doc_id % 64) AS BIGINT) AS mean_abs
        |FROM (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(range(0, 64 + doc_id % 64),
        |        i -> LEAST(abs((doc_id + i * 37) % 2048 - 1024), 32635) + 132),
        |      m -> {'m': m, 'e': CASE
        |        WHEN m >= 16384 THEN 7 WHEN m >= 8192 THEN 6
        |        WHEN m >= 4096 THEN 5 WHEN m >= 2048 THEN 4
        |        WHEN m >= 1024 THEN 3 WHEN m >= 512 THEN 2
        |        WHEN m >= 256 THEN 1 ELSE 0 END}) AS me
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // Sampled frames are 0,3,6,... (< nf), i.e. i*3 for i in
    // [0, ceil(nf/3)); frame f's uniform luma is (id*13 + f*7) % 256,
    // so sampled frame i contributes (id*13 + i*21) % 256.
    "mm_video_frames" ->
      """SELECT doc_id,
        |  CAST(8 + (doc_id % 8) * 2 AS INT) AS width,
        |  CAST(8 + ((doc_id * 3) % 8) * 2 AS INT) AS height,
        |  CAST(4 + doc_id % 12 AS INT) AS n_frames,
        |  CAST((4 + doc_id % 12 + 2) // 3 AS INT) AS n_sampled,
        |  CAST(list_sum(list_transform(range(0, (4 + doc_id % 12 + 2) // 3),
        |    i -> (doc_id * 13 + i * 21) % 256))
        |    // ((4 + doc_id % 12 + 2) // 3) AS BIGINT) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Same selection arithmetic as mm_video_frames: the MJPEG round
    // trip is exact for uniform frames (DC-only blocks, see makeJpeg),
    // so the compressed container shares the uncompressed oracle.
    "mm_video_mjpeg" ->
      """SELECT doc_id,
        |  CAST(8 + (doc_id % 8) * 2 AS INT) AS width,
        |  CAST(8 + ((doc_id * 3) % 8) * 2 AS INT) AS height,
        |  CAST(4 + doc_id % 12 AS INT) AS n_frames,
        |  CAST((4 + doc_id % 12 + 2) // 3 AS INT) AS n_sampled,
        |  CAST(list_sum(list_transform(range(0, (4 + doc_id % 12 + 2) // 3),
        |    i -> (doc_id * 13 + i * 21) % 256))
        |    // ((4 + doc_id % 12 + 2) // 3) AS BIGINT) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Indexed frame access: uniform-gray MJPEG frames decode exactly,
    // so the oracle recomputes the TARGET frame's gray from the source
    // formula — a wrong idx1 offset lands on a different frame's gray
    // and goes value-red.
    "mm_video_seek" ->
      """SELECT doc_id,
        |  CAST(8 + (doc_id % 8) * 2 AS INT) AS width,
        |  CAST(8 + ((doc_id * 3) % 8) * 2 AS INT) AS height,
        |  CAST(4 + doc_id % 12 AS INT) AS n_frames,
        |  CAST((doc_id * 5) % (4 + doc_id % 12) AS BIGINT) AS frame_ix,
        |  CAST((doc_id * 13 + ((doc_id * 5) % (4 + doc_id % 12)) * 7) % 256
        |    AS BIGINT) AS frame_mean
        |FROM documents ORDER BY doc_id""".stripMargin,
    // GIF is lossless — identical arithmetic to the other two video
    // containers.
    "mm_video_gif" ->
      """SELECT doc_id,
        |  CAST(8 + (doc_id % 8) * 2 AS INT) AS width,
        |  CAST(8 + ((doc_id * 3) % 8) * 2 AS INT) AS height,
        |  CAST(4 + doc_id % 12 AS INT) AS n_frames,
        |  CAST((4 + doc_id % 12 + 2) // 3 AS INT) AS n_sampled,
        |  CAST(list_sum(list_transform(range(0, (4 + doc_id % 12 + 2) // 3),
        |    i -> (doc_id * 13 + i * 21) % 256))
        |    // ((4 + doc_id % 12 + 2) // 3) AS BIGINT) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  md5(text) AS content_key,
        |  CAST(64 + doc_id % 64 AS INT) AS width,
        |  CAST(64 + (doc_id * 7) % 64 AS INT) AS height,
        |  CAST(greatest(1, n_chars // 100) AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
