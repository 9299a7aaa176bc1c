package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (north-star EXT): image/audio/video
  * payloads travel as opaque `BinaryType` columns with typed metadata —
  * the direct generalization of the reference's raw byte[] cell values
  * (`HBaseScheme.java:101-102`).
  *
  * The decode step (JPEG/PNG/audio codecs) is STUBBED in this
  * environment — the codec libraries are not present — behind
  * [[MediaCodec]]: the Spark-side plumbing (schema, batched
  * per-partition execution, fixed-width feature output, partitioning
  * behavior) is real and tested; only the bytes→pixels function is a
  * deterministic fake. Swap [[MediaCodec.stub]] for a real JNI/ffmpeg
  * binding in production.
  */
object Multimodal {

  /** Canonical media-row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Wrap a text/binary source column as a media payload. */
  def asPayload(c: Column): Column = c.cast("binary")

  def byteLen(payload: Column): Column = length(payload)

  /** Content address of the payload (dedup / caching key). */
  def contentKey(payload: Column): Column = md5(payload)

  /** STUB decode: a deterministic fake "feature vector" derived from the
    * payload hash — stands in for decode→resize→embed until a real codec
    * is bound. Shape and determinism match what a real extractor must
    * provide (fixed dim, pure function of bytes). */
  def fakeFeatures(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload, i), lit(1000L))).cast("double") / 1000.0)

  /** Frame-sampling stub: how many frames a video of `durationMs` yields
    * at `everyMs` sampling — the planning arithmetic is real even though
    * frame extraction is not available here. */
  def sampledFrameCount(durationMs: Column, everyMs: Int): Column =
    greatest(lit(1), (durationMs / everyMs).cast("int"))

  /** Batched per-partition decode plumbing: the real pattern for codec
    * work in Scala Spark (the JVM analog of Python's mapInPandas) —
    * payloads are processed partition-at-a-time through an arbitrary
    * codec function without per-row task overhead, preserving
    * partitioning. `codec` is applied lazily over the iterator so
    * constant per-partition setup (codec init) happens once.
    */
  def decodePartitioned[T: Encoder](payloads: Dataset[Array[Byte]],
                                    codec: MediaCodec[T]): Dataset[T] =
    payloads.mapPartitions { it =>
      val c = codec.open()
      it.map(c.decode)
    }
}

/** Codec boundary: `open()` once per partition (native lib handles),
  * `decode` per payload. */
trait MediaCodec[T] extends Serializable {
  def open(): MediaCodec.Session[T]
}

object MediaCodec {
  trait Session[T] extends Serializable { def decode(bytes: Array[Byte]): T }

  /** The environment's deterministic stand-in codec: byte-length +
    * first-bytes checksum. Replace with an image/audio binding in prod. */
  def stub: MediaCodec[(Int, Long)] = () => new Session[(Int, Long)] {
    def decode(bytes: Array[Byte]): (Int, Long) =
      (bytes.length, bytes.take(16).foldLeft(1125899906842597L)((h, b) => 31 * h + b))
  }
}
