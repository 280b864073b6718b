package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, deterministic feature extraction, and byte-range frame
  * sampling.
  *
  * The decode step is a clearly-marked deterministic stub (image/audio
  * codecs are not in this environment); everything Spark-side — schema,
  * batch shape, partition-preserving per-row compute — is real. A
  * production decoder replaces [[FakeDecoder]] only.
  */
object Multimodal {

  /** Payload column: the raw bytes (here synthesized from text; in a real
    * pipeline this is the stored image/audio blob). */
  def toBinary(c: Column): Column = c.cast("binary")

  /** Typed metadata struct carried next to the opaque payload. */
  def metaStruct(lang: Column, nChars: Column): Column =
    struct(lang.as("lang"), nChars.as("n_chars"))

  /** Deterministic "features" of a binary payload: byte length, content
    * digest, head-bytes signature. Stands in for decode+featurize. */
  def fakeFeatures(bin: Column): (Column, Column, Column) =
    (length(bin).as("n_bytes"),
     md5(bin).as("digest"),
     lower(hex(substring(bin, 1, 8))).as("head8"))

  /** Frame sampling: n fixed-width byte windows at regular offsets —
    * the video-frame / audio-chunk access pattern over a blob column. */
  def frameSample(bin: Column, n: Int, width: Int): Column =
    array((0 until n).map { i =>
      lower(hex(substring(bin, i * width + 1, width)))
    }: _*)

  /** Row-group batch "decoder" as a mapPartitions pipeline — the Scala
    * equivalent of a pandas-UDF batch: one decoder instance per
    * partition, rows streamed through it. Deterministic stub impl. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** Stub decoder: fixed-length signature of byte histogram moments. */
  object FakeDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      var sum = 0L; var sq = 0L
      bytes.foreach { b => val v = b & 0xff; sum += v; sq += v.toLong * v }
      val n = math.max(bytes.length, 1)
      Array(bytes.length.toFloat, sum.toFloat / n, sq.toFloat / n)
    }
  }

  /** Batch featurization: partition-preserving, no shuffle; the decoder
    * is instantiated once per partition (pooled, as a real codec would
    * be). Input: (id, bytes). Output: (id, features). */
  def batchFeaturize(ds: Dataset[(Long, Array[Byte])],
                     decoder: Decoder): Dataset[(Long, Array[Float])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map { case (id, b) => (id, decoder.decode(b)) } }
  }
}
