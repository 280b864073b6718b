package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, deterministic feature extraction, and byte-range frame
  * sampling.
  *
  * Two decoders ride behind the [[Decoder]] trait: [[FakeDecoder]], the
  * clearly-marked deterministic stub standing in for heavyweight codecs
  * this environment lacks, and [[BmpDecoder]], a REAL pure-JVM 24-bit
  * BMP parser ([[Bmp]]) the mm02 gate drives end-to-end (encode →
  * stride-padded stream → header-validated decode). Everything
  * Spark-side — schema, batch shape, partition-preserving per-row
  * compute — is real either way.
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

  /** Minimal real image codec: 24-bit uncompressed Windows BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, 4-byte row
    * stride). Pure JVM, no library — small enough to be exact and
    * byte-honest: the encoder writes real padding, the decoder
    * validates the header and walks the stride, so a round-trip proves
    * actual codec work rather than a stub echo. */
  object Bmp {
    private val HeaderSize = 54 // 14-byte file header + 40-byte info

    private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = (v & 0xff).toByte
      a(off + 1) = ((v >> 8) & 0xff).toByte
      a(off + 2) = ((v >> 16) & 0xff).toByte
      a(off + 3) = ((v >> 24) & 0xff).toByte
    }

    private def getIntLE(a: Array[Byte], off: Int): Int =
      (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
        ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

    private def getShortLE(a: Array[Byte], off: Int): Int =
      (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

    def stride(width: Int): Int = ((width * 3) + 3) / 4 * 4

    /** Long-math stride for decode-side bounds checks: a forged header
      * width above ~715M wraps `width * 3` negative in Int, which
      * would slip through the Long bounds comparison below. */
    private def strideL(width: Int): Long =
      (width.toLong * 3 + 3) / 4 * 4

    /** Grayscale pixels (row-major, top-down, one byte each) → a valid
      * 24-bit BMP (B=G=R=gray). `gray.length` must be width·height. */
    def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
      require(width > 0 && height > 0 && gray.length == width * height,
        s"Bmp.encode: need ${width * height} pixels, got ${gray.length}")
      val rowBytes = stride(width)
      val out = new Array[Byte](HeaderSize + rowBytes * height)
      out(0) = 'B'; out(1) = 'M'
      putIntLE(out, 2, out.length)
      putIntLE(out, 10, HeaderSize) // pixel-array offset
      putIntLE(out, 14, 40) // info-header size
      putIntLE(out, 18, width)
      putIntLE(out, 22, height) // positive = bottom-up
      out(26) = 1 // planes
      out(28) = 24 // bits per pixel
      putIntLE(out, 34, rowBytes * height)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y // bottom-up storage
        var x = 0
        while (x < width) {
          val g = gray(srcRow * width + x)
          val p = HeaderSize + y * rowBytes + x * 3
          out(p) = g; out(p + 1) = g; out(p + 2) = g
          x += 1
        }
        y += 1
      }
      out
    }

    /** Header-validated decode of a 24-bit bottom-up BMP back to
      * (width, height, row-major top-down gray pixels — blue channel). */
    def decode(bmp: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bmp.length >= HeaderSize && bmp(0) == 'B' && bmp(1) == 'M',
        "Bmp.decode: not a BMP stream")
      val offset = getIntLE(bmp, 10)
      val width = getIntLE(bmp, 18)
      val height = getIntLE(bmp, 22)
      val bpp = getShortLE(bmp, 28)
      val compression = getIntLE(bmp, 30)
      require(bpp == 24 && compression == 0,
        s"Bmp.decode: unsupported bpp=$bpp/compression=$compression")
      // bounds math in Long END TO END: header-supplied dims are
      // attacker-ish input. stride(w)*h overflows Int for w=h=65536,
      // and the stride ITSELF wraps negative for w>715827882 (w*3 in
      // Int) — either would slip a forged header past an Int check and
      // crash in the pixel walk. After this check passes, stride and
      // width*height both provably fit in Int (stride*height ≤
      // bmp.length < 2^31, and 3·width·height ≤ stride·height).
      require(width > 0 && height > 0 && offset > 0 &&
        offset.toLong + strideL(width) * height <= bmp.length,
        "Bmp.decode: truncated pixel array")
      val rowBytes = strideL(width).toInt
      val gray = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y
        var x = 0
        while (x < width) {
          gray(y * width + x) = bmp(offset + srcRow * rowBytes + x * 3)
          x += 1
        }
        y += 1
      }
      (width, height, gray)
    }
  }

  /** Real-codec [[Decoder]] over [[Wav]] streams: returns
    * `[sampleRate, channels, samples...]` (channel-interleaved PCM16 —
    * every int16 is exact in Float). */
  object WavDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val (rate, ch, samples) = Wav.decode(bytes)
      val out = new Array[Float](2 + samples.length)
      out(0) = rate.toFloat; out(1) = ch.toFloat
      var i = 0
      while (i < samples.length) { out(2 + i) = samples(i).toFloat; i += 1 }
      out
    }
  }

  /** [[Decoder]] over the JDK's own `javax.imageio` readers (PNG, JPEG,
    * BMP, GIF — all in `java.desktop`, headless-safe): returns
    * `[width, height, 3, rgb...]` row-major. This is the path for the
    * LOSSY wild formats ([[Png]]/[[Bmp]] stay the oracle-gated exact
    * codecs — a JPEG round-trip is approximate by definition, so it is
    * spec-tested with a tolerance instead of hash-gated). */
  object ImageIoDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "ImageIoDecoder: unrecognized image stream")
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Float](3 + w * h * 3)
      out(0) = w.toFloat; out(1) = h.toFloat; out(2) = 3f
      var i = 3; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(i) = ((rgb >> 16) & 0xff).toFloat
          out(i + 1) = ((rgb >> 8) & 0xff).toFloat
          out(i + 2) = (rgb & 0xff).toFloat
          i += 3; x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Real-codec [[Decoder]] over [[Png]] streams: returns
    * `[width, height, channels, pixels...]` (row-major, channel-
    * interleaved). Exact for 8-bit content — every value is an integer
    * ≤ 255, well inside Float precision. */
  object PngDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val (w, h, colorType, px) = Png.decode(bytes)
      val out = new Array[Float](3 + px.length)
      out(0) = w.toFloat; out(1) = h.toFloat
      out(2) = Png.channelsOf(colorType).toFloat
      var i = 0
      while (i < px.length) { out(3 + i) = (px(i) & 0xff).toFloat; i += 1 }
      out
    }
  }

  /** Real-codec [[Decoder]]: parses the BMP stream and returns
    * `[width, height, gray...]` (pixels row-major top-down). Exact for
    * 8-bit grayscale content: every value is an integer ≤ 255, well
    * inside Float precision. */
  object BmpDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val (w, h, gray) = Bmp.decode(bytes)
      val out = new Array[Float](2 + gray.length)
      out(0) = w.toFloat; out(1) = h.toFloat
      var i = 0
      while (i < gray.length) { out(2 + i) = (gray(i) & 0xff).toFloat; i += 1 }
      out
    }
  }
}
