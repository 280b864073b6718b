package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal real PNG codec: non-interlaced 8-bit grayscale / RGB / RGBA
  * (color types 0, 2, 6), pure JVM — zlib via `java.util.zip`, CRC via
  * `java.util.zip.CRC32`, nothing outside the JDK. The subset a public
  * image corpus actually needs for the opaque-binary multimodal path:
  * palette (3) and sub-8-bit depths are rejected loudly, never guessed.
  *
  * Byte-honest in both directions. The encoder cycles through ALL FIVE
  * scanline filters (None/Sub/Up/Average/Paeth, row y uses y mod 5), so
  * a round-trip proves the decoder's unfiltering math on every filter
  * type, not just the trivial one. The decoder validates the signature,
  * IHDR geometry, per-chunk CRCs, and the exact inflated length before
  * touching pixel data — a corrupt or truncated stream fails with a
  * message, and header-supplied dimensions are bounds-checked in Long
  * (the same forged-header overflow guard [[Multimodal.Bmp]] carries).
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** Channels per pixel for the supported color types. */
  def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 6 => 4 // RGBA
    case c => throw new IllegalArgumentException(
      s"Png: unsupported color type $c (supported: 0 gray, 2 RGB, 6 RGBA)")
  }

  private def putIntBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = ((v >>> 24) & 0xff).toByte
    a(off + 1) = ((v >>> 16) & 0xff).toByte
    a(off + 2) = ((v >>> 8) & 0xff).toByte
    a(off + 3) = (v & 0xff).toByte
  }

  private def getIntBE(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putIntBE(out, 0, data.length)
    val t = tpe.getBytes("US-ASCII")
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + data.length)
    putIntBE(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Row-major 8-bit pixels (channel-interleaved, `width·height·channels`
    * bytes) → a valid non-interlaced PNG stream. Row y is written with
    * scanline filter `y mod 5`, cycling through every filter type. */
  def encode(width: Int, height: Int, colorType: Int,
             pixels: Array[Byte]): Array[Byte] = {
    val ch = channelsOf(colorType)
    require(width > 0 && height > 0 &&
      pixels.length.toLong == width.toLong * height * ch,
      s"Png.encode: need ${width.toLong * height * ch} bytes for " +
        s"${width}x$height x$ch, got ${pixels.length}")
    val ihdr = new Array[Byte](13)
    putIntBE(ihdr, 0, width); putIntBE(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // ihdr(10..12): compression 0, filter method 0, interlace 0
    val rowBytes = width * ch
    val raw = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      val f = y % 5
      val o = y * (1 + rowBytes)
      raw(o) = f.toByte
      var i = 0
      while (i < rowBytes) {
        val cur = pixels(y * rowBytes + i) & 0xff
        val left = if (i >= ch) pixels(y * rowBytes + i - ch) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * rowBytes + i) & 0xff else 0
        val ul = if (y > 0 && i >= ch)
          pixels((y - 1) * rowBytes + i - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(o + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", buf.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Header-validated decode back to (width, height, colorType, pixels).
    * Accepts any legal ordering of the supported chunk set (multiple
    * IDATs concatenate; ancillary chunks are skipped after their CRC
    * checks out); rejects bad signatures, CRC mismatches, non-8-bit
    * depths, palette/interlaced images, and streams whose inflated
    * payload is not exactly `height·(1+width·channels)` bytes. */
  def decode(png: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(png.length >= Signature.length + 12 &&
      (0 until Signature.length).forall(i => png(i) == Signature(i)),
      "Png.decode: not a PNG stream (bad signature)")
    var off = Signature.length
    var ihdr: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 12 <= png.length, "Png.decode: truncated chunk header")
      val len = getIntBE(png, off)
      require(len >= 0 && off + 12 + len.toLong <= png.length,
        "Png.decode: truncated chunk body")
      val tpe = new String(png, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(png, off + 4, 4 + len)
      require(crc.getValue.toInt == getIntBE(png, off + 8 + len),
        s"Png.decode: CRC mismatch in $tpe chunk")
      tpe match {
        case "IHDR" =>
          require(ihdr == null && len == 13, "Png.decode: malformed IHDR")
          ihdr = java.util.Arrays.copyOfRange(png, off + 8, off + 8 + 13)
        case "IDAT" =>
          require(ihdr != null, "Png.decode: IDAT before IHDR")
          idat.write(png, off + 8, len)
        case "IEND" => done = true
        case "PLTE" =>
          throw new IllegalArgumentException(
            "Png.decode: palette images unsupported")
        case _ => // ancillary chunk (tEXt, gAMA, ...): CRC-checked, skipped
      }
      off += 12 + len
    }
    require(ihdr != null, "Png.decode: missing IHDR")
    val width = getIntBE(ihdr, 0); val height = getIntBE(ihdr, 4)
    val bitDepth = ihdr(8) & 0xff; val colorType = ihdr(9) & 0xff
    val interlace = ihdr(12) & 0xff
    require(bitDepth == 8, s"Png.decode: unsupported bit depth $bitDepth")
    val ch = channelsOf(colorType) // rejects palette / exotic types
    require((ihdr(10) & 0xff) == 0 && (ihdr(11) & 0xff) == 0,
      "Png.decode: unknown compression/filter method")
    require(interlace == 0, "Png.decode: interlaced images unsupported")
    // forged-header guard, Long end to end: width·channels and the whole
    // raw size must fit an Int before any allocation
    val rowBytesL = width.toLong * ch
    val rawLenL = height.toLong * (1L + rowBytesL)
    require(width > 0 && height > 0 && rawLenL <= Int.MaxValue,
      s"Png.decode: implausible dimensions ${width}x$height")
    val rowBytes = rowBytesL.toInt
    val raw = new Array[Byte](rawLenL.toInt)
    val infl = new Inflater
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        require(n > 0 || infl.finished(),
          "Png.decode: truncated or corrupt IDAT payload")
        got += n
      }
      require(got == raw.length && (infl.finished() ||
          infl.inflate(new Array[Byte](1)) == 0),
        s"Png.decode: pixel payload is ${got} bytes, " +
          s"expected ${raw.length}")
    } finally infl.end()
    // unfilter in place into the output array
    val px = new Array[Byte](height * rowBytes)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + rowBytes)) & 0xff
      require(f <= 4, s"Png.decode: unknown scanline filter $f")
      val o = y * (1 + rowBytes) + 1
      var i = 0
      while (i < rowBytes) {
        val cur = raw(o + i) & 0xff
        val left = if (i >= ch) px(y * rowBytes + i - ch) & 0xff else 0
        val up = if (y > 0) px((y - 1) * rowBytes + i) & 0xff else 0
        val ul = if (y > 0 && i >= ch)
          px((y - 1) * rowBytes + i - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        px(y * rowBytes + i) = ((cur + pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    (width, height, colorType, px)
  }
}
