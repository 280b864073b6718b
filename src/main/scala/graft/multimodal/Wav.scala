package graft.multimodal

/** Minimal real audio codec: RIFF/WAVE, PCM 16-bit little-endian —
  * the uncompressed interchange format audio corpora actually ship.
  * Pure JVM, no library, byte-honest like [[Multimodal.Bmp]]/[[Png]]:
  * the encoder writes the full RIFF chunk structure, the decoder
  * validates magics and the fmt contract and WALKS the chunk list
  * (skipping ancillary chunks like LIST/fact with proper word
  * alignment) rather than assuming data starts at a fixed offset, so
  * a round-trip proves real parsing. Header-supplied sizes are
  * bounds-checked in Long — the same forged-header guard the image
  * codecs carry. */
object Wav {

  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >> 8) & 0xff).toByte
    a(off + 2) = ((v >> 16) & 0xff).toByte
    a(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putShortLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def getIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

  private def getShortLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

  private def magic(a: Array[Byte], off: Int, s: String): Boolean =
    s.indices.forall(i => a(off + i) == s.charAt(i).toByte)

  /** Mono PCM16 samples → a complete RIFF/WAVE stream. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"Wav.encode: bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16) // fmt chunk size
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, 1) // mono
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * 2) // byte rate
    putShortLE(out, 32, 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putShortLE(out, 44 + 2 * i, samples(i) & 0xffff); i += 1
    }
    out
  }

  /** Header-validated decode back to (sampleRate, channels, samples —
    * channel-interleaved PCM16). Walks the chunk list: `fmt ` must
    * arrive before `data`, unknown chunks are skipped with RIFF's
    * 2-byte word alignment, truncated chunk declarations fail loudly. */
  def decode(wav: Array[Byte]): (Int, Int, Array[Short]) = {
    require(wav.length >= 44 && magic(wav, 0, "RIFF") &&
      magic(wav, 8, "WAVE"), "Wav.decode: not a RIFF/WAVE stream")
    var off = 12
    var sampleRate = -1; var channels = -1
    var samples: Array[Short] = null
    while (samples == null && off + 8 <= wav.length) {
      val size = getIntLE(wav, off + 4)
      require(size >= 0 && off + 8 + size.toLong <= wav.length,
        s"Wav.decode: chunk at $off declares $size bytes past the stream")
      if (magic(wav, off, "fmt ")) {
        require(size >= 16, "Wav.decode: fmt chunk too small")
        val codec = getShortLE(wav, off + 8)
        require(codec == 1, s"Wav.decode: non-PCM codec tag $codec")
        channels = getShortLE(wav, off + 10)
        sampleRate = getIntLE(wav, off + 12)
        val bits = getShortLE(wav, off + 22)
        require(bits == 16, s"Wav.decode: unsupported bit depth $bits")
        require(channels >= 1 && sampleRate > 0,
          s"Wav.decode: implausible fmt ($channels ch @ $sampleRate Hz)")
      } else if (magic(wav, off, "data")) {
        require(sampleRate > 0, "Wav.decode: data chunk before fmt")
        require(size % 2 == 0, "Wav.decode: odd PCM16 data length")
        val n = size / 2
        samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = getShortLE(wav, off + 8 + 2 * i).toShort; i += 1
        }
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(samples != null, "Wav.decode: no data chunk")
    (sampleRate, channels, samples)
  }
}
