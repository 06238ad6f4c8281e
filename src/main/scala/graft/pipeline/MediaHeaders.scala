package graft.pipeline

/** Pure-JVM media header decoding: format sniff by magic bytes + metadata
  * extraction from the container header (no full decode, no codec/plugin
  * registry — deterministic across executors, ~ns per row).
  *
  * Covers the containers a training-data pipeline actually meets in bulk:
  * PNG (IHDR), JPEG (SOFn scan), GIF (logical screen descriptor), BMP
  * (BITMAPINFOHEADER), and WAV/RIFF audio (fmt + data chunk walk — sample
  * rate, channels, bit depth, sample-frame count). Anything else returns
  * None and the caller falls back to its stub/opaque path (compressed
  * audio and video codecs stay stubbed in this environment).
  */
object MediaHeaders {
  final case class ImageDims(format: String, width: Int, height: Int)
  final case class AudioMeta(format: String, sampleRate: Int, channels: Int,
    bitsPerSample: Int, nSampleFrames: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  def sniff(bytes: Array[Byte]): Option[ImageDims] = {
    if (bytes == null || bytes.length < 10) return None
    if (isPng(bytes)) pngDims(bytes)
    else if (isGif(bytes)) Some(ImageDims("gif", le16(bytes, 6), le16(bytes, 8)))
    else if (isJpeg(bytes)) jpegDims(bytes)
    else if (isBmp(bytes)) bmpDims(bytes)
    else None
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  private def pngDims(b: Array[Byte]): Option[ImageDims] =
    // bytes 8-15 are the IHDR chunk length + type; IHDR is mandatory-first
    if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(ImageDims("png", be32(b, 16), be32(b, 20)))
    else None

  private def isGif(b: Array[Byte]): Boolean =
    b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  private def bmpDims(b: Array[Byte]): Option[ImageDims] = {
    val hdrSize = le32(b, 14)
    if (hdrSize >= 40 && b.length >= 26)
      Some(ImageDims("bmp", le32(b, 18), math.abs(le32(b, 22)))) // height<0 = top-down DIB
    else if (hdrSize == 12 && b.length >= 22) // BITMAPCOREHEADER
      Some(ImageDims("bmp", le16(b, 18), le16(b, 20)))
    else None
  }

  /** WAV/RIFF header walk: chunks are (id, le32 size, payload) from byte
    * 12, word-aligned. Works on a header-only prefix — the data chunk's
    * SIZE field is the metadata, its payload need not be present. */
  def sniffWav(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 36) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // Long cursor: a corrupt chunk size near 2^32 must walk the cursor
    // past the buffer and end the loop, not wrap an Int back into range
    var cur = 12L
    var rate = 0; var ch = 0; var bits = 0; var fmtTag = 0
    var dataSize = -1L; var haveFmt = false
    while (cur + 8 <= b.length && !(haveFmt && dataSize >= 0)) {
      val i = cur.toInt
      val sz = le32(b, i + 4).toLong & 0xffffffffL
      // a fmt chunk declares at least 16 payload bytes; a corrupt smaller
      // size would silently read the next chunk's bytes as format fields
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ' &&
          sz >= 16 && i + 24 <= b.length) {
        fmtTag = le16(b, i + 8)
        ch = le16(b, i + 10); rate = le32(b, i + 12); bits = le16(b, i + 22)
        haveFmt = true
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataSize = sz
      }
      cur += 8L + sz + (sz & 1L) // word alignment
    }
    if (haveFmt && rate > 0 && ch > 0 && bits > 0) {
      // dataSize/blockAlign only counts sample frames for uncompressed
      // payloads: PCM (1), IEEE float (3), or EXTENSIBLE (0xFFFE, which
      // wraps one of those); ADPCM etc. store compressed bytes, so report
      // frames = 0 rather than a wrong count
      val uncompressed = fmtTag == 1 || fmtTag == 3 || fmtTag == 0xfffe
      val blockAlign = math.max(1, ch * bits / 8)
      val frames = if (dataSize >= 0 && uncompressed) dataSize / blockAlign else 0L
      Some(AudioMeta("wav", rate, ch, bits, frames))
    } else None
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff

  /** Walk JPEG segments to the first SOFn frame header (C0-CF minus the
    * non-frame C4/C8/CC): height/width are big-endian at +5/+7. */
  private def jpegDims(b: Array[Byte]): Option[ImageDims] = {
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xff) return None // lost sync
      var marker = u8(b, i + 1)
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) } // fill bytes
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return Some(ImageDims("jpeg", be16(b, i + 7), be16(b, i + 5)))
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i += 2 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / entropy-coded data reached without a SOF
      } else {
        i += 2 + be16(b, i + 2)
      }
    }
    None
  }
}
