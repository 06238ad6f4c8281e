package graft.pipeline

/** Pure-JVM media header decoding: format sniff by magic bytes + metadata
  * extraction from the container header (no full decode, no codec/plugin
  * registry — deterministic across executors, ~ns per row).
  *
  * Covers the containers a training-data pipeline actually meets in bulk:
  * PNG (IHDR), JPEG (SOFn scan), GIF (logical screen descriptor), BMP
  * (BITMAPINFOHEADER), WAV/RIFF audio (fmt + data chunk walk — sample
  * rate, channels, bit depth, sample-frame count), MP3 (MPEG audio frame
  * header walk — sample rate, channels, mean bitrate, frame count; public
  * layout per ISO/IEC 11172-3), and MP4/ISO-BMFF video (box walk to
  * moov/mvhd duration, tkhd dims, stbl/stts sample count; public layout
  * per ISO/IEC 14496-12). Anything else returns None and the caller falls
  * back to its stub/opaque path. No payload is ever decoded — headers
  * only, so a corrupt stream degrades to None, never an exception.
  */
object MediaHeaders {
  final case class ImageDims(format: String, width: Int, height: Int,
    nFrames: Int = 1)
  final case class AudioMeta(format: String, sampleRate: Int, channels: Int,
    bitsPerSample: Int, nSampleFrames: Long)
  final case class Mp3Meta(sampleRate: Int, channels: Int, bitrateKbps: Int,
    nFrames: Int)
  final case class VideoMeta(format: String, width: Int, height: Int,
    durationMs: Long, nSamples: Long)

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
    else if (isGif(bytes))
      Some(ImageDims("gif", le16(bytes, 6), le16(bytes, 8), gifFrames(bytes)))
    else if (isJpeg(bytes)) jpegDims(bytes)
    else if (isBmp(bytes)) bmpDims(bytes)
    else if (isWebp(bytes)) webpDims(bytes)
    else None
  }

  // ---- WebP (RIFF container; public container spec) ----
  private def isWebp(b: Array[Byte]): Boolean =
    b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  /** Dims from the first chunk: VP8X (extended, 24-bit canvas minus-one),
    * VP8L (lossless, 14-bit packed minus-one), or "VP8 " (lossy key frame:
    * sync code 9D 01 2A then 14-bit LE dims). */
  private def webpDims(b: Array[Byte]): Option[ImageDims] = {
    def le24(i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
    val tag = new String(b.slice(12, 16), "US-ASCII")
    tag match {
      case "VP8X" if b.length >= 30 =>
        Some(ImageDims("webp", le24(24) + 1, le24(27) + 1))
      case "VP8L" if b.length >= 25 && u8(b, 20) == 0x2f =>
        val bits = le32(b, 21)
        Some(ImageDims("webp", (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1))
      case "VP8 " if b.length >= 30 &&
          u8(b, 23) == 0x9d && u8(b, 24) == 0x01 && u8(b, 25) == 0x2a =>
        Some(ImageDims("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff))
      case _ => None
    }
  }

  /** FLAC STREAMINFO (the mandatory first metadata block; public format
    * spec): sample rate 20 bits, channels-1 3 bits, bits-per-sample-1
    * 5 bits, total samples 36 bits, packed at STREAMINFO offsets 10-17
    * (file offsets 18-25 — "fLaC" + 4-byte block header before it). */
  def sniffFlac(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 26) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    if ((u8(b, 4) & 0x7f) != 0) return None // first block must be STREAMINFO
    val rate = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val ch = ((u8(b, 20) >> 1) & 0x7) + 1
    val bits = (((u8(b, 20) & 1) << 4) | (u8(b, 21) >> 4)) + 1
    val total = ((u8(b, 21) & 0xf).toLong << 32) |
      ((be32(b, 22).toLong) & 0xffffffffL)
    if (rate > 0) Some(AudioMeta("flac", rate, ch, bits, total)) else None
  }

  /** Ogg first-page codec identification (public Ogg framing + Vorbis I /
    * Opus specs): page = 27-byte header + segment table + payload; the
    * first packet is "\1vorbis" (channels at packet offset 11, rate LE at
    * 12) or "OpusHead" (channels at 9, input rate LE at 12). Total frames
    * need the last page — reported 0 from a header-only sniff. */
  def sniffOgg(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 28) return None
    if (!(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) return None
    val nsegs = u8(b, 26)
    val p = 27 + nsegs // payload start
    if (b.length >= p + 16 && b(p) == 0x01 && b(p + 1) == 'v' && b(p + 2) == 'o' &&
        b(p + 3) == 'r' && b(p + 4) == 'b' && b(p + 5) == 'i' && b(p + 6) == 's') {
      val ch = u8(b, p + 11)
      val rate = le32(b, p + 12)
      if (rate > 0 && ch > 0) Some(AudioMeta("vorbis", rate, ch, 0, 0L)) else None
    } else if (b.length >= p + 16 && b(p) == 'O' && b(p + 1) == 'p' &&
        b(p + 2) == 'u' && b(p + 3) == 's' && b(p + 4) == 'H' && b(p + 5) == 'e' &&
        b(p + 6) == 'a' && b(p + 7) == 'd') {
      val ch = u8(b, p + 9)
      val rate = le32(b, p + 12)
      if (rate > 0 && ch > 0) Some(AudioMeta("opus", rate, ch, 0, 0L)) else None
    } else None
  }

  /** GIF frame count via the real data-stream block walk (GIF89a spec,
    * public): skip the global color table, then iterate blocks — 0x21
    * extensions (label + length-prefixed sub-blocks), 0x2C image
    * descriptors (each one frame; skip its local color table + LZW
    * sub-blocks), 0x3B trailer. Truncated or corrupt streams stop the
    * walk with the frames counted so far; a stream with no countable
    * descriptor reports 1 (still image), matching the other stills. */
  private def gifFrames(b: Array[Byte]): Int = {
    // sniff only guarantees 10 bytes; the walk needs the full logical
    // screen descriptor — a shorter prefix is a still by contract, not an
    // ArrayIndexOutOfBounds
    if (b.length < 14) return 1
    var i = 13 // header (6) + logical screen descriptor (7)
    val packed = u8(b, 10)
    if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1)) // GCT
    var frames = 0
    var done = false
    while (!done && i < b.length) {
      u8(b, i) match {
        case 0x21 => // extension: introducer + label, then sub-blocks
          i += 2
          while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
          i += 1 // block terminator
        case 0x2c => // image descriptor: one frame
          frames += 1
          if (i + 10 > b.length) done = true
          else {
            val p = u8(b, i + 9)
            i += 10
            if ((p & 0x80) != 0) i += 3 * (1 << ((p & 7) + 1)) // LCT
            i += 1 // LZW minimum code size
            while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
            i += 1
          }
        case 0x3b => done = true // trailer
        case _ => done = true    // corrupt/unknown block: stop counting
      }
    }
    math.max(frames, 1)
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

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i).toLong & 0xffffffffL) << 32) | (be32(b, i + 4).toLong & 0xffffffffL)

  private final case class Mp3Frame(sampleRate: Int, channels: Int,
    bitrateKbps: Int, frameLen: Int)

  /** One MPEG audio frame header (4 bytes, big-endian bit layout):
    * 11 sync bits, version, layer, bitrate index, sample-rate index,
    * padding, channel mode. Rejects reserved version/layer/rate codes and
    * free/bad bitrates (whose frame length is undefined without parsing
    * the payload). */
  private def parseMp3Frame(b: Array[Byte], i: Int): Option[Mp3Frame] = {
    if (i < 0 || i + 4 > b.length) return None
    if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xe0) != 0xe0) return None
    val ver = (u8(b, i + 1) >> 3) & 3   // 0=MPEG2.5 1=reserved 2=MPEG2 3=MPEG1
    val layer = (u8(b, i + 1) >> 1) & 3 // 0=reserved 1=III 2=II 3=I
    if (ver == 1 || layer == 0) return None
    val brIdx = (u8(b, i + 2) >> 4) & 15
    val srIdx = (u8(b, i + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = (u8(b, i + 2) >> 1) & 1
    val channels = if (((u8(b, i + 3) >> 6) & 3) == 3) 1 else 2
    val sampleRate = (ver match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    })(srIdx)
    val v1 = ver == 3
    val bitrate = (layer match {
      case 3 => if (v1) Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
                else Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
      case 2 => if (v1) Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
                else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
      case _ => if (v1) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
                else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    })(brIdx)
    val frameLen = layer match {
      case 3 => (12 * bitrate * 1000 / sampleRate + padding) * 4 // Layer I, 4-byte slots
      case 2 => 144 * bitrate * 1000 / sampleRate + padding      // Layer II
      case _ =>                                                  // Layer III
        (if (v1) 144 else 72) * bitrate * 1000 / sampleRate + padding
    }
    Some(Mp3Frame(sampleRate, channels, bitrate, frameLen))
  }

  /** MP3 sniff + frame walk: an optional ID3v2 tag (syncsafe size), then
    * consecutive MPEG audio frames from the very next byte — no resync
    * scan, so arbitrary binary that merely contains a sync-like word
    * somewhere does not false-positive. Returns the first frame's sample
    * rate/channels, the mean bitrate over walked frames (VBR-aware), and
    * the number of frame headers present in the buffer. */
  def sniffMp3(b: Array[Byte]): Option[Mp3Meta] = {
    if (b == null || b.length < 4) return None
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + sz
    }
    parseMp3Frame(b, i).map { first =>
      var frames = 0; var brSum = 0L; var cur = i; var ok = true
      while (ok) {
        parseMp3Frame(b, cur) match {
          case Some(f) if f.frameLen > 4 =>
            frames += 1; brSum += f.bitrateKbps; cur += f.frameLen
          case _ => ok = false
        }
      }
      Mp3Meta(first.sampleRate, first.channels, (brSum / frames).toInt, frames)
    }
  }

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  private val Mp4TopLevel =
    Set("ftyp", "moov", "mdat", "free", "skip", "wide", "pdin", "styp", "sidx", "moof")
  private val Mp4Containers = Set("moov", "mdia", "minf", "stbl")

  /** MP4 / ISO-BMFF box walk: boxes are (be32 size, 4cc type, payload);
    * size 1 → 64-bit largesize follows, size 0 → to end of enclosure.
    * Collects mvhd timescale+duration, the first tkhd's 16.16-fixed
    * width/height, and the total stts sample count (= frame count for a
    * video track). The first box must carry a sane size and a known
    * top-level type — ASCII text (whose leading 4 bytes read as a huge
    * be32) never qualifies, and a moov is required, so header-less
    * fragments fall through to the caller's stub. Works on a header-only
    * prefix: an mdat declaring more bytes than present just ends the
    * walk. */
  def sniffMp4(b: Array[Byte]): Option[VideoMeta] = {
    if (b == null || b.length < 16) return None
    val sz0 = be32(b, 0).toLong & 0xffffffffL
    if (sz0 < 8 || sz0 > b.length || !Mp4TopLevel(boxType(b, 4))) return None
    var timescale = 0L; var duration = 0L
    var width = 0; var height = 0; var samples = 0L
    // per-trak state: stts counts only become frames when the trak's hdlr
    // declares a video handler — otherwise a 30 fps clip with AAC audio
    // would report video+audio sample counts summed
    var trakSamples = 0L; var trakIsVideo = false
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var cur = start
      while (cur + 8 <= end) {
        val i = cur.toInt
        var sz = be32(b, i).toLong & 0xffffffffL
        val t = boxType(b, i + 4)
        var hdr = 8L
        if (sz == 1 && cur + 16 <= end) { sz = be64(b, i + 8); hdr = 16 }
        else if (sz == 0) sz = end - cur
        if (sz < hdr || sz > end - cur) return // truncated/corrupt: stop
        val p = cur + hdr
        if (t == "trak" && depth < 8) {
          trakSamples = 0L; trakIsVideo = false
          walk(p, cur + sz, depth + 1)
          if (trakIsVideo) samples += trakSamples
        }
        else if (Mp4Containers(t) && depth < 8) walk(p, cur + sz, depth + 1)
        else if (t == "hdlr" && p + 12 <= end) {
          // version/flags(4) + pre_defined(4) + handler_type(4)
          trakIsVideo = trakIsVideo || boxType(b, (p + 8).toInt) == "vide"
        }
        else if (t == "mvhd" && p + 4 <= end) {
          val ver = u8(b, p.toInt)
          if (ver == 1 && p + 32 <= end) {
            timescale = be32(b, p.toInt + 20).toLong & 0xffffffffL
            duration = be64(b, p.toInt + 24)
          } else if (ver == 0 && p + 20 <= end) {
            timescale = be32(b, p.toInt + 12).toLong & 0xffffffffL
            duration = be32(b, p.toInt + 16).toLong & 0xffffffffL
          }
        } else if (t == "tkhd" && p + 4 <= end && width == 0 && height == 0) {
          val off = if (u8(b, p.toInt) == 1) 88 else 76
          if (p + off + 8 <= end) {
            width = be32(b, (p + off).toInt) >>> 16  // 16.16 fixed point
            height = be32(b, (p + off + 4).toInt) >>> 16
          }
        } else if (t == "stts" && p + 8 <= end) {
          val n = be32(b, p.toInt + 4)
          var e = 0; var q = p + 8
          while (e < n && q + 8 <= end) {
            trakSamples += be32(b, q.toInt).toLong & 0xffffffffL
            q += 8; e += 1 // each entry: (sample_count, sample_delta)
          }
        }
        cur += sz
      }
    }
    walk(0L, b.length.toLong, 0)
    if (timescale > 0)
      Some(VideoMeta("mp4", width, height, duration * 1000L / timescale, samples))
    else None
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
