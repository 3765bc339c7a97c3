package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.10 L5 + north star): media payloads as
  * opaque `binary` columns with a typed metadata struct, plus partition-wise
  * batch feature extraction.
  *
  * Real in this container: the Spark-side plumbing — schema (binary +
  * struct<mime,modality,byte_len>), partitioning, the `mapPartitions` batch
  * shape (the Scala analogue of `mapInPandas`: one iterator per partition, so
  * a real decoder would amortize model/codec init per partition, not per
  * row) — and header metadata for all three modalities: IMAGE dims via
  * javax.imageio (PNG/JPEG/GIF/BMP/WBMP, header-only) + [[webpDims]] (all
  * three WebP header variants, pure byte parsing) + [[exifMeta]] (EXIF/TIFF
  * IFD walk: dims, orientation, capture time), AUDIO via javax.sound
  * (WAV/AIFF/AU), VIDEO via [[videoMeta]]'s MP4/ISO-BMFF box walk (brand,
  * duration, resolution, tracks — pure byte parsing). Pixel decode is real
  * for the JDK formats AND WebP-lossless (the pure-JVM [[Vp8l]] decoder).
  * STUBBED (needs real codecs, absent from this container): lossy-WebP/VP8
  * and AVIF pixel decode and video frame decode — non-parseable payloads
  * fall back to deterministic fake dims from the payload hash, and
  * `resize`/`sampleFrames` re-encode stubs likewise.
  */
object Multimodal {

  /** One media record: id + opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, content: Array[Byte], mime: String,
      modality: String, byte_len: Int)

  /** Extracted features (decode stub → fake but deterministic dims). */
  case class MediaFeatures(media_id: Long, byte_len: Int, width: Int,
      height: Int, channels: Int)

  /** Real header-only image decode for JDK-supported formats; deterministic
    * fake dimensions (payload-hash stub) for everything else, so non-image
    * payloads still flow through the pipeline shape.
    */
  def decodeDims(content: Array[Byte]): (Int, Int, Int) =
    imageDims(content).orElse(webpDims(content)).getOrElse(hashDims(content))

  /** WebP (width, height, channels) from the container header — pure byte
    * parsing, no decode, all three layouts: VP8L (lossless: 14+14-bit dims
    * after the 0x2f signature), VP8X (extended: 24-bit canvas dims − 1),
    * and lossy VP8 (frame tag + 0x9d012a start code + 14-bit dims).
    */
  def webpDims(content: Array[Byte]): Option[(Int, Int, Int)] = try {
    def u(i: Int): Int = content(i) & 0xff
    if (content.length < 30 ||
        new String(content, 0, 4, "ISO-8859-1") != "RIFF" ||
        new String(content, 8, 4, "ISO-8859-1") != "WEBP") return None
    new String(content, 12, 4, "ISO-8859-1") match {
      case "VP8L" if u(20) == 0x2f =>
        val b = u(21) | (u(22) << 8) | (u(23) << 16) | (u(24) << 24)
        val w = (b & 0x3fff) + 1
        val h = ((b >> 14) & 0x3fff) + 1
        val alpha = (b >> 28) & 1
        Some((w, h, 3 + alpha))
      case "VP8X" =>
        val alpha = (u(20) >> 4) & 1
        val w = (u(24) | (u(25) << 8) | (u(26) << 16)) + 1
        val h = (u(27) | (u(28) << 8) | (u(29) << 16)) + 1
        Some((w, h, 3 + alpha))
      case "VP8 " if u(23) == 0x9d && u(24) == 0x01 && u(25) == 0x2a =>
        val w = (u(26) | (u(27) << 8)) & 0x3fff
        val h = (u(28) | (u(29) << 8)) & 0x3fff
        Some((w, h, 3))
      case _ => None
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** (width, height, channels) from the image header via javax.imageio —
    * `ImageReader.getWidth/getHeight/getImageTypes` read metadata only, no
    * full-raster decode, so this is cheap enough for a 100 TB scan.
    */
  def imageDims(content: Array[Byte]): Option[(Int, Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0); val h = r.getHeight(0)
          val types = r.getImageTypes(0)
          val channels = if (types.hasNext) types.next().getNumBands else 3
          Some((w, h, channels))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** The non-image stub: deterministic fake dims from a payload hash. */
  def hashDims(content: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(content)
    (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1, 3)
  }

  /** Real audio header metadata via the JDK's javax.sound (WAV/AIFF/AU —
    * header-only, no codec): (sample_rate_hz, channels, bits_per_sample,
    * duration_ms; duration −1 when the container doesn't declare frame
    * count). None for non-audio payloads — same seam as [[imageDims]].
    */
  def audioMeta(content: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(content))
      val f = aff.getFormat
      val durMs =
        if (aff.getFrameLength > 0 && f.getFrameRate > 0)
          (aff.getFrameLength * 1000L / f.getFrameRate.toLong)
        else -1L
      Some((f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits, durMs))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real MP4 / ISO-BMFF video container metadata by box walking — pure
    * byte parsing, no codec needed (same header-only posture as
    * [[imageDims]]/[[audioMeta]]): major brand from `ftyp`, duration from
    * `moov/mvhd` (duration/timescale), presentation size from the largest
    * `trak/tkhd` (16.16 fixed point), and the track count. Handles 64-bit
    * box sizes and mvhd/tkhd version 1. Returns None when the payload
    * isn't ISO-BMFF (the first box walk immediately fails bounds checks on
    * non-MP4 bytes). FRAME decode stays stubbed — that genuinely needs a
    * codec — but container metadata, the part a 100 TB curation pass
    * filters on (duration/resolution gates), is real.
    */
  def videoMeta(content: Array[Byte]):
      Option[(String, Long, Int, Int, Int)] = try {
    val bb = java.nio.ByteBuffer.wrap(content) // big-endian
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    var brand: String = null
    var dur = -1L; var ts = 0L; var w = 0; var h = 0; var tracks = 0
    def walk(start: Long, end: Long): Unit = {
      var o = start
      while (o + 8 <= end) {
        val sz = u32(o.toInt)
        val tpe = new String(content, o.toInt + 4, 4, "ISO-8859-1")
        val (payload, boxEnd) =
          if (sz == 1) {
            if (o + 16 > end) return
            (o + 16, o + bb.getLong(o.toInt + 8))
          } else if (sz == 0) (o + 8, end) // box extends to container end
          else (o + 8, o + sz)
        if (boxEnd <= o || boxEnd > end) return // malformed/non-BMFF: stop
        val p = payload.toInt
        tpe match {
          case "ftyp" if payload + 4 <= boxEnd =>
            brand = new String(content, p, 4, "ISO-8859-1")
          case "moov" => walk(payload, boxEnd)
          case "trak" => tracks += 1; walk(payload, boxEnd)
          case "mvhd" if payload + 24 <= boxEnd =>
            if ((content(p) & 0xff) == 1) { // version 1: 64-bit times
              ts = u32(p + 20); dur = bb.getLong(p + 24)
            } else { ts = u32(p + 12); dur = u32(p + 16) }
          case "tkhd" =>
            // width/height trail the fixed header + 36-byte matrix
            val base = if ((content(p) & 0xff) == 1) p + 88 else p + 76
            if (base + 8 <= boxEnd) {
              val tw = (u32(base) >> 16).toInt
              val th = (u32(base + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
            }
          case _ => // leaf box we don't need: skip
        }
        o = boxEnd
      }
    }
    walk(0L, content.length.toLong)
    if (brand == null && tracks == 0) None
    else Some((if (brand == null) "" else brand,
      if (ts > 0 && dur >= 0) dur * 1000L / ts else -1L, w, h, tracks))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Real WebM/Matroska container metadata by EBML walking — the
    * [[videoMeta]] posture for the other big video container (pure byte
    * parsing, no codec): DocType from the EBML header, duration from
    * Segment→Info (Duration × TimestampScale), presentation size from the
    * largest Segment→Tracks→TrackEntry→Video (PixelWidth/PixelHeight), and
    * the track count. Handles unknown-size elements (streamed WebM writes
    * the Segment open-ended). Returns (doc_type, duration_ms, width,
    * height, n_tracks); None when the payload isn't EBML.
    */
  def webmMeta(content: Array[Byte]):
      Option[(String, Long, Int, Int, Int)] = try {
    val n = content.length
    def u(off: Int): Int = content(off) & 0xff
    // EBML varint: leading-zero count of the first byte gives the width.
    // IDs keep their marker bit (matching the spec's element-ID notation);
    // sizes strip it. Returns (value, bytesConsumed); all-1s size payload
    // means "unknown" → -1.
    def vint(off: Int, keepMarker: Boolean): (Long, Int) = {
      val b0 = u(off)
      val len = Integer.numberOfLeadingZeros(b0) - 23 // 1..8 for b0 != 0
      if (len < 1 || len > 8 || off + len > n) return (-2L, 0)
      var v = if (keepMarker) b0.toLong else (b0 & (0xff >>> len)).toLong
      var allOnes = !keepMarker && (b0 & (0xff >>> len)) == (0xff >>> len)
      var i = 1
      while (i < len) { val b = u(off + i); v = (v << 8) | b
        allOnes &&= b == 0xff; i += 1 }
      (if (allOnes) -1L else v, len)
    }
    def uintAt(off: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | u(off + i); i += 1 }; v
    }
    var docType: String = null
    var durTicks = -1.0; var tsScale = 1000000L // EBML default: 1 ms ticks
    var w = 0; var h = 0; var tracks = 0
    // ids: EBML=0x1A45DFA3 DocType=0x4282 Segment=0x18538067
    //      Info=0x1549A966 TimestampScale=0x2AD7B1 Duration=0x4489
    //      Tracks=0x1654AE6B TrackEntry=0xAE Video=0xE0
    //      PixelWidth=0xB0 PixelHeight=0xBA
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o < end) {
        val (id, idLen) = vint(o, keepMarker = true)
        if (idLen == 0) return
        val (sz, szLen) = vint(o + idLen, keepMarker = false)
        if (szLen == 0 || sz == -2L || sz > n) return
        val p = o + idLen + szLen
        val pEnd = if (sz == -1L) end else p + sz.toInt
        if (pEnd > end || pEnd <= o) return // malformed: stop
        id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL =>
            walk(p, pEnd) // master elements we need: descend
          case 0xAEL => tracks += 1; walk(p, pEnd)
          case 0xE0L => walk(p, pEnd)
          case 0x4282L =>
            docType = new String(content, p, (pEnd - p), "ISO-8859-1").trim
          case 0x2AD7B1L => tsScale = uintAt(p, pEnd - p)
          case 0x4489L => // float, 4 or 8 bytes
            if (pEnd - p == 4)
              durTicks = java.lang.Float.intBitsToFloat(uintAt(p, 4).toInt)
            else if (pEnd - p == 8)
              durTicks = java.lang.Double.longBitsToDouble(uintAt(p, 8))
          case 0xB0L => w = math.max(w, uintAt(p, pEnd - p).toInt)
          case 0xBAL => h = math.max(h, uintAt(p, pEnd - p).toInt)
          case _ => // skip
        }
        o = pEnd
      }
    }
    if (n < 4 || uintAt(0, 4) != 0x1A45DFA3L) None
    else {
      walk(0, n)
      val durMs =
        if (durTicks >= 0) (durTicks * tsScale / 1e6).toLong else -1L
      Some((if (docType == null) "" else docType, durMs, w, h, tracks))
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Real MP3 metadata from the ID3v2 tag header + the first Layer-III
    * frame header — pure byte parsing (no codec; the [[videoMeta]]
    * posture for compressed audio): (version `"MPEG1"|"MPEG2"|"MPEG2.5"`,
    * bitrate_kbps, sample_rate_hz, channels, duration_ms CBR estimate over
    * the post-tag payload, id3v2 present). None when no valid frame sync
    * is found in the first 8 KiB after the tag (not an MP3).
    */
  def mp3Meta(content: Array[Byte]):
      Option[(String, Int, Int, Int, Long, Boolean)] = try {
    val n = content.length
    def u(off: Int): Int = content(off) & 0xff
    // ID3v2: "ID3" maj min flags size4(syncsafe: 7 bits/byte)
    val hasId3 = n >= 10 && content(0) == 'I' && content(1) == 'D' &&
      content(2) == '3'
    val audioStart =
      if (hasId3)
        10 + ((u(6) << 21) | (u(7) << 14) | (u(8) << 7) | u(9))
      else 0
    val kbpsV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val kbpsV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
      144, 160)
    var o = audioStart
    val scanEnd = math.min(n - 4, audioStart + 8192)
    while (o >= 0 && o <= scanEnd) {
      if (u(o) == 0xff && (u(o + 1) & 0xe0) == 0xe0) {
        val verBits = (u(o + 1) >> 3) & 0x3   // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (u(o + 1) >> 1) & 0x3 // 1 = Layer III
        val brIdx = (u(o + 2) >> 4) & 0xf
        val srIdx = (u(o + 2) >> 2) & 0x3
        if (verBits != 1 && layerBits == 1 && brIdx != 0 && brIdx != 15 &&
            srIdx != 3) {
          val ver = verBits match {
            case 3 => "MPEG1"; case 2 => "MPEG2"; case _ => "MPEG2.5"
          }
          val kbps = (if (verBits == 3) kbpsV1 else kbpsV2)(brIdx)
          val srBase = Array(44100, 48000, 32000)(srIdx)
          val sr = verBits match {
            case 3 => srBase; case 2 => srBase / 2; case _ => srBase / 4
          }
          val ch = if (((u(o + 3) >> 6) & 0x3) == 3) 1 else 2
          val durMs = (n - o).toLong * 8L / kbps // bytes*8 / (kbps*1000) *1000
          return Some((ver, kbps, sr, ch, durMs, hasId3))
        }
      }
      o += 1
    }
    None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Real AVIF/HEIF metadata via the same ISOBMFF box walk as [[videoMeta]]
    * (AVIF is an ftyp-branded BMFF still image; no codec in the container,
    * so metadata — not pixels — is the honest surface): brand from `ftyp`,
    * presentation size from the LARGEST `meta`→`iprp`→`ipco`→`ispe` image
    * spatial extent (smaller `ispe`s are thumbnails/alpha aux images), and
    * the item count from `meta`→`iinf`. `meta`, `iinf`, and `ispe` are
    * FullBoxes — their payload starts after 4 version/flags bytes, unlike
    * the plain containers `moov`/`iprp`/`ipco`. Returns (brand, width,
    * height, n_items); None when the payload isn't BMFF or carries no ispe.
    */
  def avifMeta(content: Array[Byte]): Option[(String, Int, Int, Int)] = try {
    val bb = java.nio.ByteBuffer.wrap(content)
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    var brand: String = null
    var w = 0; var h = 0; var items = 0
    def walk(start: Long, end: Long): Unit = {
      var o = start
      while (o + 8 <= end) {
        val sz = u32(o.toInt)
        val tpe = new String(content, o.toInt + 4, 4, "ISO-8859-1")
        val (payload, boxEnd) =
          if (sz == 1) {
            if (o + 16 > end) return
            (o + 16, o + bb.getLong(o.toInt + 8))
          } else if (sz == 0) (o + 8, end)
          else (o + 8, o + sz)
        if (boxEnd <= o || boxEnd > end) return
        val p = payload.toInt
        tpe match {
          case "ftyp" if payload + 4 <= boxEnd =>
            brand = new String(content, p, 4, "ISO-8859-1")
          case "meta" => walk(payload + 4, boxEnd) // FullBox
          case "iprp" | "ipco" => walk(payload, boxEnd)
          case "iinf" if payload + 6 <= boxEnd => // FullBox; count u16 (v0) / u32
            items =
              if ((content(p) & 0xff) == 0) ((u32(p + 4) >> 16) & 0xffff).toInt
              else u32(p + 4).toInt
          case "ispe" if payload + 12 <= boxEnd => // FullBox; w u32, h u32
            val iw = u32(p + 4).toInt
            val ih = u32(p + 8).toInt
            if (iw.toLong * ih > w.toLong * h) { w = iw; h = ih }
          case _ => ()
        }
        o = boxEnd
      }
    }
    walk(0L, content.length.toLong)
    if (brand == null || w == 0) None else Some((brand, w, h, items))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Real EXIF/TIFF metadata — pure byte parsing of the TIFF IFD
    * structure, both endiannesses: a standalone TIFF (`II*\0` / `MM\0*`)
    * is walked directly; a JPEG's APP1 `Exif\0\0` segment is located by
    * the marker scan first. Returns (width, height, orientation 1–8,
    * date_time — "" when absent). Dimensions prefer the Exif sub-IFD's
    * PixelX/YDimension (JPEG IFD0 usually lacks 0x0100/0x0101);
    * orientation comes from IFD0 tag 0x0112 — the one EXIF field every
    * image pipeline MUST read before resizing, since cameras store
    * sensor-native rasters and the display rotation lives only here.
    * date_time prefers DateTimeOriginal (0x9003) over IFD0 DateTime
    * (0x0132). Only IFD0 and the Exif sub-IFD are visited (no IFD-chain
    * loop to cycle), every read is bounds-guarded, and any structural
    * violation returns None — the untrusted-corpus posture of the other
    * walkers.
    */
  def exifMeta(content: Array[Byte]): Option[(Int, Int, Int, String)] = try {
    def u8(i: Int): Int = content(i) & 0xff
    // locate the TIFF stream: standalone, or inside JPEG APP1 Exif
    val tiffOff: Int =
      if (content.length >= 8 && ((u8(0) == 0x49 && u8(1) == 0x49) ||
          (u8(0) == 0x4d && u8(1) == 0x4d))) 0
      else if (content.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        var o = 2
        var found = -1
        while (found < 0 && o + 4 <= content.length && u8(o) == 0xff) {
          val marker = u8(o + 1)
          if (marker == 0xda) return None // SOS: entropy data, no APP1 left
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9))
            o += 2
          else {
            val len = (u8(o + 2) << 8) | u8(o + 3)
            if (len < 2 || o + 2 + len > content.length) return None
            if (marker == 0xe1 && len >= 8 &&
                new String(content, o + 4, 6, "ISO-8859-1") == "Exif\u0000\u0000")
              found = o + 10
            else o += 2 + len
          }
        }
        if (found < 0) return None else found
      } else return None
    val le = u8(tiffOff) == 0x49
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong
    if (u16(tiffOff + 2) != 42) return None
    var w = 0; var h = 0; var xw = 0; var xh = 0; var orient = 1
    var dt0 = ""; var dtOrig = ""; var exifIfd = -1L
    def readAscii(off: Int, n: Int): String = {
      if (off < 0 || n < 0 || off + n > content.length) return ""
      val raw = new String(content, off, n, "ISO-8859-1")
      val z = raw.indexOf('\u0000')
      if (z >= 0) raw.substring(0, z) else raw
    }
    def walkIfd(ifd: Long, isExif: Boolean): Unit = {
      val base = tiffOff + ifd.toInt
      if (base < 0 || base + 2 > content.length) return
      val n = u16(base)
      var i = 0
      while (i < n) {
        val e = base + 2 + i * 12
        if (e + 12 > content.length) return
        val tag = u16(e); val tpe = u16(e + 2); val cnt = u32(e + 4)
        // inline when total size ≤ 4, else the value field is an offset
        val elemSize = tpe match {
          case 1 | 2 | 6 | 7 => 1L
          case 3 | 8 => 2L
          case 4 | 9 | 11 => 4L
          case 5 | 10 | 12 => 8L
          case _ => return
        }
        val total = elemSize * cnt
        val vOff = if (total <= 4) e + 8 else tiffOff + u32(e + 8).toInt
        def sv: Int = // first numeric value as Int (SHORT or LONG)
          if (tpe == 3) u16(vOff)
          else if (tpe == 4) u32(vOff).toInt
          else 0
        tag match {
          case 0x0100 if !isExif => w = sv
          case 0x0101 if !isExif => h = sv
          case 0x0112 if !isExif && sv >= 1 && sv <= 8 => orient = sv
          case 0x0132 if !isExif && tpe == 2 =>
            dt0 = readAscii(vOff, cnt.toInt)
          case 0x8769 if !isExif && (tpe == 4 || tpe == 3) => exifIfd = sv
          case 0xa002 if isExif => xw = sv
          case 0xa003 if isExif => xh = sv
          case 0x9003 if isExif && tpe == 2 =>
            dtOrig = readAscii(vOff, cnt.toInt)
          case _ => ()
        }
        i += 1
      }
    }
    walkIfd(u32(tiffOff + 4), isExif = false)
    if (exifIfd > 0) walkIfd(exifIfd, isExif = true)
    val fw = if (xw > 0) xw else w
    val fh = if (xh > 0) xh else h
    if (fw <= 0 || fh <= 0) None
    else Some((fw, fh, orient, if (dtOrig.nonEmpty) dtOrig else dt0))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Real FLAC metadata from the STREAMINFO block — pure byte parsing:
    * ("fLaC" magic, then metadata blocks of 1-byte last|type + 3-byte
    * length; STREAMINFO is type 0, 34 bytes, with sample rate (20 bits),
    * channels−1 (3), bits-per-sample−1 (5), and total samples (36) packed
    * big-endian after the block/frame size fields). Returns (sample_rate,
    * channels, bits_per_sample, duration_ms exact from total samples, or
    * −1 when the encoder left the count 0). None when not FLAC.
    */
  def flacMeta(content: Array[Byte]): Option[(Int, Int, Int, Long)] = try {
    val n = content.length
    if (n < 42 || new String(content, 0, 4, "ISO-8859-1") != "fLaC") return None
    def u(off: Int): Int = content(off) & 0xff
    var o = 4
    while (o + 4 <= n) {
      val tpe = u(o) & 0x7f
      val len = (u(o + 1) << 16) | (u(o + 2) << 8) | u(o + 3)
      if (tpe == 0 && len >= 34 && o + 4 + 34 <= n) {
        val p = o + 4 + 10 // skip min/max blocksize (4) + min/max framesize (6)
        val sr = (u(p) << 12) | (u(p + 1) << 4) | (u(p + 2) >> 4)
        val ch = ((u(p + 2) >> 1) & 0x7) + 1
        val bps = (((u(p + 2) & 0x1) << 4) | (u(p + 3) >> 4)) + 1
        val total = ((u(p + 3) & 0xfL) << 32) | (u(p + 4).toLong << 24) |
          (u(p + 5).toLong << 16) | (u(p + 6).toLong << 8) | u(p + 7).toLong
        if (sr == 0) return None
        return Some((sr, ch, bps,
          if (total == 0) -1L else total * 1000L / sr))
      }
      if ((u(o) & 0x80) != 0) return None // last block and no STREAMINFO
      o += 4 + len
    }
    None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Real Ogg metadata — pure byte parsing of the page structure ("OggS"
    * capture pattern, 27-byte header + segment table) plus the first
    * packet's codec identification: Vorbis (`\\x01vorbis`: channels u8,
    * rate u32 LE) or Opus (`OpusHead`: channels u8, pre-skip u16 LE; clock
    * fixed at 48 kHz). Duration comes from the LAST page's granule
    * position (PCM sample index at 48 kHz for Opus, minus pre-skip).
    * Returns (codec, sample_rate, channels, duration_ms; −1 when no
    * positive granule was found). None when not Ogg or the codec is
    * neither.
    */
  def oggMeta(content: Array[Byte]): Option[(String, Int, Int, Long)] = try {
    val n = content.length
    def u(off: Int): Int = content(off) & 0xff
    if (n < 58 || new String(content, 0, 4, "ISO-8859-1") != "OggS") return None
    def u32le(off: Int): Long = u(off) | (u(off + 1).toLong << 8) |
      (u(off + 2).toLong << 16) | (u(off + 3).toLong << 24)
    def u64le(off: Int): Long = u32le(off) | (u32le(off + 4) << 32)
    var codec: String = null
    var rate = 0; var ch = 0; var preskip = 0
    var lastGranule = -1L
    var o = 0
    while (o + 27 <= n && new String(content, o, 4, "ISO-8859-1") == "OggS") {
      val granule = u64le(o + 6)
      if (granule > 0) lastGranule = granule
      val nSegs = u(o + 26)
      if (o + 27 + nSegs > n) return None
      var bodyLen = 0
      var i = 0
      while (i < nSegs) { bodyLen += u(o + 27 + i); i += 1 }
      val body = o + 27 + nSegs
      if (codec == null) {
        if (body + 16 <= n && u(body) == 1 &&
            new String(content, body + 1, 6, "ISO-8859-1") == "vorbis") {
          codec = "vorbis"
          ch = u(body + 11)
          rate = u32le(body + 12).toInt
        } else if (body + 12 <= n &&
            new String(content, body, 8, "ISO-8859-1") == "OpusHead") {
          codec = "opus"
          ch = u(body + 9)
          preskip = (u(body + 10) | (u(body + 11) << 8)).toInt
          rate = 48000 // Opus granule clock is always 48 kHz
        }
      }
      o = body + bodyLen
    }
    if (codec == null || rate == 0) None
    else {
      val dur =
        if (lastGranule <= 0) -1L
        else if (codec == "opus") (lastGranule - preskip) * 1000L / 48000L
        else lastGranule * 1000L / rate
      Some((codec, rate, ch, dur))
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Full-raster pixel statistics via the JDK's OWN ImageIO decoders
    * (PNG/JPEG/GIF/BMP/WBMP all ship with the JDK — JPEG through its
    * baseline codec, golden-tested within lossy tolerance) plus the
    * pure-JVM [[Vp8l]] decoder for WebP-lossless: width, height, and
    * per-channel (R, G, B) means in [0, 255]. None when no decoder accepts
    * the payload. This is the expensive cousin of [[imageDims]] — at
    * 100 TB run it AFTER the header-level filters have pruned the scan,
    * never as the first pass. Only formats with no available codec (video
    * frames, lossy-WebP/VP8, AVIF) fall back to None and stay covered by
    * the documented stubs.
    */
  def pixelStats(content: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null || img.getWidth == 0 || img.getHeight == 0)
        vp8lPixelStats(content)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](3)
        // bulk row reads: one color-model conversion call per row instead
        // of one per pixel (per-pixel getRGB is the classic decode-pass
        // bottleneck)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            sums(0) += (rgb >> 16) & 0xff
            sums(1) += (rgb >> 8) & 0xff
            sums(2) += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Some((w, h, sums.map(_ / (w.toDouble * h))))
      }
    } catch { case scala.util.control.NonFatal(_) => vp8lPixelStats(content) }

  /** WebP-lossless pixel stats via the pure-JVM [[Vp8l]] decoder (no JDK
    * codec exists for WebP): same (w, h, RGB means) contract as
    * [[pixelStats]], None for non-VP8L payloads.
    */
  private def vp8lPixelStats(content: Array[Byte]): Option[(Int, Int, Array[Double])] =
    Vp8l.decode(content).map { case (w, h, px) =>
      val sums = new Array[Double](3)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        sums(0) += (p >>> 16) & 0xff
        sums(1) += (p >>> 8) & 0xff
        sums(2) += p & 0xff
        i += 1
      }
      (w, h, sums.map(_ / (w.toDouble * h)))
    }

  /** Full PCM sample decode via the JDK's own javax.sound codecs (WAV/
    * AIFF/AU with PCM payloads need no external codec — the audio cousin
    * of [[pixelStats]]): (frames, channels, peak, rms) with samples
    * normalized to [-1, 1]. Peak and RMS are THE gates of an audio
    * curation pass (clipped/silent clip filters). Streams the payload in
    * 64 KiB chunks — never materializes the decoded PCM. None for
    * non-audio or compressed-codec payloads (same seam as [[imageDims]]);
    * like pixelStats, run AFTER header-level filters have pruned the scan.
    */
  def audioStats(content: Array[Byte]): Option[(Long, Int, Double, Double)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val f = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val bits = f.getSampleSizeInBits
        val enc = f.getEncoding
        if ((enc != PCM_SIGNED && enc != PCM_UNSIGNED) ||
            (bits != 8 && bits != 16)) None
        else {
          val bytesPerSample = bits / 8
          val full = (1L << (bits - 1)).toDouble // 128 / 32768
          val buf = new Array[Byte](1 << 16)
          var nSamples = 0L; var sumSq = 0.0; var peak = 0.0
          var carry = 0; var carryByte = 0
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            while (i + (bytesPerSample - carry) <= n) {
              val raw =
                if (bytesPerSample == 1) buf(i) & 0xff
                else {
                  val b0 = if (carry == 1) carryByte else buf(i) & 0xff
                  val b1 = buf(i + 1 - carry) & 0xff
                  if (f.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
                }
              val v =
                if (enc == PCM_UNSIGNED) raw - full
                else if (bits == 8) buf(i).toDouble
                else raw.toShort.toDouble
              val s = v / full
              sumSq += s * s
              val a = math.abs(s); if (a > peak) peak = a
              nSamples += 1
              i += bytesPerSample - carry
              carry = 0
            }
            // a 16-bit sample split across read() boundaries
            if (i < n) { carry = 1; carryByte = buf(i) & 0xff }
            n = in.read(buf)
          }
          if (nSamples == 0) None
          else Some((nSamples / f.getChannels, f.getChannels, peak,
            math.sqrt(sumSq / nSamples)))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Documents → media table: payload = utf-8 bytes (deterministic fake
    * "image"), metadata struct alongside. The schema is the contract.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("mime"),
        lit("image-stub").as("modality"),
        length(col("text").cast("binary")).as("byte_len")).as("meta"))

  /** Partition-wise batch feature extraction — the mapInPandas shape: the
    * lambda sees one Iterator per partition (batch), not one call per row.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.byte_len"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { batch =>
        // per-partition init would go here (codec/model handles)
        batch.map { case (id, content, len) =>
          val (w, h, c) = decodeDims(content)
          MediaFeatures(id, len, w, h, c)
        }
      }
  }

  /** sign(a·b − c·d) over non-negative longs in 128-bit arithmetic
    * (`Math.multiplyHigh` + unsigned low words) — the dHash brightness
    * comparison without the Long overflow a ~0.4-gigapixel image would
    * hit under 64-bit products.
    */
  private[pipeline] def cmpProducts(a: Long, b: Long, c: Long, d: Long): Int = {
    val hiL = Math.multiplyHigh(a, b); val loL = a * b
    val hiR = Math.multiplyHigh(c, d); val loR = c * d
    if (hiL != hiR) java.lang.Long.compare(hiL, hiR)
    else java.lang.Long.compareUnsigned(loL, loR)
  }

  /** 64-bit difference hash (dHash) — the perceptual image fingerprint
    * bridging the multimodal tier to the dedup family: decode (real
    * JDK/VP8L codecs, the [[pixelStats]] seam), integer-luminance
    * box-downsample to a 9×8 grid, bit i set iff cell (cy, cx) is
    * strictly brighter than its right neighbor. Re-encodes and small
    * edits land within a few bits of Hamming distance; unrelated images
    * are ~32 bits apart.
    *
    * Exactness: luminance is the integer 299r+587g+114b, cell means are
    * never divided — brightness comparisons cross-multiply (sum_l·cnt_r >
    * sum_r·cnt_l) in 128 bits ([[cmpProducts]]: a cell's luminance sum
    * times its neighbor's pixel count exceeds 2⁶³ around ~0.4 gigapixel,
    * which would silently flip bits under Long arithmetic), so the hash is
    * a pure integer function of the pixels (no float, no rounding,
    * engine/platform-stable at any image size). Streams one pixel row at
    * a time like [[pixelStats]]; cells a tiny image never touches stay
    * (0, 0) and compare false — deterministic. None when no codec decodes
    * the payload (the documented codec ceiling).
    */
  def dHash(content: Array[Byte]): Option[Long] = {
    val gw = 9; val gh = 8
    def fold(w: Int, h: Int, rowAt: Int => Array[Int]): Option[Long] = {
      if (w <= 0 || h <= 0) return None
      val sums = Array.ofDim[Long](gh, gw)
      val cnts = Array.ofDim[Long](gh, gw)
      var y = 0
      while (y < h) {
        val cy = math.min(gh - 1, y * gh / h)
        val row = rowAt(y)
        var x = 0
        while (x < w) {
          val cx = math.min(gw - 1, x * gw / w)
          val p = row(x)
          sums(cy)(cx) += 299L * ((p >> 16) & 0xff) +
            587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
          cnts(cy)(cx) += 1
          x += 1
        }
        y += 1
      }
      var bits = 0L; var i = 0; var cy = 0
      while (cy < gh) {
        var cx = 0
        while (cx < gw - 1) {
          if (cmpProducts(sums(cy)(cx), cnts(cy)(cx + 1),
              sums(cy)(cx + 1), cnts(cy)(cx)) > 0) bits |= 1L << i
          i += 1; cx += 1
        }
        cy += 1
      }
      Some(bits)
    }
    def viaVp8l: Option[Long] = Vp8l.decode(content).flatMap {
      case (w, h, px) =>
        val r = new Array[Int](w)
        fold(w, h, y => { System.arraycopy(px, y * w, r, 0, w); r })
    }
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) viaVp8l
      else {
        val w = img.getWidth; val h = img.getHeight
        val row = new Array[Int](w)
        fold(w, h, y => { img.getRGB(0, y, w, 1, row, 0, w); row })
      }
    } catch { case scala.util.control.NonFatal(_) => viaVp8l }
  }

  /** Near-duplicate image pairs from dHash fingerprints, banded: the 64
    * bits split into 4 × 16-bit keys, candidates equi-join on any shared
    * (band, key) — by pigeonhole, every pair within Hamming distance 3 is
    * guaranteed a shared band — and the exact popcount refine keeps
    * `hamming ≤ maxDist`. Same scale algebra as the MinHash-LSH pipeline:
    * a hash join on band keys, never an all-pairs cross.
    */
  def dHashPairs(hashes: DataFrame, idCol: String = "media_id",
      hashCol: String = "dhash", maxDist: Int = 3): DataFrame = {
    val banded = hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("bkey",
        expr("shiftright(h, band * 16)").bitwiseAND(lit(0xffffL)))
    banded.select(col("id").as("id_a"), col("h").as("h_a"),
        col("band"), col("bkey"))
      .join(banded.select(col("id").as("id_b"), col("h").as("h_b"),
        col("band"), col("bkey")), Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Resized media record (decode → scale stub). */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
      content: Array[Byte])

  /** STUB resize: production would decode, scale, re-encode; here the
    * payload is truncated proportionally so batching/schema stay real.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, content) =>
          val (w, h, _) = decodeDims(content)
          val sw = math.min(w, maxW); val sh = math.min(h, maxH)
          val keep = math.max(1,
            (content.length.toLong * sw * sh / (w.toLong * h)).toInt)
          ResizedMedia(id, sw, sh, content.take(keep))
        }
      }
  }

  /** One sampled frame of a (stub) video payload. */
  case class Frame(media_id: Long, frame_idx: Int, offset: Int,
      frame: Array[Byte])

  /** STUB frame sampling: every `stride`-th slice of the payload stands in
    * for a decoded frame — the row-explosion shape (one media row → many
    * frame rows) and partition batching are the real contract.
    */
  def sampleFrames(media: DataFrame, stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        val frameSize = math.max(1, stride)
        (0 until content.length by frameSize).zipWithIndex.map {
          case (off, idx) =>
            Frame(id, idx, off,
              content.slice(off, math.min(off + frameSize, content.length)))
        }
      }
  }

  val queries: Map[String, Q] = Map(
    // L5: binary payload + metadata struct; hashes/lengths oracle-checked
    // (md5 of a utf-8 string == md5 of its bytes in both engines).
    "q_multimodal_meta" -> ((s, dir) => {
      mediaTable(s, dir).select(
        col("media_id"),
        col("meta.mime").as("mime"),
        col("meta.byte_len").as("byte_len"),
        md5(col("content")).as("payload_md5"))
    }),

    // L5b (no oracle — stubbed decode; schema + determinism checked in
    // MultimodalSpec): partition-batched feature extraction.
    "q_multimodal_features" -> ((s, dir) =>
      extractFeatures(mediaTable(s, dir)).toDF()),

    // L5c (no oracle): frame sampling — media row → frame rows with exact
    // per-frame byte accounting (checked rows-only + in PipelineSpec).
    "q_multimodal_frames" -> ((s, dir) =>
      sampleFrames(mediaTable(s, dir), 64).toDF()
        .select(col("media_id"), col("frame_idx"), col("offset"),
          length(col("frame")).as("frame_bytes")))
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
