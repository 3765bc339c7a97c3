package graft.pipeline

/** Pure-JVM WebP-lossless (VP8L) decoder — closes the "no JDK codec for
  * WebP" seam of [[Multimodal.pixelStats]] for the lossless half of the
  * format (the lossy half is a VP8 intra-frame codec — still out of scope,
  * still documented as such in [[Multimodal]]).
  *
  * Implements the public VP8L bitstream: LSB-first bit reading, canonical
  * prefix codes (both "simple" and normal code-length-coded forms), up to
  * 2^16 meta-prefix groups, the 1..11-bit color cache, LZ77 backward
  * references through the 120-entry 2D distance map, and the four
  * transforms (predictor ×14 modes, color, subtract-green, color-indexing
  * incl. sub-byte pixel packing), applied inverse in reverse bitstream
  * order. Returns straight ARGB pixels.
  *
  * Decoding is per-payload scalar code on purpose: it runs inside
  * `mapInPandas`-style batch decode tasks ([[Multimodal.extractFeatures]])
  * where the parallelism is across documents, not within one image.
  */
object Vp8l {

  /** LSB-first bit reader over the VP8L payload. */
  private final class BitReader(data: Array[Byte], private var pos: Int) {
    private var bit = 0
    def readBit(): Int = {
      val b = (data(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  /** Canonical prefix code: symbols sorted by (code length, symbol), codes
    * assigned in increasing order (the deflate/VP8L convention). Decoding
    * walks first-code arithmetic one bit at a time — the first bit read is
    * the MSB of the code.
    */
  private final class Huff(lengths: Array[Int]) {
    private val maxLen = lengths.max
    // count[l] = #symbols with length l; sorted symbols by (len, symbol)
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    private val sorted: Array[Int] = lengths.indices
      .filter(lengths(_) > 0).sortBy(s => (lengths(s), s)).toArray
    require(sorted.nonEmpty, "empty prefix code")
    val singleSymbol: Int = if (sorted.length == 1) sorted(0) else -1

    def decode(br: BitReader): Int = {
      if (singleSymbol >= 0) return singleSymbol // 0-bit code
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= maxLen) {
        code = (code << 1) | br.readBit()
        val c = count(len)
        if (code - first < c) return sorted(index + code - first)
        index += c
        first = (first + c) << 1
        len += 1
      }
      throw new IllegalStateException("invalid prefix code")
    }
  }

  /** One-symbol code (0 bits on the wire). */
  private def singleton(sym: Int, alphabet: Int): Huff = {
    val l = new Array[Int](alphabet)
    // represent as the unique non-zero-length symbol; decode() short-cuts
    l(sym) = 1
    new Huff(l)
  }

  // order in which code-length-code lengths are stored (spec section 6.2.2)
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code over `alphabet` symbols (simple or normal form). */
  private def readCode(br: BitReader, alphabet: Int): Huff = {
    if (br.readBit() == 1) { // simple
      val num = br.readBit() + 1
      val first8 = br.readBit()
      val s0 = if (first8 == 1) br.readBits(8) else br.readBit()
      val lengths = new Array[Int](alphabet)
      if (num == 1) { lengths(s0) = 1; val h = new Huff(lengths); h }
      else {
        val s1 = br.readBits(8)
        lengths(s0) = 1; lengths(s1) = 1
        new Huff(lengths)
      }
    } else { // normal: code-length code, then symbol lengths
      val numCl = br.readBits(4) + 4
      val clLen = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLen(ClOrder(i)) = br.readBits(3); i += 1 }
      val clCode = new Huff(clLen)
      // optional cap on how many length symbols are read
      var maxSymbol =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabet
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var prev = 8 // repeats of "previous" start from 8 per the spec
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.decode(br)
        cl match {
          case c if c < 16 =>
            lengths(sym) = c; sym += 1
            if (c != 0) prev = c
          case 16 =>
            val rep = 3 + br.readBits(2)
            var j = 0
            while (j < rep && sym < alphabet) {
              lengths(sym) = prev; sym += 1; j += 1
            }
          case 17 =>
            sym += 3 + br.readBits(3)
          case 18 =>
            sym += 11 + br.readBits(7)
        }
      }
      new Huff(lengths)
    }
  }

  /** The 5 prefix codes of one meta group. Green alphabet = 256 literals +
    * 24 length codes + color-cache indexes.
    */
  private final case class Group(g: Huff, r: Huff, b: Huff, a: Huff, d: Huff)

  private def readGroup(br: BitReader, cacheSize: Int): Group =
    Group(
      readCode(br, 256 + 24 + cacheSize),
      readCode(br, 256), readCode(br, 256), readCode(br, 256),
      readCode(br, 40))

  /** LZ77 prefix-coded value (lengths and distance codes share the scheme). */
  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.readBits(extra) + 1
    }

  /** 2D neighborhood behind short distance codes (spec section 5.2.2):
    * codes 1..120 map to (dx, dy) close-by pixels; codes > 120 are linear
    * distances − 120.
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 4), (8, 5),
    (4, 8), (-4, 8), (7, 7), (-7, 7), (8, 6), (6, 8), (-6, 8))

  private def planeDist(code: Int, w: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      math.max(1, dy * w + dx)
    }

  private def divRoundUp(a: Int, shift: Int): Int = (a + (1 << shift) - 1) >> shift

  /** Entropy-coded ARGB image of dims (w, h): optional color cache, optional
    * meta-prefix groups (main image only), literals / backrefs / cache hits.
    */
  private def readImageData(br: BitReader, w: Int, h: Int,
      allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    // meta-prefix image: block (x >> bits, y >> bits) -> group index (r<<8|g)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var numGroups = 1
    if (allowMeta && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      val mw = divRoundUp(w, metaBits)
      val mh = divRoundUp(h, metaBits)
      metaImg = readImageData(br, mw, mh, allowMeta = false)
      numGroups = metaImg.map(p => ((p >> 8) & 0xffff)).max + 1
    }
    val groups = Array.fill(numGroups)(readGroup(br, cacheSize))
    val px = new Array[Int](w * h)
    var pos = 0
    def insert(argb: Int): Unit =
      if (cacheSize > 0)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    while (pos < px.length) {
      val grp =
        if (metaImg == null) groups(0)
        else {
          val x = pos % w
          val y = pos / w
          val mp = metaImg(divRoundUp(w, metaBits) * (y >> metaBits) + (x >> metaBits))
          groups((mp >> 8) & 0xffff)
        }
      val s = grp.g.decode(br)
      if (s < 256) {
        val red = grp.r.decode(br)
        val blue = grp.b.decode(br)
        val alpha = grp.a.decode(br)
        val argb = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = argb
        insert(argb)
        pos += 1
      } else if (s < 256 + 24) {
        val len = prefixValue(s - 256, br)
        val dcode = prefixValue(grp.d.decode(br), br)
        val dist = planeDist(dcode, w)
        var j = 0
        while (j < len) {
          px(pos) = px(pos - dist)
          insert(px(pos))
          pos += 1
          j += 1
        }
      } else {
        val argb = cache(s - 256 - 24)
        px(pos) = argb
        // cache hits re-insert (no-op on value, keeps parity with libwebp)
        insert(argb)
        pos += 1
      }
    }
    px
  }

  // ---- transforms ---------------------------------------------------------

  private sealed trait Transform { def xsizeAtRead: Int }
  private final case class Predictor(bits: Int, img: Array[Int],
      xsizeAtRead: Int) extends Transform
  private final case class ColorTx(bits: Int, img: Array[Int],
      xsizeAtRead: Int) extends Transform
  private final case class SubtractGreen(xsizeAtRead: Int) extends Transform
  private final case class Palette(colors: Array[Int], widthBits: Int,
      xsizeAtRead: Int) extends Transform

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2
    var r = 0
    var i = 0
    while (i < 4) {
      val sh = i * 8
      r |= ((((a >>> sh) & 0xff) + ((b >>> sh) & 0xff)) / 2) << sh
      i += 1
    }
    r
  }

  private def addPixels(a: Int, b: Int): Int = {
    var r = 0
    var i = 0
    while (i < 4) {
      val sh = i * 8
      r |= ((((a >>> sh) & 0xff) + ((b >>> sh) & 0xff)) & 0xff) << sh
      i += 1
    }
    r
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // select: pick L or T by gradient proximity to TL
        var pl = 0
        var pt = 0
        var i = 0
        while (i < 4) {
          val sh = i * 8
          val cl = (l >>> sh) & 0xff
          val ct = (t >>> sh) & 0xff
          val ctl = (tl >>> sh) & 0xff
          val p = cl + ct - ctl
          pl += math.abs(p - cl)
          pt += math.abs(p - ct)
          i += 1
        }
        // RFC 9649 §4.4.1 Select(): left wins only on STRICT inequality;
        // ties (pL == pT, possible with L != T since both are Manhattan
        // distances to the same gradient estimate) go to TOP.
        if (pl < pt) l else t
      case 12 => // clamped add-subtract full
        var r = 0
        var i = 0
        while (i < 4) {
          val sh = i * 8
          r |= clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
            ((tl >>> sh) & 0xff)) << sh
          i += 1
        }
        r
      case 13 => // clamped add-subtract half
        var r = 0
        var i = 0
        while (i < 4) {
          val sh = i * 8
          val ave = (((l >>> sh) & 0xff) + ((t >>> sh) & 0xff)) / 2
          r |= clamp255(ave + (ave - ((tl >>> sh) & 0xff)) / 2) << sh
          i += 1
        }
        r
      case _ => throw new IllegalStateException(s"predictor mode $mode")
    }

  private def inversePredictor(px: Array[Int], w: Int, h: Int, bits: Int,
      blocks: Array[Int]): Unit = {
    val bw = divRoundUp(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1) // top row: Left
          else if (x == 0) px(i - w) // left column: Top
          else {
            val mode = (blocks(bw * (y >> bits) + (x >> bits)) >> 8) & 0xff
            // top-right at the right border wraps to the CURRENT row's
            // first (already reconstructed) pixel — the libwebp
            // contiguous-buffer behavior, i - w + 1 covers both cases
            predict(mode, px(i - 1), px(i - w), px(i - w + 1), px(i - w - 1))
          }
        px(i) = addPixels(px(i), pred)
        x += 1
      }
      y += 1
    }
  }

  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def inverseColorTx(px: Array[Int], w: Int, h: Int, bits: Int,
      blocks: Array[Int]): Unit = {
    val bw = divRoundUp(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        // ColorTransformElement channels: g2r rides BLUE, g2b rides GREEN,
        // r2b rides RED (the libwebp/RFC 9649 layout)
        val cx = blocks(bw * (y >> bits) + (x >> bits))
        val g2r = cx & 0xff
        val g2b = (cx >> 8) & 0xff
        val r2b = (cx >> 16) & 0xff
        val p = px(i)
        val g = (p >>> 8) & 0xff
        val r = ((p >>> 16) & 0xff) + ctDelta(g2r, g)
        val b = (((p & 0xff) + ctDelta(g2b, g)) + ctDelta(r2b, r & 0xff)) & 0xff
        px(i) = (p & 0xff00ff00) | ((r & 0xff) << 16) | b
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  private def inversePalette(px: Array[Int], packedW: Int, h: Int, finalW: Int,
      colors: Array[Int], widthBits: Int): Array[Int] = {
    val out = new Array[Int](finalW * h)
    val perByte = 1 << widthBits // pixels packed per coded green byte
    val pixBits = 8 >> widthBits
    val mask = (1 << pixBits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < finalW) {
        val coded = px(y * packedW + (x >> widthBits))
        val sub = x & (perByte - 1)
        val idx = (((coded >>> 8) & 0xff) >> (sub * pixBits)) & mask
        out(y * finalW + x) =
          if (idx < colors.length) colors(idx) else 0x00000000
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a VP8L payload (after the 0x2f signature byte has been checked
    * by the caller, `data(off)` is the signature). Returns (w, h, ARGB).
    */
  private def decodePayload(data: Array[Byte], off: Int): (Int, Int, Array[Int]) = {
    require((data(off) & 0xff) == 0x2f, "bad VP8L signature")
    val br = new BitReader(data, off + 1)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBit() // alpha-used hint
    require(br.readBits(3) == 0, "unsupported VP8L version")
    (w, h, decodeStream(br, w, h))
  }

  /** The headerless part of a VP8L bitstream (transform loop onward) for
    * known dimensions — shared by [[decodePayload]] (which reads the
    * 0x2f + 14+14+1+3-bit header first) and [[decodeAlpha]] (where the
    * container supplies the dimensions and the stream starts directly at
    * the transform-present loop, libwebp's `VP8LDecodeAlphaHeader`
    * contract).
    */
  private def decodeStream(br: BitReader, w: Int, h: Int): Array[Int] = {
    // transforms, in bitstream order; COLOR_INDEXING shrinks the coded width
    var curW = w
    var transforms = List.empty[Transform]
    while (br.readBit() == 1) {
      br.readBits(2) match {
        case 0 =>
          val bits = br.readBits(3) + 2
          val img = readImageData(br, divRoundUp(curW, bits),
            divRoundUp(h, bits), allowMeta = false)
          transforms ::= Predictor(bits, img, curW)
        case 1 =>
          val bits = br.readBits(3) + 2
          val img = readImageData(br, divRoundUp(curW, bits),
            divRoundUp(h, bits), allowMeta = false)
          transforms ::= ColorTx(bits, img, curW)
        case 2 =>
          transforms ::= SubtractGreen(curW)
        case 3 =>
          val n = br.readBits(8) + 1
          val deltas = readImageData(br, n, 1, allowMeta = false)
          // palette entries are delta-coded component-wise left-to-right
          val colors = new Array[Int](n)
          var acc = 0
          var i = 0
          while (i < n) { acc = addPixels(acc, deltas(i)); colors(i) = acc; i += 1 }
          val widthBits =
            if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
          transforms ::= Palette(colors, widthBits, curW)
          curW = divRoundUp(curW, widthBits)
      }
    }
    var px = readImageData(br, curW, h, allowMeta = true)
    // inverse transforms, reverse bitstream order (head of list = last read)
    transforms.foreach {
      case Predictor(bits, img, xs) => inversePredictor(px, xs, h, bits, img)
      case ColorTx(bits, img, xs) => inverseColorTx(px, xs, h, bits, img)
      case SubtractGreen(_) => inverseSubtractGreen(px)
      case Palette(colors, wb, xs) =>
        px = inversePalette(px, curW, h, xs, colors, wb)
        curW = xs
    }
    px
  }

  /** Decode a WebP-lossless file (RIFF container) or a bare VP8L stream.
    * None for anything else (lossy VP8, extended VP8X with lossy payload,
    * non-WebP bytes) — the honest seam [[Multimodal.pixelStats]] falls
    * through.
    */
  def decode(content: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (content.length > 1 && (content(0) & 0xff) == 0x2f)
        return Some(decodePayload(content, 0))
      if (content.length < 20 ||
          new String(content, 0, 4, "ISO-8859-1") != "RIFF" ||
          new String(content, 8, 4, "ISO-8859-1") != "WEBP") return None
      // chunk walk: find VP8L
      var off = 12
      while (off + 8 <= content.length) {
        val tag = new String(content, off, 4, "ISO-8859-1")
        val size = (content(off + 4) & 0xff) | ((content(off + 5) & 0xff) << 8) |
          ((content(off + 6) & 0xff) << 16) | ((content(off + 7) & 0xff) << 24)
        if (tag == "VP8L") return Some(decodePayload(content, off + 8))
        if (size < 0) return None // corrupt 32-bit size would stall the walk
        off += 8 + size + (size & 1) // chunks are 2-byte aligned
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode the alpha plane of an extended (VP8X) WebP whose ALPH chunk is
    * losslessly compressed (compression method 1): the chunk payload after
    * its 1-byte header is a HEADERLESS VP8L bitstream — dimensions come
    * from the VP8X chunk and the alpha values ride the green channel — the
    * one place real libwebp-produced files embed a VP8L stream even when
    * the color payload is lossy VP8, so this is where the decoder can be
    * exercised against an independent encoder. Returns (w, h, alpha
    * bytes). All four filtering modes are inverted post-decode (none /
    * horizontal / vertical / gradient — the PNG-style predictive filters
    * the WebP alpha spec defines, with left/top fall-backs at the edges);
    * raw method-0 alpha is also returned.
    */
  /** Invert the WebP alpha pre-filter in place: stored values are residues
    * against a per-pixel predictor — left (1), top (2), or the gradient
    * clamp(left + top − topleft) (3) — with the first row predicting from
    * the left, the first column from the top, and pixel (0,0) from 0 (the
    * spec's edge rule). Mode 0 is identity.
    */
  private def unfilterAlpha(a: Array[Int], w: Int, h: Int,
      filt: Int): Array[Int] = {
    if (filt == 0) return a
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0
          else if (y == 0) a((y * w) + x - 1) // first row: left
          else if (x == 0) a(((y - 1) * w) + x) // first col: top
          else filt match {
            case 1 => a((y * w) + x - 1)
            case 2 => a(((y - 1) * w) + x)
            case _ =>
              clamp255(a((y * w) + x - 1) + a(((y - 1) * w) + x) -
                a(((y - 1) * w) + x - 1))
          }
        a((y * w) + x) = (a((y * w) + x) + pred) & 0xff
        x += 1
      }
      y += 1
    }
    a
  }

  def decodeAlpha(content: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (content.length < 30 ||
          new String(content, 0, 4, "ISO-8859-1") != "RIFF" ||
          new String(content, 8, 4, "ISO-8859-1") != "WEBP") return None
      def u24(o: Int): Int = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
        ((content(o + 2) & 0xff) << 16)
      var dims: Option[(Int, Int)] = None
      var off = 12
      while (off + 8 <= content.length) {
        val tag = new String(content, off, 4, "ISO-8859-1")
        val size = (content(off + 4) & 0xff) | ((content(off + 5) & 0xff) << 8) |
          ((content(off + 6) & 0xff) << 16) | ((content(off + 7) & 0xff) << 24)
        tag match {
          case "VP8X" =>
            dims = Some((u24(off + 12) + 1, u24(off + 15) + 1))
          case "ALPH" =>
            val (w, h) = dims.getOrElse(return None)
            val hdr = content(off + 8) & 0xff
            val comp = hdr & 3
            val filt = (hdr >> 2) & 3
            val a: Array[Int] =
              if (comp == 0) { // raw: one byte per pixel, row-major
                if (size - 1 < w * h) return None
                Array.tabulate(w * h)(i => content(off + 9 + i) & 0xff)
              } else if (comp == 1) {
                decodeStream(new BitReader(content, off + 9), w, h)
                  .map(p => (p >> 8) & 0xff)
              } else return None
            return Some((w, h, unfilterAlpha(a, w, h, filt)))
          case _ => ()
        }
        if (size < 0) return None // corrupt 32-bit size would stall the walk
        off += 8 + size + (size & 1)
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
}
