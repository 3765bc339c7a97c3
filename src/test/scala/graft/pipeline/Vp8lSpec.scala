package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the pure-JVM VP8L (WebP-lossless) decoder.
  *
  * No WebP encoder exists in this container (no libwebp, no ImageIO plugin),
  * so fixtures are produced by a minimal spec-following ENCODER written
  * here, independently of the decoder's code paths: LSB-first bit packing,
  * simple 2-symbol codes, normal (code-length-coded) canonical codes, the
  * color cache hash, LZ77 length/distance prefix values, and forward
  * transforms. A roundtrip therefore checks the decoder against the
  * bitstream spec as written twice — it cannot certify against libwebp
  * itself (acknowledged limitation of the zero-egress environment), but any
  * disagreement between the two independent readings fails loudly.
  */
class Vp8lSpec extends AnyFunSuite {

  // md5 of the decoded 256-byte alpha plane of webp/python.webp — pinned at
  // fixture introduction (see the external-encoder test for provenance)
  private val PYTHON_WEBP_ALPHA_MD5 = "fa1667e19ae1b259be670911674006a6"

  // ---- minimal VP8L encoder ----------------------------------------------

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << nbits
      nbits += 1
      if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
    }
    def writeBits(v: Int, n: Int): Unit =
      (0 until n).foreach(i => writeBit((v >> i) & 1))
    def bytes: Array[Byte] = {
      val tail = if (nbits > 0) Array(cur.toByte) else Array.empty[Byte]
      buf.toArray ++ tail
    }
  }

  /** Canonical code over symbols all sharing the same length L (the padded
    * power-of-two scheme): symbol -> (code, L), codes assigned in symbol
    * order (canonical order for uniform lengths).
    */
  private final case class Uniform(syms: Seq[Int], alphabet: Int) {
    val n: Int = math.max(2, Integer.highestOneBit(syms.size * 2 - 1))
    val len: Int = Integer.numberOfTrailingZeros(n)
    // pad with unused high symbols to make the code Kraft-complete
    val all: Seq[Int] = {
      val pad = (alphabet - 1 to 0 by -1).iterator
        .filterNot(syms.contains).take(n - syms.size).toSeq.sorted
      (syms ++ pad).sorted
    }
    require(all.size == n && all.last < alphabet, s"alphabet too small: $this")
    private val codeOf = all.zipWithIndex.toMap
    def emit(bw: BitWriter, sym: Int): Unit = {
      val c = codeOf(sym)
      (len - 1 to 0 by -1).foreach(i => bw.writeBit((c >> i) & 1))
    }
    /** Normal-form serialization of this code's length table. */
    def writeCode(bw: BitWriter): Unit = {
      bw.writeBit(0) // normal
      // cl alphabet uses symbols {0, len}: 1-bit lengths each
      val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
        12, 13, 14, 15)
      val need = math.max(order.indexOf(0), order.indexOf(len)) + 1
      bw.writeBits(need - 4, 4)
      (0 until need).foreach { i =>
        bw.writeBits(if (order(i) == 0 || order(i) == len) 1 else 0, 3)
      }
      bw.writeBit(0) // no max_symbol cap: one cl symbol per alphabet entry
      // cl canonical: 0 -> '0', len -> '1'
      (0 until alphabet).foreach(s => bw.writeBit(if (codeOf.contains(s)) 1 else 0))
    }
  }

  /** Simple-form code: 1 or 2 symbols, emitted with the 8-bit symbol field. */
  private final case class Simple(syms: Seq[Int]) {
    require(syms.nonEmpty && syms.size <= 2 && syms.forall(_ < 256))
    def writeCode(bw: BitWriter): Unit = {
      bw.writeBit(1)
      bw.writeBits(syms.size - 1, 1)
      bw.writeBit(1) // first symbol as 8 bits
      bw.writeBits(syms(0), 8)
      if (syms.size == 2) bw.writeBits(syms(1), 8)
    }
    def emit(bw: BitWriter, sym: Int): Unit =
      if (syms.size == 2) bw.writeBit(if (sym == syms.max) 1 else 0)
    // 1-symbol codes cost 0 bits; canonical 2-symbol: smaller sym -> '0'
  }

  private def header(bw: BitWriter, w: Int, h: Int): Unit = {
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBit(0) // alpha hint
    bw.writeBits(0, 3) // version
  }

  private def riff(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def u32(v: Int): Unit =
      (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    val padded = payload.length + (payload.length & 1)
    tag("RIFF"); u32(4 + 8 + padded); tag("WEBP")
    tag("VP8L"); u32(payload.length); out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def cacheIdx(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private def argb(a: Int, r: Int, g: Int, b: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  // ---- tests --------------------------------------------------------------

  test("vp8l: literals + LZ77 backref + color-cache hits roundtrip (normal green code)") {
    val A = argb(255, 10, 20, 30)
    val B = argb(255, 40, 50, 60)
    val cacheBits = 4
    assert(cacheIdx(A, cacheBits) != cacheIdx(B, cacheBits),
      "fixture colors must not collide in the cache")
    // 4x3: row0/row1 = ABAB ABAB via 2 literals + one (len 6, dist 2)
    // backref; row2 = ABAB via 4 cache hits
    val w = 4; val h = 3
    val expect = Array.tabulate(w * h)(i => if (i % 2 == 0) A else B)
    val cacheSize = 1 << cacheBits
    val green = Uniform(
      Seq(20, 50, 256 + 4, 256 + 24 + cacheIdx(A, cacheBits),
        256 + 24 + cacheIdx(B, cacheBits)),
      256 + 24 + cacheSize)
    val red = Simple(Seq(10, 40))
    val blue = Simple(Seq(30, 60))
    val alpha = Simple(Seq(255))
    val dist = Simple(Seq(13)) // prefix code 13 + 5 extra bits covers 97..128
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBit(0) // no transforms
    bw.writeBit(1); bw.writeBits(cacheBits, 4) // color cache
    bw.writeBit(0) // no meta-prefix image
    green.writeCode(bw); red.writeCode(bw); blue.writeCode(bw)
    alpha.writeCode(bw); dist.writeCode(bw)
    def literal(px: Int): Unit = {
      green.emit(bw, (px >>> 8) & 0xff)
      red.emit(bw, (px >>> 16) & 0xff)
      blue.emit(bw, px & 0xff)
      alpha.emit(bw, (px >>> 24) & 0xff)
    }
    literal(A); literal(B)
    // backref: length 6 = prefix code 4 + extra bit 1; linear distance 2 =
    // distance_code 122 = prefix code 13 + 5 extra bits of 25
    green.emit(bw, 256 + 4); bw.writeBits(1, 1)
    dist.emit(bw, 13); bw.writeBits(25, 5)
    // row2: cache hits (A and B were inserted by the literals/copies)
    (0 until 4).foreach { i =>
      val px = if (i % 2 == 0) A else B
      green.emit(bw, 256 + 24 + cacheIdx(px, cacheBits))
    }
    val got = Vp8l.decode(riff(bw.bytes))
    assert(got.isDefined, "decoder rejected the fixture")
    val (gw, gh, pix) = got.get
    assert((gw, gh) === (w, h))
    assert(pix.toSeq === expect.toSeq)
  }

  test("vp8l: subtract-green transform roundtrip") {
    // 2x2 single color; stored residuals have r-g / b-g in the red/blue
    // channels, inverse must restore the original
    val w = 2; val h = 2
    val px = argb(255, 100, 30, 40)
    val storedR = (100 - 30) & 0xff
    val storedB = (40 - 30) & 0xff
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBit(1); bw.writeBits(2, 2) // transform: SUBTRACT_GREEN
    bw.writeBit(0) // no more transforms
    bw.writeBit(0) // no color cache
    bw.writeBit(0) // no meta
    val green = Simple(Seq(30))
    val red = Simple(Seq(storedR))
    val blue = Simple(Seq(storedB))
    val alpha = Simple(Seq(255))
    val dist = Simple(Seq(0))
    green.writeCode(bw); red.writeCode(bw); blue.writeCode(bw)
    alpha.writeCode(bw); dist.writeCode(bw)
    // all 4 pixels are the same literal; every per-pixel code is 1-symbol
    // (0 bits), so the pixel data is empty on the wire
    val got = Vp8l.decode(riff(bw.bytes))
    assert(got.isDefined)
    val (gw, gh, pix) = got.get
    assert((gw, gh) === (w, h))
    assert(pix.toSeq === Seq.fill(4)(px))
  }

  test("vp8l: 2-color palette with 8-pixels-per-byte packing roundtrip") {
    // 10x1, two colors -> width_bits=3, packed width = ceil(10/8) = 2
    val c0 = argb(255, 5, 6, 7)
    val c1 = argb(255, 200, 150, 100)
    val w = 10; val h = 1
    val idx = Array(0, 1, 1, 0, 1, 0, 0, 1, 0, 1)
    val expect = idx.map(i => if (i == 0) c0 else c1)
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBit(1); bw.writeBits(3, 2) // transform: COLOR_INDEXING
    bw.writeBits(2 - 1, 8) // palette size 2
    // palette as a 2x1 entropy-coded image of component deltas (sub-images
    // carry NO meta-prefix bit — only the main ARGB image does)
    locally {
      bw.writeBit(0) // no color cache
      val d0 = c0 // first delta from 0
      val d1 = { // c1 - c0 per channel mod 256
        def sub(x: Int, y: Int, sh: Int) =
          ((((x >>> sh) & 0xff) - ((y >>> sh) & 0xff)) & 0xff) << sh
        sub(c1, c0, 24) | sub(c1, c0, 16) | sub(c1, c0, 8) | sub(c1, c0, 0)
      }
      val g = Simple(Seq((d0 >>> 8) & 0xff, (d1 >>> 8) & 0xff))
      val r = Simple(Seq((d0 >>> 16) & 0xff, (d1 >>> 16) & 0xff))
      val b = Simple(Seq(d0 & 0xff, d1 & 0xff))
      val a = Simple(Seq((d0 >>> 24) & 0xff, (d1 >>> 24) & 0xff))
      val di = Simple(Seq(0))
      g.writeCode(bw); r.writeCode(bw); b.writeCode(bw); a.writeCode(bw)
      di.writeCode(bw)
      Seq(d0, d1).foreach { d =>
        g.emit(bw, (d >>> 8) & 0xff); r.emit(bw, (d >>> 16) & 0xff)
        b.emit(bw, d & 0xff); a.emit(bw, (d >>> 24) & 0xff)
      }
    }
    bw.writeBit(0) // no more transforms
    // packed main image: 2x1, green bytes carry 8 indexes each (LSB-first)
    val packed0 = idx.take(8).zipWithIndex.map { case (v, i) => v << i }.sum
    val packed1 = idx.drop(8).zipWithIndex.map { case (v, i) => v << i }.sum
    bw.writeBit(0) // no color cache
    bw.writeBit(0) // no meta
    val g = Simple(Seq(packed0, packed1))
    val zero = Simple(Seq(0))
    g.writeCode(bw); zero.writeCode(bw); zero.writeCode(bw)
    zero.writeCode(bw); zero.writeCode(bw)
    g.emit(bw, packed0); g.emit(bw, packed1)
    val got = Vp8l.decode(riff(bw.bytes))
    assert(got.isDefined)
    val (gw, gh, pix) = got.get
    assert((gw, gh) === (w, h))
    assert(pix.toSeq === expect.toSeq)
  }

  test("vp8l: predictor transform (Top mode) roundtrip") {
    // 3x3 gradient; one 4-px block (size_bits=2) covering the image with
    // mode 2 (Top). Encoder runs the forward transform in decode order:
    // (0,0) predicts opaque black, row 0 predicts Left, column 0 predicts
    // Top, interior predicts Top (the block mode).
    val w = 3; val h = 3
    val img = Array.tabulate(h, w)((y, x) =>
      argb(255, 10 * (y + 1), 20 + 3 * x + y, 7 * x + 2 * y)).flatten
    def sub(p: Int, q: Int): Int = {
      var r = 0
      var i = 0
      while (i < 4) {
        val sh = i * 8
        r |= ((((p >>> sh) & 0xff) - ((q >>> sh) & 0xff)) & 0xff) << sh
        i += 1
      }
      r
    }
    val resid = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = y * w + x
      val pred =
        if (x == 0 && y == 0) 0xff000000
        else if (y == 0) img(i - 1)
        else if (x == 0) img(i - w)
        else img(i - w) // mode 2: Top
      resid(i) = sub(img(i), pred)
    }
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBit(1); bw.writeBits(0, 2) // transform: PREDICTOR
    bw.writeBits(0, 3) // size_bits = 2 -> 4-px blocks -> 1x1 block image
    locally { // block image: single pixel, mode 2 in the green channel
      bw.writeBit(0) // no color cache (sub-images have no meta bit)
      val g = Simple(Seq(2))
      val zero = Simple(Seq(0))
      g.writeCode(bw); zero.writeCode(bw); zero.writeCode(bw)
      zero.writeCode(bw); zero.writeCode(bw)
      // single-symbol codes: the pixel costs 0 bits
    }
    bw.writeBit(0) // no more transforms
    bw.writeBit(0) // no color cache
    bw.writeBit(0) // no meta
    def used(sh: Int) = resid.map(p => (p >>> sh) & 0xff).distinct.toSeq.sorted
    val g = Uniform(used(8), 256 + 24)
    val r = Uniform(used(16), 256)
    val b = Uniform(used(0), 256)
    val a = Simple(used(24).map(identity))
    val di = Simple(Seq(0))
    g.writeCode(bw); r.writeCode(bw); b.writeCode(bw); a.writeCode(bw)
    di.writeCode(bw)
    resid.foreach { p =>
      g.emit(bw, (p >>> 8) & 0xff)
      r.emit(bw, (p >>> 16) & 0xff)
      b.emit(bw, p & 0xff)
      a.emit(bw, (p >>> 24) & 0xff)
    }
    val got = Vp8l.decode(riff(bw.bytes))
    assert(got.isDefined)
    val (gw, gh, pix) = got.get
    assert((gw, gh) === (w, h))
    assert(pix.toSeq === img.toSeq)
  }

  test("vp8l: Multimodal.pixelStats and webpDims route WebP through the real decoder") {
    // 1x3 row of three literal colors, no transforms, simple codes
    val w = 3; val h = 1
    val px = Seq(argb(255, 10, 20, 30), argb(255, 10, 200, 30),
      argb(255, 40, 20, 90))
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBit(0) // no transforms
    bw.writeBit(0) // no color cache
    bw.writeBit(0) // no meta
    val g = Simple(Seq(20, 200))
    val r = Simple(Seq(10, 40))
    val b = Simple(Seq(30, 90))
    val a = Simple(Seq(255))
    val di = Simple(Seq(0))
    g.writeCode(bw); r.writeCode(bw); b.writeCode(bw); a.writeCode(bw)
    di.writeCode(bw)
    px.foreach { p =>
      g.emit(bw, (p >>> 8) & 0xff); r.emit(bw, (p >>> 16) & 0xff)
      b.emit(bw, p & 0xff); a.emit(bw, (p >>> 24) & 0xff)
    }
    val bytes = riff(bw.bytes)
    assert(Multimodal.webpDims(bytes) === Some((3, 1, 3)))
    val st = Multimodal.pixelStats(bytes)
    assert(st.isDefined, "pixelStats must decode WebP-lossless")
    val (gw, gh, means) = st.get
    assert((gw, gh) === (3, 1))
    assert(means(0) === (10 + 10 + 40) / 3.0)
    assert(means(1) === (20 + 200 + 20) / 3.0)
    assert(means(2) === (30 + 30 + 90) / 3.0)
  }

  test("vp8l: decodes a real libwebp-encoded alpha stream (external-encoder fixture)") {
    // src/test/resources/webp/python.webp is the Python distribution's test
    // image (CPython Lib/test/imghdrdata/python.webp, PSF-licensed): a
    // VP8X container whose ALPH chunk is compression-method-1 — i.e. a
    // genuine libwebp-PRODUCED headerless VP8L bitstream. This is the one
    // independent-encoder check available in this container (no libwebp /
    // Pillow exists here): every other Vp8l golden is round-tripped against
    // the spec-following encoder written in this file, which certifies the
    // spec as written twice; THIS stream was written by the reference
    // implementation itself.
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/webp/python.webp").toURI))
    val got = Vp8l.decodeAlpha(bytes)
    assert(got.isDefined, "ALPH method-1 stream must decode")
    val (w, h, a) = got.get
    assert((w, h) === (16, 16))
    assert(a.length === 256)
    // the 16x16 Python-logo mask: anti-aliased shape on transparent ground
    assert(a.forall(v => v >= 0 && v <= 255))
    assert(a.contains(0) && a.contains(255),
      "logo mask must have transparent and opaque pixels")
    assert(a.distinct.length > 2, "anti-aliased mask is not binary")
    // regression pin of the full plane (self-golden at fixture
    // introduction; a decoder change that alters any pixel fails here)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(a.map(_.toByte)).map("%02x".format(_)).mkString
    assert(md5 === PYTHON_WEBP_ALPHA_MD5, s"alpha plane drifted: $md5")
  }

  test("vp8l: all four alpha pre-filters invert exactly (raw ALPH round trip)") {
    val (w, h) = (4, 3)
    val plane = Array(10, 250, 0, 128, 7, 255, 3, 90, 200, 1, 64, 32)
    // independent spec-side filtering: residue = value - pred (mod 256),
    // pred per the edge rules (0,0)->0, first row->left, first col->top
    def pred(a: Array[Int], x: Int, y: Int, f: Int): Int =
      if (x == 0 && y == 0) 0
      else if (y == 0) a(y * w + x - 1)
      else if (x == 0) a((y - 1) * w + x)
      else f match {
        case 1 => a(y * w + x - 1)
        case 2 => a((y - 1) * w + x)
        case _ =>
          val g = a(y * w + x - 1) + a((y - 1) * w + x) - a((y - 1) * w + x - 1)
          if (g < 0) 0 else if (g > 255) 255 else g
      }
    for (f <- 0 to 3) {
      val res = Array.tabulate(w * h)(i =>
        (plane(i) - (if (f == 0) 0 else pred(plane, i % w, i / w, f))) & 0xff)
      val out = new java.io.ByteArrayOutputStream()
      def u24(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
      out.write("RIFF".getBytes("ISO-8859-1")); out.write(Array[Byte](0, 0, 0, 0))
      out.write("WEBP".getBytes("ISO-8859-1"))
      out.write("VP8X".getBytes("ISO-8859-1")); out.write(Array[Byte](10, 0, 0, 0))
      out.write(Array[Byte](0x10, 0, 0, 0)); out.write(u24(w - 1)); out.write(u24(h - 1))
      val alphSize = 1 + w * h
      out.write("ALPH".getBytes("ISO-8859-1"))
      out.write(Array[Byte]((alphSize & 0xff).toByte, 0, 0, 0))
      out.write((f << 2) | 0) // method 0 (raw), filter f
      res.foreach(v => out.write(v))
      if (alphSize % 2 == 1) out.write(0)
      val got = Vp8l.decodeAlpha(out.toByteArray)
      assert(got.isDefined, s"filter $f must decode")
      assert(got.get._3.toSeq === plane.toSeq, s"filter $f round trip")
    }
  }

  test("vp8l: predictor transform (Select mode 11) tie goes to TOP") {
    // 2x2 image whose bottom-right pixel hits the RFC 9649 Select()
    // tie-break: pL = Manhattan(T,TL) = pT = Manhattan(L,TL) = 5 with
    // L != T, so the spec (and libwebp) predict TOP. The residual is
    // encoded against T by the forward transform below; a decoder using
    // the inverted `pl <= pt -> L` rule reconstructs a wrong pixel and
    // fails the roundtrip.
    val w = 2; val h = 2
    val tlv = argb(255, 100, 100, 100)
    val tv = argb(255, 100, 105, 100) // |T-TL| = 5
    val lv = argb(255, 105, 100, 100) // |L-TL| = 5 -> tie, L != T
    val xv = argb(255, 101, 102, 103)
    val img = Array(tlv, tv, lv, xv)
    def sub(p: Int, q: Int): Int = {
      var r = 0
      var i = 0
      while (i < 4) {
        val sh = i * 8
        r |= ((((p >>> sh) & 0xff) - ((q >>> sh) & 0xff)) & 0xff) << sh
        i += 1
      }
      r
    }
    val resid = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = y * w + x
      val pred =
        if (x == 0 && y == 0) 0xff000000
        else if (y == 0) img(i - 1)
        else if (x == 0) img(i - w)
        else tv // mode 11 Select: strict pL < pT picks L; tie here -> TOP
      resid(i) = sub(img(i), pred)
    }
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBit(1); bw.writeBits(0, 2) // transform: PREDICTOR
    bw.writeBits(0, 3) // size_bits = 2 -> 4-px blocks -> 1x1 block image
    locally { // block image: single pixel, mode 11 in the green channel
      bw.writeBit(0)
      val g = Simple(Seq(11))
      val zero = Simple(Seq(0))
      g.writeCode(bw); zero.writeCode(bw); zero.writeCode(bw)
      zero.writeCode(bw); zero.writeCode(bw)
    }
    bw.writeBit(0) // no more transforms
    bw.writeBit(0) // no color cache
    bw.writeBit(0) // no meta
    def used(sh: Int) = resid.map(p => (p >>> sh) & 0xff).distinct.toSeq.sorted
    val g = Uniform(used(8), 256 + 24)
    val r = Uniform(used(16), 256)
    val b = Uniform(used(0), 256)
    val a = Simple(used(24).map(identity))
    val di = Simple(Seq(0))
    g.writeCode(bw); r.writeCode(bw); b.writeCode(bw); a.writeCode(bw)
    di.writeCode(bw)
    resid.foreach { p =>
      g.emit(bw, (p >>> 8) & 0xff)
      r.emit(bw, (p >>> 16) & 0xff)
      b.emit(bw, p & 0xff)
      a.emit(bw, (p >>> 24) & 0xff)
    }
    val got = Vp8l.decode(riff(bw.bytes))
    assert(got.isDefined)
    val (gw, gh, pix) = got.get
    assert((gw, gh) === (w, h))
    assert(pix.toSeq === img.toSeq)
  }

  test("vp8l: negative RIFF chunk size returns None instead of looping") {
    // size = -8 (F8 FF FF FF) makes `off += 8 + size + (size & 1)` a no-op
    // advance; both chunk walks must bail out, not hang the executor task.
    def container(withVp8x: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("ISO-8859-1"))
      out.write(Array[Byte](40, 0, 0, 0))
      out.write("WEBP".getBytes("ISO-8859-1"))
      if (withVp8x) {
        out.write("VP8X".getBytes("ISO-8859-1"))
        out.write(Array[Byte](10, 0, 0, 0))
        out.write(new Array[Byte](10))
      }
      out.write("JUNK".getBytes("ISO-8859-1"))
      out.write(Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
      out.write(new Array[Byte](8))
      out.toByteArray
    }
    assert(Vp8l.decode(container(withVp8x = false)).isEmpty)
    assert(Vp8l.decodeAlpha(container(withVp8x = true)).isEmpty)
  }

  test("vp8l: non-webp and lossy payloads fall through to None") {
    assert(Vp8l.decode("not a webp at all".getBytes).isEmpty)
    // RIFF/WEBP container with a (stub) lossy VP8 chunk: still None
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"))
    out.write(Array[Byte](20, 0, 0, 0))
    out.write("WEBP".getBytes("ISO-8859-1"))
    out.write("VP8 ".getBytes("ISO-8859-1"))
    out.write(Array[Byte](4, 0, 0, 0)); out.write(Array[Byte](1, 2, 3, 4))
    assert(Vp8l.decode(out.toByteArray).isEmpty)
  }
}
