package graft.functions

import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Native Catalyst expressions for the dedup hot path (SURVEY.md §4.2: the
  * "optional Expression for performance — k-perm hashing in one pass" row).
  *
  * The higher-order-function formulation (`transform(sequence(1,k), p ->
  * array_min(transform(sh, h -> xxhash64(h, p))))`) evaluates one interpreted
  * lambda per (element × permutation) — measured ~21 ms/row at 52 shingles ×
  * 16 perms. These expressions do the same work in a single compiled JVM loop
  * per row (~µs): ~1000× less per-row overhead, which at 100 TB is the
  * difference between one pass and an unrunnable job.
  *
  * Hashing uses Spark's own XXH64, so values are stable across runs, JVMs,
  * and cluster sizes. Used by [[graft.pipeline.Dedup]].
  */
object TextHashes {
  // Spark 4 Column↔Expression bridge (the Column ctor no longer takes exprs).
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Distinct hashed n-word shingles of whitespace-normalized, lowercased
    * text — the one-pass fusion of normText → split → slice/concat → distinct
    * → xxhash64.
    */
  def shingleHashes(c: Column, n: Int = 3): Column =
    column(ShingleHashes(expression(c), n))

  /** Distinct n-word shingle STRINGS (same normalization as
    * [[shingleHashes]]), for cross-engine twins that must digest the shingle
    * text itself (md5 MinHash oracle).
    */
  def shingleStrings(c: Column, n: Int = 3): Column =
    column(ShingleStrings(expression(c), n))

  /** POSITIONAL md5 15-hex-char hashes of every n-word gram of normalized
    * text, in start order and NOT distinct — `posexplode` recovers (start,
    * hash). Where [[shingleStrings]] feeds set-semantics ops (MinHash),
    * this feeds span REMOVAL, which must know every occurrence's position.
    * Cross-engine twin of the oracle's
    * `substr(md5(array_to_string(list_slice(toks, p, p+n-1), ' ')), 1, 15)`.
    */
  def spanMd5Hashes(c: Column, n: Int = 8): Column =
    column(SpanMd5Hashes(expression(c), n))

  /** k-permutation MinHash signature of a hashed-shingle array: sig(p) =
    * min over h of xxhash64(h, seed = p).
    */
  def minHashSig(c: Column, k: Int = 16): Column =
    column(MinHashSig(expression(c), k))

  /** 64-bit SimHash over the words of normalized text: bit i is set iff the
    * majority of word hashes have bit i set.
    */
  def simHash64(c: Column): Column = column(SimHash64(expression(c)))

  /** 60-bit SimHash over md5 word hashes — functionally the cross-engine
    * twin of [[simHash64]]: md5 exists in every engine (the DuckDB oracle
    * reproduces it bit-for-bit), where xxhash64 is Spark-private. 60 bits
    * because 15 hex chars parse into a positive signed long everywhere.
    */
  def simHashMd5(c: Column): Column = column(SimHashMd5(expression(c)))

  /** k-perm MinHash signature over md5(shingle ++ "|" ++ perm) — the
    * cross-engine twin of [[minHashSig]] (same min-over-permuted-hashes
    * semantics, md5 instead of Spark-private xxhash64). Input is the STRING
    * shingle array; 60-bit hashes as in [[simHashMd5]].
    */
  def minHashSigMd5(c: Column, k: Int = 8): Column =
    column(MinHashSigMd5(expression(c), k))

  /** Jaccard similarity of two distinct-long-element arrays in one pass
    * (sort + merge count) — replaces array_intersect + array_union, which
    * each build a hash set per row.
    */
  def jaccardLong(a: Column, b: Column): Column =
    column(JaccardLong(expression(a), expression(b)))

  /** All per-document text statistics in ONE pass over the text: token
    * count, punctuation count (original text), stopword hits, total word
    * chars, distinct unigram and bigram counts. The HOF formulation
    * (split + filter + aggregate + array_distinct + transform) traverses
    * the text 4–6 times with one interpreted lambda per token each —
    * this is the fused replacement, arithmetic identical to the split-based
    * definitions the DuckDB oracle evaluates.
    */
  def textStatsOne(c: Column, stop: Seq[String]): Column =
    column(TextStatsOne(expression(c), stop))

  /** Content-defined chunk hashes of text: a Rabin-Karp rolling hash over a
    * sliding byte window places chunk boundaries where `hash & mask == 0`
    * (expected chunk length 2^avgBits), and each chunk is fingerprinted with
    * XXH64. Unlike fixed-width slicing, inserting a prefix shifts only the
    * chunk containing the edit — the rest of the fingerprints survive, which
    * is what makes chunk-level dedup robust to shifted content.
    */
  def contentChunks(c: Column, avgBits: Int = 6): Column =
    column(ContentChunks(expression(c), avgBits))

  /** Word-level content-defined chunk keys — the cross-engine twin of
    * [[contentChunks]]: a boundary closes the chunk after token i whenever
    * the 60-bit md5 hash of the 2-token window (toks(i-1), toks(i)) is
    * ≡ 0 mod 2^avgBits (expected chunk ≈ 2^avgBits tokens), and each chunk
    * is keyed by the first 15 hex chars of the md5 of its space-joined
    * tokens. Same shift-robustness as the byte-level rolling hash (a
    * boundary depends only on its local window, so an edit re-keys only
    * the chunk containing it), but every ingredient — whitespace split,
    * md5, mod — is reproducible in DuckDB, which makes this variant
    * oracle hash-checkable where XXH64 chunk keys are not.
    */
  def wordChunksMd5(c: Column, avgBits: Int = 3): Column =
    column(WordChunksMd5(expression(c), avgBits))

  /** Element-wise 60-bit md5 hash of a string array (first 15 hex chars as
    * a positive long — the engine-portable bridge). Native one-pass loop;
    * the HOF spelling (`transform` + builtin md5/conv/substring) pays the
    * interpreted-lambda dispatch per element.
    */
  def md5Hash60Array(c: Column): Column = column(Md5Hash60Array(expression(c)))
}

case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override def nullSafeEval(input: Any): Any = {
    // One pass, no per-element lambda dispatch: the HOF formulation
    // (transform + slice + concat_ws + array_distinct) is interpreted per
    // element and measured ~40µs/shingle — 8.6 s for 5k docs at sf0.1.
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(Locale.ROOT).trim
    if (text.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = text.split("\\s+")
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleStrings =
    copy(child = c)
}

/** md5 hex-15 hash of the n-word gram starting at each position (0-based,
  * in order, one per start — no distinct): the positional gram index for
  * span removal. Same normalization as [[ShingleStrings]]; texts shorter
  * than n words yield an empty array.
  */
case class SpanMd5Hashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"span width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "span_md5_hashes"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(Locale.ROOT).trim
    val words = text.split("\\s+")
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hx = new java.lang.StringBuilder(16)
      var b = 0
      while (b < 8) {
        hx.append(Character.forDigit((d(b) >> 4) & 0xf, 16))
        hx.append(Character.forDigit(d(b) & 0xf, 16))
        b += 1
      }
      out(i) = UTF8String.fromString(hx.substring(0, 15))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SpanMd5Hashes =
    copy(child = c)
}

case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(Locale.ROOT).trim
    if (text.isEmpty) return new GenericArrayData(Array.empty[Long])
    val words = text.split("\\s+")
    if (words.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      seen.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"signature size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData].toLongArray()
    val sig = new Array[Long](k)
    var p = 0
    while (p < k) {
      var m = Long.MaxValue
      var i = 0
      while (i < hashes.length) {
        val h = XXH64.hashLong(hashes(i), p + 1)
        if (h < m) m = h
        i += 1
      }
      sig(p) = m; p += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

case class JaccardLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_long"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    if (a.length == 0 && b.length == 0) return java.lang.Double.valueOf(0.0)
    java.util.Arrays.sort(a); java.util.Arrays.sort(b)
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardLong = copy(left = newLeft, right = newRight)
}

case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(Locale.ROOT).trim
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    val words = text.split("\\s+")
    var i = 0
    while (i < words.length) {
      md.reset()
      val digest = md.digest(words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = the high 60 bits of the first 8 digest bytes
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      h = h >>> 4 // drop the 16th hex char: 64 -> 60 bits, always positive
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHashMd5 =
    copy(child = c)
}

case class MinHashSigMd5(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"signature size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_md5"

  private def hash60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    h >>> 4 // first 15 hex chars, always positive
  }

  // One 60-bit constant per permutation, md5-derived so DuckDB reproduces
  // them: c_p = hash60(md5("perm|p")). Computed once per expression
  // instance, not per row.
  private lazy val permConsts: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k)(p => hash60(md, "perm|" + (p + 1)))
  }

  override def nullSafeEval(input: Any): Any = {
    // ONE digest per shingle (round-2 did k×|shingles| digests — 4× the
    // next-slowest query at sf0.1); the k permutations are XOR bijections
    // on the 60-bit space, exact in both engines (no overflow, stays
    // positive).
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hash60(md, arr.getUTF8String(i).toString); i += 1 }
    val sig = new Array[Long](k)
    var p = 0
    while (p < k) {
      val c = permConsts(p)
      var m = Long.MaxValue
      var j = 0
      while (j < n) { val v = hs(j) ^ c; if (v < m) m = v; j += 1 }
      sig(p) = m; p += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigMd5 =
    copy(child = c)
}

case class TextStatsOne(child: Expression, stop: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("distinct_bigrams", IntegerType, nullable = false)))
  override def prettyName: String = "text_stats_one"

  @transient private lazy val stopSet = {
    val s = new java.util.HashSet[String](stop.size * 2)
    stop.foreach(s.add); s
  }

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // punctuation counted over the ORIGINAL text (oracle: regexp keeps
    // only [.,;:!?] then measures length)
    var punct = 0
    var i = 0
    while (i < raw.length) {
      (raw.charAt(i): @annotation.switch) match {
        case '.' | ',' | ';' | ':' | '!' | '?' => punct += 1
        case _ =>
      }
      i += 1
    }
    // tokens of normalized text: lower → trim → split on whitespace runs
    // (identical token list to split(trim(regexp_replace(lower, '\s+', ' ')), ' '))
    val toks = raw.toLowerCase(Locale.ROOT).trim.split("\\s+")
    var stopHits = 0
    var wordChars = 0L
    val seen = new java.util.HashSet[String](toks.length * 2)
    val seenBi = new java.util.HashSet[String](toks.length * 2)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      wordChars += tok.codePointCount(0, tok.length)
      if (stopSet.contains(tok)) stopHits += 1
      seen.add(tok)
      if (t > 0) seenBi.add(toks(t - 1) + " " + tok)
      t += 1
    }
    new GenericInternalRow(Array[Any](toks.length, punct, stopHits,
      wordChars, seen.size, seenBi.size))
  }

  override protected def withNewChildInternal(c: Expression): TextStatsOne =
    copy(child = c)
}

case class ContentChunks(child: Expression, avgBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(avgBits >= 1 && avgBits <= 20, s"avgBits must be in [1,20], got $avgBits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "content_chunks"

  private val Window = 16
  private val mask = (1L << avgBits) - 1
  // polynomial rolling hash base and its Window-th power (for removals)
  private val Base = 257L
  private val basePow: Long = {
    var p = 1L; var i = 0
    while (i < Window) { p *= Base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new mutable.ArrayBuffer[Long]
    var h = 0L
    var chunkStart = 0
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xff)
      if (i >= Window) h -= basePow * (bytes(i - Window) & 0xff)
      // boundary: rolling hash hits the mask AND the chunk is non-trivial
      if (i + 1 - chunkStart >= Window && (h & mask) == 0) {
        out += XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + chunkStart, i + 1 - chunkStart, 42L)
        chunkStart = i + 1
      }
      i += 1
    }
    if (chunkStart < bytes.length) {
      out += XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + chunkStart, bytes.length - chunkStart, 42L)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ContentChunks =
    copy(child = c)
}

case class Md5Hash60Array(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_hash60_array"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // SQL-exposed: a null ELEMENT must not NPE the task — hash it as the
      // empty string (internal callers never produce null elements)
      val bytes = if (s == null) Array.emptyByteArray
        else s.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.reset()
      val d = md.digest(bytes)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = h >>> 4 // first 15 hex chars, always positive
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Md5Hash60Array =
    copy(child = c)
}

case class WordChunksMd5(child: Expression, avgBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(avgBits >= 1 && avgBits <= 20, s"avgBits must be in [1,20], got $avgBits")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks_md5"

  private val mask = (1L << avgBits) - 1

  private def hash60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    h >>> 4 // first 15 hex chars, always positive
  }

  private def hex15(md: java.security.MessageDigest, s: String): UTF8String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(16)
    var j = 0
    while (j < 8) {
      sb.append(Character.forDigit((d(j) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(j) & 0xf, 16))
      j += 1
    }
    UTF8String.fromString(sb.substring(0, 15))
  }

  override def nullSafeEval(input: Any): Any = {
    // Same normalization as SimHashMd5 / the oracle's
    // string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '):
    // empty text yields one empty token (and so one md5("") chunk) in both.
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(Locale.ROOT).trim
    val toks = text.split("\\s+")
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new mutable.ArrayBuffer[Any]
    val sb = new java.lang.StringBuilder
    var start = 0
    def close(endExcl: Int): Unit = {
      sb.setLength(0)
      var j = start
      while (j < endExcl) {
        if (j > start) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      out += hex15(md, sb.toString)
      start = endExcl
    }
    var i = 1
    while (i < toks.length) {
      if ((hash60(md, toks(i - 1) + " " + toks(i)) & mask) == 0L) close(i + 1)
      i += 1
    }
    if (start < toks.length) close(toks.length)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WordChunksMd5 =
    copy(child = c)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(Locale.ROOT).trim
    val votes = new Array[Int](64)
    if (text.nonEmpty) {
      val words = text.split("\\s+")
      var i = 0
      while (i < words.length) {
        val u = UTF8String.fromString(words(i))
        val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
          u.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}
