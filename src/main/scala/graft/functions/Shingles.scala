package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local word n-gram enumeration, shared by the shingling call sites
  * (repetition filters, DSIR features, bigram LM).
  *
  * Kept outside the expression so generated code can call it through the
  * static forwarder — one regex split + one StringBuilder pass per row. */
object ShingleOps {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Exactly `split(trim(s), "\\s+")` then n-token windows joined with a
    * single space; fewer than n tokens → empty array (never null). The
    * trim matches Spark's `trim` (ASCII space only, both ends) and the
    * split keeps leading empties for non-space leading whitespace —
    * bit-identical to the old HOF formulation and to DuckDB's
    * `str_split_regex(trim(x), '\s+')` twins. */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = WS.split(s.trim().toString, -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val m = toks.length - n + 1
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Native replacement for the `transform(sequence(...), i ->
  * concat_ws(" ", slice(toks, i+1, n)))` higher-order formulation: Spark
  * evaluates HOF lambdas interpreted (never codegen), allocating a slice
  * array + joined string per position per row — measured 4.4 s just to
  * enumerate ~260k bigrams at sf0.1 (ProfileScoring, round 7). This
  * expression stays inside whole-stage codegen and does the same work in
  * one pass. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleOps.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Char-shingle kernels shared by [[CharShingles]] and [[ShingleXxhashes]]. */
object CharShingleOps {
  import org.apache.spark.unsafe.Platform

  /** Byte offset of each code point start plus the end offset — one walk,
    * so shingle extraction is O(bytes + shingles), not O(chars·bytes)
    * like per-position `substr`. Operates on an OWNED copy of the
    * string's bytes (a scan's UnsafeRow buffer is reused between rows;
    * zero-copy slices into it would corrupt downstream arrays). */
  def ownedBytes(s: UTF8String): Array[Byte] = s.clone().getBytes

  def charOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var m = 0
    var i = 0
    while (i < bytes.length) {
      offs(m) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      m += 1
    }
    offs(m) = bytes.length
    java.util.Arrays.copyOf(offs, m + 1)
  }

  /** All n-char substrings as UTF8String slices of the owned buffer. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = ownedBytes(s)
    val offs = charOffsets(bytes)
    val chars = offs.length - 1
    if (chars < n) new GenericArrayData(Array.empty[Any])
    else {
      val m = chars - n + 1
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        out(i) = UTF8String.fromAddress(bytes,
          Platform.BYTE_ARRAY_OFFSET + offs(i), offs(i + n) - offs(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Single-space tokens (empty runs dropped) -> md5 of each k-token
    * window joined with ' ' -> lowercase-hex prefix. One digest object
    * and one StringBuilder reused across windows. */
  def wordWindowMd5(s: UTF8String, k: Int, prefixLen: Int): ArrayData = {
    val toks0 = s.toString.split(" ", -1)
    var m0 = 0
    var i = 0
    while (i < toks0.length) { if (!toks0(i).isEmpty) m0 += 1; i += 1 }
    if (m0 < k) new GenericArrayData(Array.empty[Any])
    else {
      val toks = new Array[String](m0)
      var j = 0
      i = 0
      while (i < toks0.length) {
        if (!toks0(i).isEmpty) { toks(j) = toks0(i); j += 1 }
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new java.lang.StringBuilder
      val nWin = m0 - k + 1
      val out = new Array[Any](nWin)
      val hexChars = new Array[Char](prefixLen)
      var w = 0
      while (w < nWin) {
        sb.setLength(0)
        var t = 0
        while (t < k) {
          if (t > 0) sb.append(' ')
          sb.append(toks(w + t))
          t += 1
        }
        md.reset()
        val digest = md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0
        while (h < prefixLen) {
          val b = digest(h >> 1)
          hexChars(h) = HEX(if ((h & 1) == 0) (b >> 4) & 0xf else b & 0xf)
          h += 1
        }
        out(w) = UTF8String.fromString(new String(hexChars))
        w += 1
      }
      new GenericArrayData(out)
    }
  }

  /** xxhash64 (seed 42, = the builtin `xxhash64(col)`) of every n-char
    * substring WITHOUT allocating the substrings — byte-window hashing
    * over one owned copy. Bit-identical to
    * `transform(shingles(c, n), s => xxhash64(s))`. */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = ownedBytes(s)
    val offs = charOffsets(bytes)
    val chars = offs.length - 1
    if (chars < n) new GenericArrayData(Array.empty[Long])
    else {
      val m = chars - n + 1
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + offs(i), offs(i + n) - offs(i), 42L)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Native replacement for `transform(sequence(1, length-n+1), i ->
  * substr(i, n))` — same interpreted-HOF cost story as [[WordShingles]],
  * plus per-position substr is O(bytes) each (UTF8 scan from the start). */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def prettyName: String = "char_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharShingleOps.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharShingleOps.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused `transform(shingles(c, n), s => xxhash64(s))` — the dup-span /
  * jaccard-verify hot path — with no per-shingle string allocation. */
case class ShingleXxhashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def prettyName: String = "shingle_xxhashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharShingleOps.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharShingleOps.shingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused k-word rolling-window md5-prefix keys — the exact-substring
  * dedup span table (`transform(idxs, i -> substring(md5(concat_ws(" ",
  * slice(words, i, k))), 1, p))` in HOF form, interpreted per window
  * with a slice + join + digest allocation each). Tokenization matches
  * the call sites exactly: split on the single SPACE character, empty
  * runs dropped. md5 hex is lowercase like the builtin, so DuckDB twins
  * keep reproducing every key. */
case class WordWindowMd5(child: Expression, k: Int, prefixLen: Int)
    extends UnaryExpression {
  require(k >= 1 && prefixLen >= 1 && prefixLen <= 32)
  override def prettyName: String = "word_window_md5"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharShingleOps.wordWindowMd5(input.asInstanceOf[UTF8String], k, prefixLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharShingleOps.wordWindowMd5($c, $k, $prefixLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  /** Word n-grams of a string column (native codegen). */
  def words(c: Column, n: Int): Column =
    GraftExpressionBridge.toColumn(WordShingles(
      GraftExpressionBridge.toExpression(c.cast("string")), n))

  /** Char n-grams of a string column (native codegen). */
  def chars(c: Column, n: Int): Column =
    GraftExpressionBridge.toColumn(CharShingles(
      GraftExpressionBridge.toExpression(c.cast("string")), n))

  /** xxhash64 (seed 42) of every char n-gram (native codegen, fused). */
  def charHashes(c: Column, n: Int): Column =
    GraftExpressionBridge.toColumn(ShingleXxhashes(
      GraftExpressionBridge.toExpression(c.cast("string")), n))

  /** md5-hex-prefix keys of every k-word window (native codegen, fused). */
  def wordWindowMd5(c: Column, k: Int, prefixLen: Int): Column =
    GraftExpressionBridge.toColumn(WordWindowMd5(
      GraftExpressionBridge.toExpression(c.cast("string")), k, prefixLen))
}
