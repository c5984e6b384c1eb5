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
}
