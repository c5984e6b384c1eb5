package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Native Catalyst expressions for the embedding hot path (SURVEY §2.8 /
  * the build brief's preference order: custom `Expression` with
  * `doGenCode` over UDFs).
  *
  * The composed-builtin formulation `aggregate(zip_with(x, y, *), 0, +)`
  * allocates an intermediate array per row and walks two lambda closures;
  * at 100 TB of embedding pairs (ANN verify joins, cosine near-dup
  * scoring) that is the inner loop of the whole job. These expressions
  * generate a single fused primitive loop with zero allocation and stay
  * inside whole-stage codegen.
  *
  * Null semantics match the builtin formulation exactly: NULL result when
  * either input is NULL, the lengths differ (zip_with pads with null), or
  * any element is NULL. */
abstract class ArrayPairFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Element types are read DIRECTLY (double/float/long/int/short/byte),
    * never via an up-front `cast(array<double>)`: the cast materializes a
    * fresh double array per row per side — two allocations per pair on
    * the hottest loops in the engine (float32 embedding cosine, int8
    * quantized sweeps). Widening to double inside the loop is exact for
    * every supported type, so results are bit-identical to the old
    * cast-first form. */
  protected final def isNumericElem(t: DataType): Boolean = t match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if isNumericElem(a) && isNumericElem(b) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two numeric arrays, got $l and $r")
  }
  @transient protected lazy val leftElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient protected lazy val rightElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType
  protected final def elemAt(a: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
  /** java source for reading element `i` of `a` (typed accessor widened
    * to double — stays inside whole-stage codegen, zero allocation). */
  protected final def elemCode(a: String, t: DataType, i: String): String = t match {
    case DoubleType => s"$a.getDouble($i)"
    case FloatType => s"((double) $a.getFloat($i))"
    case LongType => s"((double) $a.getLong($i))"
    case IntegerType => s"((double) $a.getInt($i))"
    case ShortType => s"((double) $a.getShort($i))"
    case ByteType => s"((double) $a.getByte($i))"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  /** (x, y, n) -> result, called only with equal-length all-non-null arrays. */
  protected def fold(x: ArrayData, y: ArrayData, n: Int): Double
  /** java source: given arrays `x`,`y` and length `n`, set `result`. */
  protected def foldCode(ctx: CodegenContext, x: String, y: String, n: String,
                         result: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    fold(x, y, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ok = ctx.freshName("ok")
      val result = ctx.freshName("result")
      s"""
         |int $n = $x.numElements();
         |boolean $ok = ($y.numElements() == $n);
         |if ($ok) {
         |  for (int $i = 0; $i < $n && $ok; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) $ok = false;
         |  }
         |}
         |if ($ok) {
         |  double $result = 0.0;
         |  ${foldCode(ctx, x, y, n, result)}
         |  ${ev.value} = $result;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
}

case class ArrayDotProduct(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_dot"

  protected def fold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += elemAt(x, leftElem, i) * elemAt(y, rightElem, i); i += 1 }
    s
  }

  protected def foldCode(ctx: CodegenContext, x: String, y: String, n: String,
                         result: String): String = {
    val i = ctx.freshName("i")
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  $result += ${elemCode(x, leftElem, i)} * ${elemCode(y, rightElem, i)};
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity x.y / (|x| |y|) as one fused loop (three accumulators,
  * one pass, no intermediate arrays). Returns 0 for zero-norm inputs. */
case class ArrayCosineSimilarity(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_cosine"

  protected def fold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = elemAt(x, leftElem, i); val yi = elemAt(y, rightElem, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom > 0) dot / denom else 0.0
  }

  protected def foldCode(ctx: CodegenContext, x: String, y: String, n: String,
                         result: String): String = {
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val denom = ctx.freshName("denom")
    s"""
       |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $xi = ${elemCode(x, leftElem, i)};
       |  double $yi = ${elemCode(y, rightElem, i)};
       |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
       |}
       |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
       |$result = $denom > 0.0 ? $dot / $denom : 0.0;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayNumeric {
  private def expr(c: Column): Expression = GraftExpressionBridge.toExpression(c)

  /** x . y over two numeric-array columns (native codegen; double, float,
    * long, int, short and tinyint elements are read DIRECTLY — no
    * allocating cast-to-double pass, values bit-identical to one). */
  def dot(x: Column, y: Column): Column =
    GraftExpressionBridge.toColumn(ArrayDotProduct(expr(x), expr(y)))

  /** cosine(x, y) over two numeric-array columns (native codegen; same
    * direct typed-element reads as [[dot]]). */
  def cosine(x: Column, y: Column): Column =
    GraftExpressionBridge.toColumn(ArrayCosineSimilarity(expr(x), expr(y)))


  /** 64-bit simhash of a pre-hashed token array (native codegen). */
  def simhash64(hashes: Column): Column =
    GraftExpressionBridge.toColumn(SimhashFromHashes(
      expr(hashes.cast("array<bigint>"))))

  /** All sign-plane LSH bucket ids of an embedding (native codegen). */
  def signPlaneBuckets(v: Column, dim: Int, nPlanes: Int, numTables: Int,
                       seed: Int): Column =
    GraftExpressionBridge.toColumn(SignPlaneBuckets(
      expr(v.cast("array<double>")), dim, nPlanes, numTables, seed))

  /** PQ asymmetric-distance score: Σ_j lut[j*ksub + codes[j]] over an
    * ARRAY<INT> code column and a flattened [m][ksub] ARRAY<DOUBLE> lookup
    * table (native codegen; the inner loop of a product-quantized corpus
    * scan — m table lookups per row instead of d multiplies). */
  def pqAdcScore(codes: Column, lut: Column): Column =
    GraftExpressionBridge.toColumn(PqAdcScore(
      expr(codes.cast("array<int>")), expr(lut.cast("array<double>"))))

  /** x / max(||x||, 1e-150) over an ARRAY<DOUBLE> column (native codegen).
    * Value-identical to the old `transform(v, x => x / sqrt(greatest(
    * dot(v, v), 1e-300)))` HOF (same left-to-right squared-sum order),
    * which Spark evaluated interpreted per element on the IVF/SemDeDup
    * assignment hot paths. */
  def unit(x: Column): Column =
    GraftExpressionBridge.toColumn(ArrayUnitNormalize(
      expr(x.cast("array<double>"))))
}

/** Unit-normalization kernel — kept on an object so generated code can
  * call the static forwarder. */
object ArrayUnitOps {
  def unit(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      xs(i) = x
      ss += x * x
      i += 1
    }
    val inv = math.sqrt(if (ss < 1e-300) 1e-300 else ss)
    i = 0
    while (i < n) { xs(i) = xs(i) / inv; i += 1 }
    new GenericArrayData(xs)
  }
}

case class ArrayUnitNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "array_unit"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ArrayUnitOps.unit(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayUnitOps.unit($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `numTables` sign-plane LSH bucket ids of a DOUBLE[] embedding in one
  * fused codegen loop (graft.similarity sign-random-projection family).
  * The +-1 plane pattern is precomputed from (seed, plane, dim) murmur
  * signs and attached as a codegen reference object; accumulation order is
  * ascending-index, matching both the Scala replay (Similarity.planeSign)
  * and the DuckDB oracle twin (Similarity.bucketSqlExprs) bit-for-bit.
  * Replaces the boxed Seq[Double] UDF on the q28 hot path. */
case class SignPlaneBuckets(child: Expression, dim: Int, nPlanes: Int,
                            numTables: Int, seed: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def prettyName: String = "sign_plane_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** flat [table][plane][dim] sign pattern; true = +1 */
  @transient private lazy val signs: Array[Boolean] = {
    val out = new Array[Boolean](numTables * nPlanes * dim)
    var t = 0
    while (t < numTables) {
      var p = 0
      while (p < nPlanes) {
        var i = 0
        while (i < dim) {
          out((t * nPlanes + p) * dim + i) =
            scala.util.hashing.MurmurHash3.productHash((seed + t, p, i)) >= 0
          i += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = math.min(dim, v.numElements())
    var i = 0
    while (i < d) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var s = 0.0
        val off = (t * nPlanes + p) * dim
        i = 0
        while (i < d) { s += (if (signs(off + i)) v.getDouble(i) else -v.getDouble(i)); i += 1 }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsRef = ctx.addReferenceObj("signPlanes", signs, "boolean[]")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      s"""
         |int $d = java.lang.Math.min($dim, $v.numElements());
         |boolean $ok = true;
         |for (int $i = 0; $i < $d && $ok; $i++) {
         |  if ($v.isNullAt($i)) $ok = false;
         |}
         |if ($ok) {
         |  long[] $out = new long[$numTables];
         |  for (int $t = 0; $t < $numTables; $t++) {
         |    long $bucket = 0L;
         |    for (int $p = 0; $p < $nPlanes; $p++) {
         |      double $s = 0.0;
         |      int $off = ($t * $nPlanes + $p) * $dim;
         |      for (int $i = 0; $i < $d; $i++) {
         |        $s += $signsRef[$off + $i] ? $v.getDouble($i) : -$v.getDouble($i);
         |      }
         |      if ($s >= 0.0) $bucket |= (1L << $p);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization ADC (asymmetric distance computation) score:
  * given a row's PQ codes (ARRAY<INT>, one centroid id per subspace) and a
  * query's flattened [m][ksub] lookup table of per-subspace partial dots
  * (ARRAY<DOUBLE>, ksub = lut.length / codes.length), returns
  * Σ_j lut[j*ksub + codes[j]] — the approximate query·row dot product.
  * One fused loop, zero allocation, whole-stage codegen: this is the inner
  * loop of a PQ corpus scan, where the 100 TB win is scanning m-byte codes
  * instead of d-float vectors. NULL on null/ragged input or out-of-range
  * codes (defensive: a corrupt code must not read a wrong LUT slot). */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val ksub = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) return null
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val ok = ctx.freshName("ok")
      s"""
         |int $m = $codes.numElements();
         |boolean $ok = ($m > 0 && $lut.numElements() % $m == 0);
         |if ($ok) {
         |  int $ksub = $lut.numElements() / $m;
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m && $ok; $j++) {
         |    if ($codes.isNullAt($j)) { $ok = false; break; }
         |    int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $ksub) { $ok = false; break; }
         |    $s += $lut.getDouble($j * $ksub + $c);
         |  }
         |  if ($ok) ${ev.value} = $s; else ${ev.isNull} = true;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash signature from a pre-hashed token array: bit j of the
  * result is set iff the majority of token hashes have bit j set
  * (sign of the +-1 bit vote). One fused loop in codegen — replaces the
  * last UDF on the dedup hot path (the xxhash64 token pass was already
  * codegen; now the vote is too). Null tokens are skipped, matching the
  * UDF's Seq[Long] behavior on non-null input; NULL array -> NULL. */
case class SimhashFromHashes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $hs.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8-quantization kernels (static forwarders for generated code).
  * One fused primitive loop each — the HOF formulation (`transform` with
  * the scale aggregate EMBEDDED in the per-element lambda) evaluated the
  * O(d) scale reduction once per element, i.e. O(d²) interpreted lambda
  * calls per vector, and HOFs never enter whole-stage codegen. Element
  * type is read directly via a small type tag (double/float/long/int/
  * short/byte), no cast pass.
  *
  * Rounding is half-away-from-zero (floor(x+0.5) / ceil(x-0.5)), matching
  * Spark `round(x, 0)` up to sub-ulp BigDecimal edge cases; `quantize`
  * and `residual` use the SAME formula, so the certified bound
  * |cos(qa,qb) - cos(va,vb)| <= 2(rho_a + rho_b) holds for exactly the
  * codes this kernel emits (self-consistency is what the bound needs —
  * parity with the HOF `quantizeInt8` is not required and not claimed). */
object QuantOps {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  def kindOf(t: DataType): Int = t match {
    case DoubleType => 0
    case FloatType => 1
    case LongType => 2
    case IntegerType => 3
    case ShortType => 4
    case ByteType => 5
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }
  private def read(a: ArrayData, k: Int, i: Int): Double = k match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }
  private def roundAway(x: Double): Double =
    if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)

  /** array<tinyint> codes: per-vector scale = max(maxabs, 1e-300)/127. */
  def quantize(a: ArrayData, k: Int): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(read(a, k, i)); if (v > mx) mx = v; i += 1
    }
    val scale = math.max(mx, 1e-300) / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = roundAway(read(a, k, i) / scale).toByte
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Certified relative residual rho = |v - s*q| / |v| for the codes
    * [[quantize]] emits; NaN on a zero (or underflowed) norm. */
  def residual(a: ArrayData, k: Int): Double = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(read(a, k, i)); if (v > mx) mx = v; i += 1
    }
    val scale = math.max(mx, 1e-300) / 127.0
    var rnum = 0.0
    var den = 0.0
    i = 0
    while (i < n) {
      val v = read(a, k, i)
      val r = v - scale * roundAway(v / scale)
      rnum += r * r
      den += v * v
      i += 1
    }
    if (den > 0.0) math.sqrt(rnum / den) else Double.NaN
  }
}

/** Fused int8 quantization to ARRAY<TINYINT> (native codegen; see
  * [[QuantOps]]). The storage-true shuffle form: 1 byte/element through
  * every exchange vs 8 for double. */
case class QuantizeInt8Bytes(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_int8"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val kind: Int =
    QuantOps.kindOf(child.dataType.asInstanceOf[ArrayType].elementType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if scala.util.Try(QuantOps.kindOf(t)).isSuccess =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    QuantOps.quantize(input.asInstanceOf[ArrayData], kind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantOps.quantize($c, $kind);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused certified quantization residual (native codegen; see
  * [[QuantOps.residual]]). */
case class QuantResidual(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quant_residual"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  @transient private lazy val kind: Int =
    QuantOps.kindOf(child.dataType.asInstanceOf[ArrayType].elementType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if scala.util.Try(QuantOps.kindOf(t)).isSuccess =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    QuantOps.residual(input.asInstanceOf[ArrayData], kind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantOps.residual($c, $kind);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
