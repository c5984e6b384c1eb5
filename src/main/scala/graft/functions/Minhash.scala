package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole minhash signature of a shingle array in ONE row-local pass —
  * array<long> of k minima of the double-hashing family
  * h_i = h1 XOR rotl(h2, (i mod 63)+1) XOR mix_i (the Dedup.scala
  * schedule), where h1/h2 are Spark-native xxhash64 values of the shingle
  * (seeds chained exactly like the builtin `xxhash64(sh)` and
  * `xxhash64(sh, 1)` calls, via the same XXH64 kernel — signatures are
  * bit-identical to the previous explode+groupBy formulation).
  *
  * Scale shape: replaces exploding every shingle into a row (|docs| x
  * |shingles| rows at 100 TB) and shuffling them through a k-column min
  * hash-aggregate — the signature never leaves the row, so candidate
  * banding needs no aggregation exchange at all. Minima over duplicate
  * shingles are unchanged, so no distinct pass is needed either. */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** per-i odd golden-ratio mix constants (Dedup schedule) */
  @transient private lazy val mixes: Array[Long] =
    Array.tabulate(k)(i => 0x9E3779B97F4A7C15L * (2L * i + 1L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h1 = XXH64.hashUTF8String(s, 42L)
        val h2 = XXH64.hashInt(1, h1)
        var i = 0
        while (i < k) {
          val rot = (i % 63) + 1
          val h = h1 ^ java.lang.Long.rotateLeft(h2, rot) ^ mixes(i)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (n == 0) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mixesRef = ctx.addReferenceObj("minhashMixes", mixes, "long[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val mins = ctx.freshName("mins")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$arr.isNullAt($j)) {
         |      org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($j);
         |      long $h1 = $xxh.hashUTF8String($s, 42L);
         |      long $h2 = $xxh.hashInt(1, $h1);
         |      for (int $i = 0; $i < $k; $i++) {
         |        long $h = $h1 ^ Long.rotateLeft($h2, ($i % 63) + 1) ^ $mixesRef[$i];
         |        if ($h < $mins[$i]) $mins[$i] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Minhash {
  /** Full k-min signature of a shingle array column (native codegen). */
  def signature(shingles: Column, k: Int): Column =
    GraftExpressionBridge.toColumn(MinhashSignature(
      GraftExpressionBridge.toExpression(shingles.cast("array<string>")), k))
}
