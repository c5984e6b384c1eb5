package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Layout

/** Morton (Z-order) interleave: exact bit placement, monotone quad-tree
  * locality, and the data-skipping property q198 ledgers. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton code places bit i of x at 2i and bit i of y at 2i+1") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.mortonInterleave(col("x"), col("y"), 8).as("m"))
    val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    for (((x, y), m) <- rows) assert(m === ref(x, y), s"($x,$y)")
    assert(rows((255L, 255L)) === 65535L)
    assert(rows((1L, 0L)) === 1L)
    assert(rows((0L, 1L)) === 2L)
  }

  test("top-bit cells bound BOTH dimensions; a one-dim sort bounds only its key") {
    // 32x32 grid of (qx, qy) points
    val pts = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("qx", "qy")
      .withColumn("m", Layout.mortonInterleave(col("qx"), col("qy"), 5))
    // 16 cells from the morton top 4 bits: each spans at most a 16x8 window
    val spans = pts.groupBy((col("m") / 64).cast("long").as("cell"))
      .agg((max("qx") - min("qx")).as("sx"), (max("qy") - min("qy")).as("sy"))
      .collect()
    assert(spans.length === 16)
    assert(spans.forall(r => r.getLong(1) <= 15 && r.getLong(2) <= 15))
    // linear layout: cells from qx top bits span ALL of qy
    val lin = pts.groupBy((col("qx") / 2).cast("long").as("cell"))
      .agg((max("qy") - min("qy")).as("sy")).collect()
    assert(lin.forall(_.getLong(1) === 31L))
  }
}
