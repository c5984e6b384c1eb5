package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import breeze.linalg.{svd, DenseMatrix}

/** Orthogonal Procrustes alignment between two embedding versions
  * (Schönemann 1966): find the rotation R minimizing ||A R − B||_F over
  * orthogonal R, where rows of A and B are the OLD and NEW embedding of
  * the same id — the embedding-migration step when a retrained encoder
  * must serve an existing ANN index / downstream features.
  *
  * R = U Vᵀ from the SVD of the cross-gram M = AᵀB.
  *
  * Scale shape: the only distributed pass is the d×d cross-gram — a
  * treeAggregate of rank-1 outer products (d² doubles of state per task,
  * model-sized at any corpus size); the SVD is a driver-side d×d solve.
  * Applying the alignment is a broadcast matrix map afterwards. */
object Procrustes {

  /** Cross-gram AᵀB over (aCol, bCol) array columns (d×d, driver-side). */
  def crossGram(pairs: DataFrame, aCol: String, bCol: String, d: Int): DenseMatrix[Double] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // typed-encoder extraction (r14): Row.getSeq deserializes every
    // embedding through GenericRow + boxed WrappedArray — the codegen'd
    // tuple encoder hands the hot loop primitive arrays directly
    val rows = pairs.select(col(aCol).cast("array<double>"),
      col(bCol).cast("array<double>")).as[(Array[Double], Array[Double])]
    val m = rows.rdd.treeAggregate(DenseMatrix.zeros[Double](d, d))(
      seqOp = (acc, row) => {
        val a = row._1
        val b = row._2
        var i = 0
        while (i < d) {
          val ai = a(i)
          if (ai != 0.0) {
            var j = 0
            while (j < d) { acc(i, j) += ai * b(j); j += 1 }
          }
          i += 1
        }
        acc
      },
      combOp = (x, y) => { x += y; x })
    m
  }

  /** The orthogonal alignment R (d×d row-major) mapping aCol-space onto
    * bCol-space: argmin_R ||A R − B||_F s.t. RᵀR = I. */
  def align(pairs: DataFrame, aCol: String, bCol: String, d: Int): Array[Array[Double]] = {
    val m = crossGram(pairs, aCol, bCol, d)
    val s = svd(m)
    val r = s.U * s.Vt
    Array.tabulate(d, d)((i, j) => r(i, j))
  }
}
