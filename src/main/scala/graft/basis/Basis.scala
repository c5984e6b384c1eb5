package graft.basis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Feature-map observables (reference basis/_base.py:7-76,
  * basis/_monomials.py:9-110, C++ monomials.h).
  *
  * An Observable maps a features ARRAY<DOUBLE> column to another array
  * column — pure codegen expressions, applied map-side before the covariance
  * aggregate (EDMD's basis-space lift). */
trait Observable extends Serializable {
  /** Output width given input width. */
  def outputDim(d: Int): Int
  /** Column expression for the transformed features array. */
  def apply(feat: Column, d: Int): Column
}

/** Identity map (basis/_base.py Identity). */
object Identity extends Observable {
  def outputDim(d: Int): Int = d
  def apply(feat: Column, d: Int): Column = feat
}

/** All monomials of total degree <= p over d variables, lexicographic in
  * exponent tuples, constant term first (basis/_monomials.py Monomials). */
case class Monomials(p: Int) extends Observable {

  /** Exponent tuples (e_0..e_{d-1}) with sum <= p, sorted by total degree
    * then lexicographic — deterministic and oracle-reproducible. */
  def exponents(d: Int): Seq[Seq[Int]] = {
    def tuples(dim: Int, budget: Int): Seq[List[Int]] =
      if (dim == 0) Seq(Nil)
      else (0 to budget).flatMap(e => tuples(dim - 1, budget - e).map(e :: _))
    tuples(d, p).sortBy(t => (t.sum, t.mkString))
  }

  def outputDim(d: Int): Int = exponents(d).length

  def apply(feat: Column, d: Int): Column = {
    val terms = exponents(d).map { exps =>
      val factors = exps.zipWithIndex.flatMap { case (e, i) =>
        Seq.fill(e)(feat.getItem(i))
      }
      if (factors.isEmpty) lit(1.0) else factors.reduce(_ * _)
    }
    array(terms: _*)
  }
}

/** Function composition f(g(x)) (basis/_base.py Concatenation). */
case class Concatenation(f: Observable, g: Observable) extends Observable {
  def outputDim(d: Int): Int = f.outputDim(g.outputDim(d))
  def apply(feat: Column, d: Int): Column = f(g(feat, d), g.outputDim(d))
}
