package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application (the MERGE INTO / CDC-upsert primitive): fold a
  * stream of keyed insert/update/delete records onto a base snapshot,
  * latest-wins per key, delete tombstones drop the key — how a lakehouse
  * table advances from snapshot N to N+1 without rewriting unrelated
  * rows.
  *
  * Scale shape: ONE union + ONE per-key rank window (single hash
  * exchange on the key); nothing is ever joined all-pairs and the base
  * never rewrites except through the keyed fold. */
object Changelog {

  /** Apply `changes` (rows with `opCol` ∈ {'I','U','D'} and a strictly
    * increasing `seqCol` per key — ties broken by seq then op descending
    * for determinism) onto `base` (treated as op='I', seq = baseSeq).
    * Returns the surviving rows with the base's columns. */
  def applyLatestWins(base: DataFrame, changes: DataFrame, keyCol: String,
                      seqCol: String, opCol: String,
                      baseSeq: Long = 0L): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol)
    val b = base
      .withColumn(seqCol, lit(baseSeq))
      .withColumn(opCol, lit("I"))
    val all = b.unionByName(changes.select(b.columns.map(col): _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) =!= "D")
      .select((keyCol +: payload).map(col): _*)
  }
}
