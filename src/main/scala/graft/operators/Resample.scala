package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular per-key event series
  * onto a fixed-step grid with last-observation-carried-forward — the
  * feature-store shape that turns raw event logs into aligned model
  * inputs (the batch complement of the as-of join family in Joins).
  *
  * Scale shape: the grid is generated per key from that key's own
  * [min, max] span (`sequence` explode — rows bounded by span/step per
  * key, no cross-key blowup); slot-last selection and the LOCF fill are
  * two windows over the SAME (key, slot) partitioning, so the whole
  * operator is two key-hash exchanges of slot-granular rows at any
  * corpus size. */
object Resample {

  /** LOCF-resample `df` (rows (keyCol, tsCol micros, valCol)) onto a
    * `stepUs` grid. Returns (keyCol, slot, slot_start_us, value,
    * is_observed) — one row per key per grid slot between the key's first
    * and last observation; `value` carries the latest observation at or
    * before the slot's end, `is_observed` = 1 iff the slot itself
    * contains an observation. Within a slot the LAST observation wins
    * (ts, then `tieCol` as deterministic tie-break). */
  def locfGrid(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
               stepUs: Long, tieCol: String): DataFrame = {
    val slotted = df.select(col(keyCol), col(tsCol).as("__ts"),
        col(valCol).as("__v"), col(tieCol).as("__tie"))
      .withColumn("slot", expr(s"__ts div $stepUs"))
    // latest observation per (key, slot)
    val wLast = Window.partitionBy(keyCol, "slot")
      .orderBy(col("__ts").desc, col("__tie").desc)
    val slotLast = slotted
      .withColumn("rn", row_number().over(wLast)).where(col("rn") === 1)
      .select(col(keyCol), col("slot"), col("__v").as("obs"))
    // per-key grid across the observed span
    val grid = df.groupBy(col(keyCol))
      .agg(min(expr(s"$tsCol div $stepUs")).as("slot_min"),
        max(expr(s"$tsCol div $stepUs")).as("slot_max"))
      .select(col(keyCol),
        explode(sequence(col("slot_min"), col("slot_max"))).as("slot"))
    val wFill = Window.partitionBy(keyCol).orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(slotLast, Seq(keyCol, "slot"), "left")
      .withColumn("value", last(col("obs"), ignoreNulls = true).over(wFill))
      .select(col(keyCol), col("slot"),
        (col("slot") * stepUs).as("slot_start_us"), col("value"),
        col("obs").isNotNull.cast("int").as("is_observed"))
  }
}
