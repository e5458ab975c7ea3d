package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure-frame MERGE combinators — the set algebra behind the reference's
  * two server-side MERGE statements (transf.py:215-273, 329-362),
  * expressed as lazy DataFrame plans. [[Warehouse]] applies them to
  * managed tables; `SparkEntry.queries` exercises them side-effect-free.
  */
object Merge {

  /** MG1 (transf.py:329-362): the rows of `stage` whose composite key is
    * NOT already in `target` — `WHEN NOT MATCHED THEN INSERT` as a
    * left-anti join. Appending this result is the idempotent fact load.
    */
  def insertIfAbsent(target: DataFrame, stage: DataFrame,
      keys: Seq[String]): DataFrame =
    stage.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** MG2 (transf.py:215-273): SCD Type 1 — the rewritten dimension
    * content: target rows with no stage match, plus every stage row
    * (matched rows take all stage columns), audit columns maintained:
    * `auditCol` ← auditDate; `originCol` ← preserved from target on match
    * (reference overwrote it, transf.py:240 — fixed per SURVEY.md §7).
    * Output column order = target's.
    */
  def scd1(target: DataFrame, stage: DataFrame, key: String,
      auditCol: String = "fecha_actualizacion",
      originCol: String = "fecha_actualizacion_origen",
      auditDate: Column = current_date()): DataFrame = {
    val cols = target.columns
    val unmatched = target.join(stage.select(key), Seq(key), "left_anti")
    val origin = target.select(col(key), col(originCol).as("__origin_prev"))
    val upserts = stage
      .join(origin, Seq(key), "left")
      .withColumn(originCol, coalesce(col("__origin_prev"), col(originCol)))
      .withColumn(auditCol, auditDate.cast("date"))
      .drop("__origin_prev")
    unmatched.select(cols.map(col).toSeq: _*)
      .unionByName(upserts.select(cols.map(col).toSeq: _*))
  }
}
