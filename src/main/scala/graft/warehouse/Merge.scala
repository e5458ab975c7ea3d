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
    *
    * Single full-outer join on the key, branches derived from side
    * presence — ONE probe of the target (the round-3 formulation's
    * anti-join + origin-preservation join scanned the target slice twice;
    * at a 100 TB dimension the second scan dominates). The stage side
    * carries an explicit presence flag rather than testing its key for
    * null: a null-keyed stage row never equi-joins, and must still
    * surface as an insert, not collapse into all-null target columns.
    */
  def scd1(target: DataFrame, stage: DataFrame, key: String,
      auditCol: String = "fecha_actualizacion",
      originCol: String = "fecha_actualizacion_origen",
      auditDate: Column = current_date()): DataFrame = {
    val cols = target.columns
    val pref = "__s_"
    // presence-flag name derived fresh against the stage columns: a stage
    // that legitimately has a column named "present" renames to
    // __s_present, and a fixed flag name would silently overwrite it with
    // `true` — corrupting that column on every matched row.
    val flag = (Iterator.single("present") ++
        Iterator.from(2).map(i => s"present_$i"))
      .map(pref + _).find(f => !stage.columns.contains(f.drop(pref.length)))
      .get
    val stg = stage.columns.foldLeft(stage)((d, c) =>
        d.withColumnRenamed(c, pref + c))
      .withColumn(flag, lit(true))
    val matched = col(flag).isNotNull
    val out = cols.map {
      case c if c == key =>
        coalesce(col(pref + key), col(key)).as(key)
      case c if c == originCol =>
        // creation date: target's on match (stage's only for inserts)
        coalesce(col(originCol), col(pref + originCol)).as(originCol)
      case c if c == auditCol =>
        when(matched, auditDate.cast("date"))
          .otherwise(col(auditCol)).as(auditCol)
      case c =>
        when(matched, col(pref + c)).otherwise(col(c)).as(c)
    }
    target.join(stg, col(key) === col(pref + key), "full_outer")
      .select(out.toSeq: _*)
  }
}
