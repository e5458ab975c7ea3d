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

  /** SCD Type 2 — history-keeping upsert. The reference's MG2 keeps only
    * latest state (transf.py:215-273); type 2 is the standard extension
    * every warehouse needs: a changed key CLOSES its current version
    * (`validTo` ← loadDate) and opens a new one (`validFrom` ← loadDate,
    * `validTo` ← null = current); an unseen key inserts; an identical
    * stage row (null-safe compare on `tracked`) is a no-op; closed
    * history rows pass through untouched. A key that exists only in
    * history (was closed earlier) and reappears in `stage` re-opens as a
    * fresh version.
    *
    * Scale shape — ONE scan of the target, one join, no second pass:
    * the whole target full-outer joins the stage on
    * `key = stage.key AND validTo IS NULL`, so history rows fall out as
    * join-misses and pass through the keep branch unchanged (no separate
    * history/current split that would scan the target twice). Changed
    * keys must emit TWO rows (closed + new version); rather than
    * unioning two selects over the join (re-running it), each joined row
    * builds a 1-or-2 element struct array and `inline`s it — single
    * pass, codegen'd, and the per-row fan-out is ≤ 2 so no skew. As with
    * [[scd1]], stage-side presence rides an explicit flag (a null-keyed
    * stage row never equi-joins but must still insert), and the flag
    * name is derived against the stage's columns.
    *
    * `stage` must carry every target column except `validFromCol` /
    * `validToCol`; new versions take ALL their attributes from the
    * stage. `tracked` is the change-detection set (null-safe equality);
    * attributes outside it are still refreshed on change but do not by
    * themselves trigger a new version.
    */
  def scd2(target: DataFrame, stage: DataFrame, key: String,
      tracked: Seq[String], loadDate: Column,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    require(tracked.nonEmpty, "tracked columns must be non-empty")
    val cols = target.columns
    val pref = "__s_"
    val sFlag = (Iterator.single("present") ++
        Iterator.from(2).map(i => s"present_$i"))
      .map(pref + _).find(f => !stage.columns.contains(f.drop(pref.length)))
      .get
    val tFlag = (Iterator.single("__t_present") ++
        Iterator.from(2).map(i => s"__t_present_$i"))
      .find(f => !cols.contains(f)).get
    val stg = stage.columns.foldLeft(stage)((d, c) =>
        d.withColumnRenamed(c, pref + c))
      .withColumn(sFlag, lit(true))
    val dateT = target.schema(validToCol).dataType
    val load = loadDate.cast(dateT)
    val sPresent = col(sFlag).isNotNull
    val tPresent = col(tFlag).isNotNull
    val changed = tPresent && sPresent &&
      !tracked.map(c => col(pref + c) <=> col(c)).reduce(_ && _)
    // keep branch: every target row survives; a changed current row is
    // closed, everything else (history, unmatched current, no-op match)
    // passes through byte-identical
    val keep = when(tPresent, struct(cols.toSeq.map {
      case c if c == validToCol =>
        when(changed, load).otherwise(col(validToCol)).as(validToCol)
      case c => col(c).as(c)
    }: _*))
    // open branch: brand-new key or changed tracked state → new current
    // version, all attributes from the stage
    val open = when(sPresent && (!tPresent || changed),
      struct(cols.toSeq.map {
        case c if c == validFromCol => load.as(validFromCol)
        case c if c == validToCol =>
          lit(null).cast(dateT).as(validToCol)
        case c => col(pref + c).as(c)
      }: _*))
    target.withColumn(tFlag, lit(true))
      .join(stg, col(key) === col(pref + key) && col(validToCol).isNull,
        "full_outer")
      .select(inline(array_compact(array(keep, open))))
  }
}
