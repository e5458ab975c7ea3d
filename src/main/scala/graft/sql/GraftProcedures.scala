package graft.sql

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}

import graft.lake.Versioned

/** The lake's SQL maintenance surface: `CALL graft.system.<proc>(…)`
  * through Spark 4's V2 `ProcedureCatalog` hook — the statement form
  * every production table format gives its table-maintenance verbs
  * (Iceberg's `CALL catalog.system.…` is the public precedent). Each
  * procedure is a thin argument adapter over the SAME
  * [[graft.lake.Versioned]] operator the Scala API calls; results
  * come back as rows via `LocalScan` (Spark turns them into a
  * `LocalRelation`), which is the right channel because every result
  * here is manifest-sized — version numbers, audit rows, per-file
  * debt fractions — never data-sized. The one delta-sized product,
  * the row-level change feed, deliberately is NOT a procedure: it
  * stays a distributed plan behind the `graft_table_changes`
  * table-valued function ([[graft.GraftExtensions]]).
  *
  *  - `history(table)`        → [[Versioned.history]] rows
  *  - `restore(table, v)`     → [[Versioned.restore]]; returns new head
  *  - `expire(table, keep)`   → [[Versioned.expire]]; manifests + files removed
  *  - `compact(table)`        → [[Versioned.compactCommit]]; returns new head
  *  - `dv_debt(table)`        → [[Versioned.dvDebt]] per-file fractions
  *
  * `table` is `'db.t'` relative to the catalog the CALL names —
  * the same resolution [[GraftCatalog]] applies to table identifiers.
  */
object GraftProcedures {

  def names: Seq[String] =
    Seq("history", "restore", "expire", "compact", "dv_debt")

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "history" => Some(HistoryProcedure(catalog))
      case "restore" => Some(RestoreProcedure(catalog))
      case "expire" => Some(ExpireProcedure(catalog))
      case "compact" => Some(CompactProcedure(catalog))
      case "dv_debt" => Some(DvDebtProcedure(catalog))
      case _ => None
    }
}

/** One-scan `LocalScan` result — [[BoundProcedure.call]]'s return
  * channel for driver-computed (manifest-sized) rows. */
final case class GraftResultScan(schema: StructType,
    resultRows: Array[InternalRow]) extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = resultRows
}

/** Shared scaffolding: every graft procedure binds to itself (the
  * parameter list is fixed; Spark's coercion aligns the arguments)
  * and resolves its `table` argument against the owning catalog. */
sealed abstract class GraftProcedure(catalog: GraftCatalog)
  extends UnboundProcedure with BoundProcedure {

  override def bind(inputType: StructType): BoundProcedure = this
  // maintenance verbs mutate table state; never cache/reuse results
  override def isDeterministic: Boolean = false

  protected def session: SparkSession = SparkSession.active

  protected def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  /** `'db.t'` (relative to this catalog) → the table directory. */
  protected def dirOf(table: String): String = {
    val parts = table.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"bad table name '$table': expected 'db.t' relative to " +
        s"catalog ${catalog.name()}")
    val ident = Identifier.of(parts.init, parts.last)
    require(catalog.tableExists(ident),
      s"table '$table' not found in catalog ${catalog.name()}")
    catalog.tableDir(ident)
  }

  protected def result(df: DataFrame): util.Iterator[Scan] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(df.schema)
    val rows = df.collect().map(r => conv(r).asInstanceOf[InternalRow])
    util.Collections.singletonList[Scan](GraftResultScan(df.schema, rows))
      .iterator()
  }

  protected def result(schema: StructType,
      values: Array[Any]): util.Iterator[Scan] =
    util.Collections.singletonList[Scan](GraftResultScan(schema,
      Array[InternalRow](new GenericInternalRow(values)))).iterator()
}

/** `CALL graft.system.history('db.t')` → the DESCRIBE HISTORY audit
  * rows ([[Versioned.history]] — one row per retained version,
  * driver-side manifest reads only). */
final case class HistoryProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {
  override def name(): String = "history"
  override def description(): String =
    "audit log: one row per retained version, newest first"
  override def parameters(): Array[ProcedureParameter] =
    Array(param("table", StringType))
  override def call(input: InternalRow): util.Iterator[Scan] =
    result(Versioned.history(session, dirOf(input.getUTF8String(0)
      .toString)))
}

/** `CALL graft.system.restore('db.t', v)` → [[Versioned.restore]]:
  * republish version `v`'s state as a NEW commit (history preserved).
  * Returns the new head version. */
final case class RestoreProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {
  override def name(): String = "restore"
  override def description(): String =
    "re-publish an earlier version's state as a new commit"
  override def parameters(): Array[ProcedureParameter] =
    Array(param("table", StringType), param("version", IntegerType))
  override def call(input: InternalRow): util.Iterator[Scan] = {
    val v = Versioned.restore(session,
      dirOf(input.getUTF8String(0).toString), input.getInt(1))
    result(StructType(Seq(StructField("version", IntegerType,
      nullable = false))), Array[Any](v))
  }
}

/** `CALL graft.system.expire('db.t', keep_last)` → [[Versioned.expire]]:
  * drop all but the newest `keep_last` versions' manifests and
  * collect unreferenced data/sidecar files (pin- and grace-aware).
  * Returns (manifests dropped, data files deleted). */
final case class ExpireProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {
  override def name(): String = "expire"
  override def description(): String =
    "retention: drop old versions and collect unreferenced files"
  override def parameters(): Array[ProcedureParameter] =
    Array(param("table", StringType), param("keep_last", IntegerType))
  override def call(input: InternalRow): util.Iterator[Scan] = {
    val (manifests, files) = Versioned.expire(session,
      dirOf(input.getUTF8String(0).toString), input.getInt(1))
    result(StructType(Seq(
      StructField("manifests_dropped", IntegerType, nullable = false),
      StructField("files_deleted", IntegerType, nullable = false))),
      Array[Any](manifests, files))
  }
}

/** `CALL graft.system.compact('db.t')` → [[Versioned.compactCommit]]:
  * bin-pack small files to the default target size and materialize
  * deletion vectors, as a time-travel-preserving commit. Returns the
  * new head version. */
final case class CompactProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {
  override def name(): String = "compact"
  override def description(): String =
    "bin-pack small files and materialize deletion vectors"
  override def parameters(): Array[ProcedureParameter] =
    Array(param("table", StringType))
  override def call(input: InternalRow): util.Iterator[Scan] = {
    val v = Versioned.compactCommit(session,
      dirOf(input.getUTF8String(0).toString))
    result(StructType(Seq(StructField("version", IntegerType,
      nullable = false))), Array[Any](v))
  }
}

/** `CALL graft.system.dv_debt('db.t')` → [[Versioned.dvDebt]]: per-file
  * deleted-position fractions — the signal that schedules compaction
  * (`WHERE fraction >= 0.3` names the files a rewrite pays for). */
final case class DvDebtProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {
  override def name(): String = "dv_debt"
  override def description(): String =
    "per-file deleted-row fractions (merge-on-read debt)"
  override def parameters(): Array[ProcedureParameter] =
    Array(param("table", StringType))
  override def call(input: InternalRow): util.Iterator[Scan] =
    result(Versioned.dvDebt(session, dirOf(input.getUTF8String(0)
      .toString)))
}
