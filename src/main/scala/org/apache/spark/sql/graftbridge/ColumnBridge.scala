package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made Column a ColumnNode wrapper and the Expression bridge
  * `private[sql]`; custom-Expression libraries conventionally expose it
  * from inside the package namespace. Used only by
  * graft.functions.NativeHash to wrap its codegen'd expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** `Dataset.ofRows` moved behind `private[sql]` classic in Spark 4;
    * [[graft.sql.GraftSqlRule]]'s commands need it to execute the
    * analyzed query subtrees they carry. */
  def ofRows(session: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  /** The session's registered V2 catalog by name (`sessionState` is
    * `private[sql]` in Spark 4) — the table-valued functions resolve
    * `'catalog.db.t'` strings through it. */
  def v2Catalog(session: org.apache.spark.sql.SparkSession,
      name: String): org.apache.spark.sql.connector.catalog.CatalogPlugin =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.catalog(name)
}
