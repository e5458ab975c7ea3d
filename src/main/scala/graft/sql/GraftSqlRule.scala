package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, OverwriteByExpression, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.lake.Versioned

/** The analysis rule that makes [[GraftCatalog]] tables fully usable
  * from SQL. Injected by [[graft.GraftExtensions]] into the main
  * resolution batch, so it claims plans BEFORE Spark's V2 row-level
  * rewrites would reject the table for not implementing
  * `SupportsRowLevelOperations` and before the capability checks run:
  *
  *  - READS (`SELECT`, `VERSION AS OF`, `spark.table`): the
  *    `DataSourceV2Relation` is replaced with the exact LogicalPlan
  *    `Versioned.read` builds for the Scala API — native parquet
  *    scan, DV anti-joins, evolved-schema projection — re-aliased to
  *    the relation's attribute ids so enclosing operators resolve
  *    untouched. This keeps the vectorized reader, pushdown and
  *    whole-stage codegen; a custom V2 `PartitionReader` would
  *    surrender all three.
  *  - `INSERT INTO` / `INSERT OVERWRITE` → [[GraftAppendCommand]] →
  *    `Versioned.commit` (append / replace).
  *  - `DELETE FROM … WHERE p` → [[GraftDeleteCommand]] →
  *    `Versioned.deleteWhere` (stat-pruned copy-on-write, the
  *    metadata-only fast path included).
  *  - `UPDATE … SET … WHERE p` → [[GraftUpdateCommand]] →
  *    `Versioned.updateWhere`.
  *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET
  *    * WHEN NOT MATCHED THEN INSERT *` → [[GraftMergeCommand]] →
  *    `Versioned.mergeInto`. The upsert shape is exactly what
  *    `mergeInto` implements; any other clause combination throws a
  *    message naming the supported form rather than mis-executing it.
  *
  * Expressions cross from the analyzed SQL plan into the commands
  * UNRESOLVED-BY-NAME ([[GraftSqlRule.unresolve]]): the `Versioned`
  * operators re-resolve predicates against the table's own schema
  * (`resolvedPredicate`), so the commands carry `Column`s, not foreign
  * `AttributeReference`s — and the SQL path provably goes through the
  * same operator entry points as the Scala path (GraftCatalogSpec
  * pins manifest equality between the two).
  */
case class GraftSqlRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GraftSqlRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations anywhere under the TARGET of a pending DML/write node
    // must not be rewritten into read plans out from under it
    // (identity set: a self-merge references the same table twice
    // with distinct relation instances — only the target side is
    // off-limits). The whole target SUBTREE is protected, not just a
    // direct relation: a view-wrapped target must survive to the DML
    // case so it can be refused loudly by name — a half-rewritten
    // view body would fall through to Spark's opaque INTERNAL_ERROR.
    val targets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def protect(t: LogicalPlan): Unit = t.foreach {
      case r: DataSourceV2Relation => targets.add(r); ()
      case _ =>
    }
    plan.foreach {
      case d: DeleteFromTable => protect(d.table)
      case u: UpdateTable => protect(u.table)
      case m: MergeIntoTable => protect(m.targetTable)
      case a: AppendData => protect(a.table)
      case o: OverwriteByExpression => protect(o.table)
      case _ =>
    }
    plan.resolveOperatorsDown {
      case d @ DeleteFromTable(t, condition) if d.resolved =>
        graftTableOf(t) match {
          case Some(g) =>
            GraftDeleteCommand(g.dir, ColumnBridge.column(
              unresolve(condition)))
          case None => refuseIndirect("DELETE FROM", t); d
        }

      case u @ UpdateTable(t, assignments, condition) if u.resolved =>
        graftTableOf(t) match {
          case Some(g) =>
            val assigns = assignments.map {
              case Assignment(k: Attribute, v) =>
                k.name -> ColumnBridge.column(unresolve(v))
              case other => throw new UnsupportedOperationException(
                s"UPDATE assignment target must be a column: $other")
            }.toMap
            GraftUpdateCommand(g.dir, assigns,
              ColumnBridge.column(condition.map(unresolve)
                .getOrElse(Literal(true))))
          case None => refuseIndirect("UPDATE", t); u
        }

      case m: MergeIntoTable if m.resolved =>
        graftTableOf(m.targetTable) match {
          case Some(g) => rewriteMerge(m, g)
          case None => refuseIndirect("MERGE INTO", m.targetTable); m
        }

      // REPLACE TABLE would route through the V2 drop+create exec
      // path, silently destroying the table's HISTORY (every retained
      // version, pins, constraints) where a graft user expects
      // versioned semantics — refused loudly, naming the two honest
      // alternatives (both of which preserve time travel or make the
      // destruction explicit)
      case r: org.apache.spark.sql.catalyst.plans.logical.ReplaceTableAsSelect
          if isGraftIdent(r.name) => refuseReplaceTable()
      case r: org.apache.spark.sql.catalyst.plans.logical.ReplaceTable
          if isGraftIdent(r.name) => refuseReplaceTable()

      case a: AppendData if a.resolved =>
        graftTableOf(a.table) match {
          case Some(g) => GraftAppendCommand(g.dir,
            a.table.output.map(_.name), a.query, replace = false)
          case None => a
        }

      // ALTER TABLE … ADD CONSTRAINT … CHECK (p): the parser shapes
      // this as AddCheckConstraint over Filter(NOT p, relation) — the
      // validation scan. Claimed HERE, as soon as the relation under
      // the filter resolves to a graft table, because (a) this Spark
      // build's session-catalog rule trips over any rewritten child,
      // and (b) [[Versioned.addCheck]] runs its own race-safe
      // validate-then-declare commit anyway (one scan of the existing
      // table, CAS-published), so the statement routes to the SAME
      // entry point the Scala API uses. The predicate travels as its
      // SQL text and re-resolves against the table inside the
      // operator — a bad column name fails there, loudly.
      case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
        a.child.collectFirst {
          case r: DataSourceV2Relation
              if r.table.isInstanceOf[GraftTable] =>
            r.table.asInstanceOf[GraftTable]
        } match {
          case Some(g) =>
            require(!a.checkConstraint.userProvidedCharacteristic
              .enforced.contains(false),
              "graft CHECK constraints are always ENFORCED — NOT " +
                "ENFORCED declarations are refused rather than " +
                "silently unenforced")
            // name() falls back to a generated name when the user
            // omitted one (userProvidedName is null then)
            GraftAddCheckCommand(g.dir, a.checkConstraint.name,
              a.checkConstraint.condition)
          case None => a
        }

      // CREATE TABLE AS SELECT: the V2 CTAS exec path demands write
      // capabilities / a staging catalog; route it to the operator
      // instead — one commit creates the table WITH the query's rows
      // (v0 carries the data, exactly what a Scala caller's first
      // commit publishes)
      case c: org.apache.spark.sql.catalyst.plans.logical.CreateTableAsSelect
          if c.query.resolved => c.name match {
        case org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier(
            cat: GraftCatalog, ident) =>
          val ctasClusterDdl = GraftTableProps.clusterByOf(
            c.partitioning.toSeq, "graft CTAS")
          // a clause this command cannot honor must fail loudly, not
          // silently produce a warehouse-located parquet table.
          // TBLPROPERTIES carry the file-skipping policy declaration
          // (graft.stats.cols / graft.bloom.*) — the one table policy
          // CTAS can publish with its single data-bearing commit
          val (statCols, bloomCfg, cadence, colMapMode, clusterProp,
            ctasTxnRet, ctasEnforce, ctasMaintain) =
            c.tableSpec match {
            case ts: org.apache.spark.sql.catalyst.plans.logical.TableSpec =>
              require(ts.location.isEmpty && !ts.external,
                "graft tables live at their catalog-derived warehouse " +
                  "path; LOCATION/EXTERNAL is not supported")
              require(ts.provider.forall(p =>
                p.equalsIgnoreCase("graft") || p.equalsIgnoreCase("parquet")),
                s"graft tables store parquet; USING ${ts.provider.get} " +
                  "is not supported")
              require(ts.options.isEmpty && ts.serde.isEmpty,
                "graft CTAS takes no OPTIONS/SERDE")
              GraftTableProps.parse(ts.properties, "graft CTAS")
            case _ => (Nil, Nil, None, None, None, None, None, Nil)
          }
          GraftCtasCommand(cat, ident, c.query, c.ignoreIfExists,
            statCols, bloomCfg, cadence, colMapMode,
            GraftTableProps.resolveClusterBy(ctasClusterDdl,
              clusterProp), ctasTxnRet,
            ctasEnforce.filter(identity), ctasMaintain)
        case _ => c
      }

      case o: OverwriteByExpression if o.resolved =>
        graftTableOf(o.table) match {
          case Some(g) =>
            // TRUNCATE-style overwrite only: the delete expression
            // must provably select EVERYTHING — treating a narrower
            // predicate as full replace would silently drop rows
            require(o.deleteExpr.foldable &&
              o.deleteExpr.eval() == true,
              "graft INSERT OVERWRITE replaces the whole table; " +
                "row-level replacement is DELETE + INSERT or MERGE")
            GraftAppendCommand(g.dir, o.table.output.map(_.name),
              o.query, replace = true)
          case None => o
        }

      // read path LAST: only relations that are not a write target
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !targets.contains(r) =>
        val t = r.table.asInstanceOf[GraftTable]
        val crumb = t.catalogCrumb
        val sub = Versioned.read(session, t.dir, t.asOfVersion)
          .queryExecution.analyzed.transformUp {
            // identifier breadcrumb on the native-parquet leaves:
            // spark.catalog.refreshTable's cache-invalidation walk
            // (run by the engine after every catalog-addressed
            // streaming-sink batch) unconditionally `.get`s a
            // LogicalRelation's catalogTable — a bare leaf NPEs it.
            // Metadata only; the relation's FileIndex stays the scan.
            case lr: org.apache.spark.sql.execution.datasources
                .LogicalRelation if lr.catalogTable.isEmpty =>
              lr.copy(catalogTable = Some(crumb))
          }
        require(sub.output.length == r.output.length,
          s"graft table ${t.name()} read plan arity " +
            s"${sub.output.length} != relation arity ${r.output.length}")
        val read = Project(r.output.zip(sub.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
            explicitMetadata = Some(o.metadata))
        }, sub)
        // breadcrumb for [[refuseIndirect]]: a SQL view body stores
        // THIS analyzed plan, in which nothing else says "graft" —
        // the tag is how DML-through-a-view over a graft table is
        // told apart from a view over some other v1 provider
        read.setTagValue(RewrittenGraftRead, t.dir)
        read
    }
  }

  /** MERGE INTO. The canonical unconditioned star upsert routes to
    * [[Versioned.mergeInto]] (the schema-evolving fast path); every
    * other clause combination — conditional matched UPDATE/DELETE,
    * conditional NOT MATCHED INSERT, NOT MATCHED BY SOURCE
    * UPDATE/DELETE, in any order — compiles to the
    * [[Versioned.MergeClause]] algebra and routes to
    * [[Versioned.mergeApply]]. Clause expressions cross unresolved
    * BY NAME like the other DML ([[GraftSqlRule.unresolve]]), with
    * source-side references rewritten onto the `__s` struct
    * `mergeApply` exposes — target/source qualification survives the
    * re-resolution because the two sides live in different
    * namespaces of the joined row. */
  private def rewriteMerge(m: MergeIntoTable, g: GraftTable): LogicalPlan = {
    val supported = "graft MERGE INTO needs ON to be a conjunction " +
      "of target/source equi-keys (t.k = s.k, or differently named: " +
      "t.k = s.j); got: "
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet
    // (target column, source column) join-key pairs — the names may
    // differ (`ON t.id = s.customer_id`); the command renames the
    // source side onto the target key before handing the frame to
    // the Versioned operator
    def keysOf(e: Expression): Option[Seq[(String, String)]] = e match {
      case And(l, r) =>
        for { a <- keysOf(l); b <- keysOf(r) } yield a ++ b
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetOut.contains(a) && sourceOut.contains(b) =>
        Some(Seq((a.name, b.name)))
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetOut.contains(b) && sourceOut.contains(a) =>
        Some(Seq((b.name, a.name)))
      case _ => None
    }
    val keyPairs = keysOf(m.mergeCondition).getOrElse(
      throw new UnsupportedOperationException(
        supported + s"ON ${m.mergeCondition.sql}"))
    // star-expanded actions: one unconditioned UPDATE assigning every
    // target column its same-named source column; one such INSERT
    def starAssigns(assigns: Seq[Assignment]): Boolean =
      assigns.forall {
        case Assignment(k: Attribute, v: Attribute) =>
          k.name.equalsIgnoreCase(v.name) && sourceOut.contains(v)
        case _ => false
      }
    (m.matchedActions, m.notMatchedActions,
      m.notMatchedBySourceActions) match {
      case (Seq(u: UpdateAction), Seq(i: InsertAction), Seq())
          if u.condition.isEmpty && i.condition.isEmpty &&
            starAssigns(u.assignments) && starAssigns(i.assignments) &&
            keyPairs.forall(p => p._1.equalsIgnoreCase(p._2)) =>
        // project the source to exactly the target's columns, in
        // the insert action's mapping (schema-stable upsert). Only
        // same-named keys qualify: with `ON t.k = s.j` the star
        // mapping would join on s.k, not the declared s.j
        val cols = i.assignments.map {
          case Assignment(k: Attribute, v: Attribute) => (k.name, v.name)
          case a => throw new UnsupportedOperationException(supported +
            a.toString)
        }
        GraftMergeCommand(g.dir, m.sourceTable, cols, keyPairs.map(_._1))
      case _ =>
        GraftMergeApplyCommand(g.dir, m.sourceTable, keyPairs,
          generalClauses(m, sourceOut))
    }
  }

  /** Compile the analyzed MERGE actions into [[Versioned.MergeClause]]s:
    * source-side attribute references land on the `__s` struct of the
    * joined row, target-side references go bare — both re-resolve by
    * name inside [[Versioned.mergeApply]]. */
  private def generalClauses(m: MergeIntoTable,
      sourceOut: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Seq[Versioned.MergeClause] = {
    def xlate(e: Expression): Column =
      ColumnBridge.column(unresolve(e, a =>
        if (sourceOut.contains(a))
          UnresolvedAttribute(Seq("__s", a.name))
        else UnresolvedAttribute.quoted(a.name)))
    def assigns(as: Seq[Assignment]): Map[String, Column] =
      as.map {
        case Assignment(k: Attribute, v) => k.name -> xlate(v)
        case other => throw new UnsupportedOperationException(
          "MERGE assignment target must be a plain column: " + other)
      }.toMap
    def matchedClause(a: MergeAction): Versioned.MergeClause = a match {
      case UpdateAction(c, as, _) =>
        Versioned.WhenMatchedUpdate(c.map(xlate), assigns(as))
      case DeleteAction(c) => Versioned.WhenMatchedDelete(c.map(xlate))
      case other => throw new UnsupportedOperationException(
        "unsupported WHEN MATCHED action: " + other)
    }
    def nmbsClause(a: MergeAction): Versioned.MergeClause = a match {
      case UpdateAction(c, as, _) =>
        Versioned.WhenNotMatchedBySourceUpdate(c.map(xlate), assigns(as))
      case DeleteAction(c) =>
        Versioned.WhenNotMatchedBySourceDelete(c.map(xlate))
      case other => throw new UnsupportedOperationException(
        "unsupported WHEN NOT MATCHED BY SOURCE action: " + other)
    }
    def insertClause(a: MergeAction): Versioned.MergeClause = a match {
      case InsertAction(c, as) =>
        Versioned.WhenNotMatchedInsert(c.map(xlate), assigns(as))
      case other => throw new UnsupportedOperationException(
        "unsupported WHEN NOT MATCHED action: " + other)
    }
    m.matchedActions.map(matchedClause) ++
      m.notMatchedActions.map(insertClause) ++
      m.notMatchedBySourceActions.map(nmbsClause)
  }
}

object GraftSqlRule {

  /** Stamped (with the table dir) on every read plan the rule grafts
    * in place of a [[GraftTable]] relation. SQL views store their
    * ANALYZED body — i.e. this rewritten plan, in which no graft node
    * survives — so the tag is the only remaining evidence that a
    * view wraps a graft table ([[GraftSqlRule.refuseIndirect]]). */
  private[sql] val RewrittenGraftRead =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[String](
      "graft.rewrittenRead")

  /** Strip subquery aliases down to the relation a DML node targets. */
  private def stripAlias(p: LogicalPlan): Option[LogicalPlan] = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    case r: DataSourceV2Relation => Some(r)
    case _ => None
  }

  private def graftTableOf(p: LogicalPlan): Option[GraftTable] =
    stripAlias(p).collect {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        r.table.asInstanceOf[GraftTable]
    }

  private def isGraftIdent(name: LogicalPlan): Boolean = name match {
    case org.apache.spark.sql.catalyst.analysis
        .ResolvedIdentifier(cat, _) => cat.isInstanceOf[GraftCatalog]
    case _ => false
  }

  private def refuseReplaceTable(): Nothing =
    throw new UnsupportedOperationException(
      "graft tables refuse REPLACE TABLE: it would drop every " +
        "retained version. Use INSERT OVERWRITE (a history-" +
        "preserving full-table replace) or explicit DROP TABLE + " +
        "CREATE TABLE")

  /** A DML target that is not a direct relation is DML through a
    * view / subquery — refuse with a message naming the supported
    * form rather than falling through to Spark's opaque
    * INTERNAL_ERROR ("Unexpected table relation: Filter…", because a
    * view body stores its ANALYZED plan, in which the graft relation
    * was already rewritten to the native read). Detected by the
    * `View` wrapper (a graft relation rarely survives inside one) or
    * by a surviving graft relation (Dataset-API temp views). The
    * View detector stands down when the subtree holds another
    * provider's V2 relation — that provider's own rule (or error)
    * owns the plan; graft must not hijack it. Spark supports DML
    * through views for no provider, so the refusal is accurate
    * wherever it does fire. */
  private def refuseIndirect(kind: String, t: LogicalPlan): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.View
    val foreign = t.collectFirst {
      case r: DataSourceV2Relation
          if !r.table.isInstanceOf[GraftTable] => r
    }.nonEmpty
    // the View branch additionally demands proof the view is over a
    // GRAFT table (the [[RewrittenGraftRead]] breadcrumb the read
    // rewrite stamps): a view over some other v1/LogicalRelation
    // provider is a plan graft does not own — stand down and let that
    // provider's rule (or Spark's own error) speak
    val overGraft =
      t.find(_.getTagValue(RewrittenGraftRead).isDefined).nonEmpty
    val viewish = (!foreign && overGraft &&
      t.collectFirst { case v: View => v }.nonEmpty) ||
      t.collectFirst {
        case r: DataSourceV2Relation
            if r.table.isInstanceOf[GraftTable] => r
      }.nonEmpty
    if (viewish)
      throw new UnsupportedOperationException(
        s"$kind must target the table directly " +
          s"($kind catalog.db.t [AS alias] …), not a view or " +
          "subquery over it — move the view's filters into the WHERE " +
          "clause")
  }

  /** Re-anchor an analyzed expression by NAME: the `Versioned`
    * operators resolve predicates against the table's own schema, so
    * the SQL plan's attribute ids (which belong to a relation instance
    * that no longer exists once the command replaces it) must not leak
    * through. Qualified references drop their qualifier — inside a
    * single-table DML the bare name is unambiguous. Spark 4's `With`
    * common-expression wrappers (e.g. inside BETWEEN's runtime
    * replacement) inline first: a `With` rebuilt over unresolved
    * children recomputes its defs' dataType and throws, and the
    * expanded form re-resolves identically anyway. */
  private[sql] def unresolve(e: Expression): Expression =
    unresolve(e, a => UnresolvedAttribute.quoted(a.name))

  /** As [[unresolve(e:*]], with a caller-chosen attribute mapping —
    * the MERGE translation routes source-side references onto the
    * `__s` struct while target-side references stay bare. */
  private[sql] def unresolve(e: Expression,
      attr: AttributeReference => Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CommonExpressionRef, With}
    val expanded = e.transformUp {
      case w: With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: CommonExpressionRef => defs.getOrElse(r.id, r)
        }
    }
    expanded.transform {
      case a: AttributeReference => attr(a)
    }
  }
}

/** `INSERT INTO` (append) / `INSERT OVERWRITE` (replace) routed to
  * [[Versioned.commit]]. The analyzed `query` is already aligned to
  * the table schema positionally (Spark's output resolution); it is
  * renamed to the table's column names and committed — the identical
  * entry point a Scala caller uses, manifest and all. */
final case class GraftAppendCommand(dir: String, columns: Seq[String],
    @transient query: LogicalPlan, replace: Boolean)
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val df = ColumnBridge.ofRows(session, query).toDF(columns: _*)
    Versioned.commit(session, dir, df, replace = replace)
    Seq.empty
  }
}

/** `ALTER TABLE … ADD CONSTRAINT name CHECK (p)` →
  * [[Versioned.addCheck]]: validate the existing rows, then publish
  * the declaration as a commit — enforced on every later writer. */
final case class GraftAddCheckCommand(dir: String, name: String,
    conditionSql: String) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    Versioned.addCheck(session, dir, name, conditionSql)
    Seq.empty
  }
}

/** `DELETE FROM … WHERE p` → [[Versioned.deleteWhere]] (stat-pruned
  * copy-on-write with the metadata-only fast path). */
final case class GraftDeleteCommand(dir: String, condition: Column)
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    Versioned.deleteWhere(session, dir, condition)
    Seq.empty
  }
}

/** `UPDATE … SET … WHERE p` → [[Versioned.updateWhere]]. */
final case class GraftUpdateCommand(dir: String,
    assignments: Map[String, Column], condition: Column)
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    Versioned.updateWhere(session, dir, condition, assignments)
    Seq.empty
  }
}

/** `CREATE TABLE AS SELECT` → one [[Versioned.commit]] (or
  * [[Versioned.commitWithIndex]] when TBLPROPERTIES declared a
  * file-skipping policy) that creates the table with the query's rows
  * — v0 carries the data, the stats, the blooms AND the policy
  * headers, exactly what a Scala caller's first `commitWithIndex`
  * publishes. The identifier must not already name a table unless
  * `IF NOT EXISTS` asked for the no-op. */
final case class GraftCtasCommand(catalog: GraftCatalog,
    ident: org.apache.spark.sql.connector.catalog.Identifier,
    @transient query: LogicalPlan, ignoreIfExists: Boolean,
    statCols: Seq[String] = Nil,
    bloomCfg: Seq[(String, Long, Double)] = Nil,
    ckptEvery: Option[Int] = None,
    colMapMode: Option[String] = None,
    clusterBy: Option[Seq[String]] = None,
    txnRetention: Option[Long] = None,
    schemaEnforce: Option[Boolean] = None,
    maintain: Seq[(String, String)] = Nil)
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    if (catalog.tableExists(ident)) {
      if (ignoreIfExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
        (catalog.name() +: ident.namespace().toSeq :+ ident.name())
          .mkString("."))
    }
    val df = ColumnBridge.ofRows(session, query)
    (statCols ++ bloomCfg.map(_._1) ++ clusterBy.getOrElse(Nil))
      .foreach(c => require(df.columns.contains(c),
        s"policy column '$c' is not in the CTAS query's columns " +
          df.columns.mkString("[", ", ", "]")))
    // id-mapping / clustered CTAS: the policy must exist BEFORE the
    // data files stage (files must carry uuids / the range-sorted
    // layout from birth), so the CTAS publishes as declared-schema
    // v0 -> policy commit(s) -> data — the CREATE TABLE + INSERT
    // lifecycle, fused. Cadence/retention fold into the SAME policy
    // commit when one happens anyway.
    val preData = colMapMode.isDefined || clusterBy.isDefined
    if (preData)
      // cluster columns join the stat policy from birth (a zero-row
      // v0 file records inverted-sentinel groups and prunes out)
      Versioned.commitWithStats(session, catalog.tableDir(ident),
        df.limit(0), (statCols ++ clusterBy.getOrElse(Nil)).distinct,
        replace = false)
    colMapMode.foreach(m =>
      Versioned.setColumnMapping(session, catalog.tableDir(ident), m))
    if (preData && (clusterBy.isDefined || ckptEvery.isDefined ||
        txnRetention.isDefined || schemaEnforce.isDefined ||
        maintain.nonEmpty))
      Versioned.setPolicy(session, catalog.tableDir(ident),
        manifestCheckpointEvery = ckptEvery.map(n => Some(n)),
        clusterBy = clusterBy,
        txnRetention = txnRetention.map(ms => Some(ms)),
        schemaEnforce = schemaEnforce,
        maintainSet = maintain)
    if (statCols.isEmpty && bloomCfg.isEmpty)
      Versioned.commit(session, catalog.tableDir(ident), df)
    else
      Versioned.commitWithIndex(session, catalog.tableDir(ident), df,
        statCols, bloomCfg.map(_._1),
        bloomExpectedItems =
          bloomCfg.headOption.map(_._2).getOrElse(100000L),
        bloomFpp = bloomCfg.headOption.map(_._3).getOrElse(0.03))
    // without a pre-data policy block, cadence/retention publish as
    // one policy commit after the data (setPolicy needs a head)
    if (!preData && (ckptEvery.isDefined || txnRetention.isDefined ||
        schemaEnforce.isDefined || maintain.nonEmpty))
      Versioned.setPolicy(session, catalog.tableDir(ident),
        manifestCheckpointEvery = ckptEvery.map(n => Some(n)),
        txnRetention = txnRetention.map(ms => Some(ms)),
        schemaEnforce = schemaEnforce,
        maintainSet = maintain)
    Seq.empty
  }
}

/** General `MERGE INTO` (conditional / delete / not-matched-by-source
  * clauses) → [[Versioned.mergeApply]] with the compiled
  * [[Versioned.MergeClause]] list. `keyPairs` are (target, source)
  * join keys: a differently-named source key (`ON t.id =
  * s.customer_id`) is COPIED onto the target name before the frame
  * reaches the operator — copied, not renamed, so clause expressions
  * referencing the original name through the `__s` struct still
  * resolve. A source that already has an unrelated column under the
  * target key's name is refused loudly (routing it would silently
  * join on the wrong column). */
final case class GraftMergeApplyCommand(dir: String,
    @transient source: LogicalPlan, keyPairs: Seq[(String, String)],
    @transient clauses: Seq[Versioned.MergeClause])
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val src = keyPairs.foldLeft(ColumnBridge.ofRows(session, source)) {
      case (df, (t, sCol)) =>
        if (t.equalsIgnoreCase(sCol)) df
        else {
          require(!df.columns.exists(_.equalsIgnoreCase(t)),
            s"MERGE ON t.$t = s.$sCol is ambiguous: the source also " +
              s"has a column named '$t' — alias it away in the USING " +
              "clause")
          df.withColumn(t, col(s"`$sCol`"))
        }
    }
    Versioned.mergeApply(session, dir, src, keyPairs.map(_._1), clauses)
    Seq.empty
  }
}

/** Upsert-shaped `MERGE INTO` → [[Versioned.mergeInto]]. `cols` maps
  * target column name → source column name (the star expansion), so
  * the staged source frame carries exactly the target's columns. */
final case class GraftMergeCommand(dir: String,
    @transient source: LogicalPlan, cols: Seq[(String, String)],
    keys: Seq[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val src = ColumnBridge.ofRows(session, source)
      .select(cols.map { case (t, s) => col(s"`$s`").as(t) }: _*)
    Versioned.mergeInto(session, dir, src, keys)
    Seq.empty
  }
}
