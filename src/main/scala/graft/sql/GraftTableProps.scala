package graft.sql

/** The TBLPROPERTIES vocabulary of graft tables — the SQL declaration
  * surface for the lake's file-skipping policy
  * ([[graft.lake.Versioned.setPolicy]]):
  *
  * {{{
  *   CREATE TABLE graft.db.t (id BIGINT, s STRING)
  *     TBLPROPERTIES ('graft.stats.cols'='id',
  *                    'graft.bloom.cols'='s',
  *                    'graft.bloom.expected'='100000',
  *                    'graft.bloom.fpp'='0.03')
  *   ALTER TABLE graft.db.t SET TBLPROPERTIES ('graft.stats.cols'='id,ts')
  * }}}
  *
  * Anything else is refused LOUDLY (a property this catalog cannot
  * honor must never be silently dropped — the table would look
  * configured and not be), except the keys Spark itself attaches to
  * every V2 createTable call (`provider` — validated to graft/parquet
  * — and `owner`), which carry no graft semantics.
  */
private[graft] object GraftTableProps {

  val StatsKey = "graft.stats.cols"
  val BloomKey = "graft.bloom.cols"
  val ExpectedKey = "graft.bloom.expected"
  val FppKey = "graft.bloom.fpp"
  // manifest-log snapshot cadence (round 15): how many delta commits
  // may chain before a full snapshot publishes. A read-hot table
  // declares 1 (every commit a snapshot — zero reconstruction tail),
  // a write-hot table 10+ (commits stay O(delta)). UNSET returns the
  // table to the process default.
  val CadenceKey = "graft.manifest.checkpointEvery"
  // column-mapping mode (round 15): 'id' mints uuid physical names
  // for new columns (rename-away / drop + re-add become legal);
  // 'name' is the birth-name default. Declared at CREATE/CTAS or
  // upgraded by ALTER; a downgrade is refused.
  val ModeKey = "graft.colmap.mode"
  // write-time clustering (round 17): appends range-partition + sort
  // their own files on these columns at commit time, so per-file
  // stats are born disjoint — the partition-column replacement on
  // this substrate. Also declarable as `CREATE TABLE … CLUSTER BY`.
  val ClusterKey = "graft.cluster.cols"
  // txn-ledger retention (round 17): drop #txnhw entries whose last
  // stamp is older than this horizon (a duration: '30 days', '12h',
  // or bare ms). An expired writer's replay re-appends — size past
  // any plausible stall. UNSET clears (ledger keeps every writer).
  val TxnRetentionKey = "graft.txn.retention"
  // schema enforcement (round 17): 'true' refuses IMPLICIT schema
  // evolution — only ALTER TABLE … ADD COLUMNS evolves; a writer
  // frame carrying undeclared columns refuses loudly (the typo'd
  // upstream-field drift guard). UNSET / 'false' returns to the
  // auto-evolve default.
  val SchemaEnforceKey = "graft.schema.enforce"
  // maintenance thresholds (round 18): the debt vocabulary
  // `CALL graft.system.maintain` consumes — declared per table so a
  // scheduler needs one verb and zero per-table knowledge. Advisory
  // (no writer gate): an ignorant writer degrades nothing, the debt
  // just waits for the next run.
  val MaintainPrefix = "graft.maintain."
  def maintainKeys: Set[String] =
    graft.lake.Versioned.MaintainKeys.keySet.map(MaintainPrefix + _)
  val PolicyKeys: Set[String] =
    Set(StatsKey, BloomKey, ExpectedKey, FppKey, CadenceKey, ModeKey,
      ClusterKey, TxnRetentionKey, SchemaEnforceKey) ++ maintainKeys

  /** Keys Spark's own DDL machinery attaches; no graft meaning. */
  private val EngineKeys = Set("provider", "owner")

  /** Split a user property map into the policy declaration
    * `(statCols, bloomCfg, manifestCheckpointEvery)` after refusing
    * what this catalog cannot honor: unknown keys, a non-parquet
    * provider, sizing without bloom columns. Standard DDL clauses
    * Spark forwards as properties get DEDICATED refusals (not a
    * misleading "unknown TBLPROPERTIES comment"): graft persists no
    * comments, and a table IS its catalog-derived warehouse path. */
  def parse(props: Map[String, String], context: String)
      : (Seq[String], Seq[(String, Long, Double)], Option[Int],
        Option[String], Option[Seq[String]], Option[Long],
        Option[Boolean], Seq[(String, String)]) = {
    props.get("provider").foreach(p => require(
      p.equalsIgnoreCase("graft") || p.equalsIgnoreCase("parquet"),
      s"graft tables store parquet; USING $p is not supported"))
    require(!props.contains("comment"),
      s"$context does not persist COMMENT — graft table metadata " +
        "lives in the manifest (schema, CHECK constraints, " +
        "file-skipping policy), which has no comment slot")
    require(!props.contains("location") && !props.contains("external") &&
      !props.keys.exists(_.startsWith("option.")),
      "graft tables live at their catalog-derived warehouse path; " +
        "LOCATION/EXTERNAL/OPTIONS are not supported")
    val unknown = props.keySet -- PolicyKeys -- EngineKeys
    require(unknown.isEmpty,
      s"$context cannot honor TBLPROPERTIES ${unknown.mkString(", ")} — " +
        s"supported: ${PolicyKeys.toSeq.sorted.mkString(", ")} (a " +
        "property this catalog silently dropped would lie about the " +
        "table's configuration)")
    val statCols = cols(props, StatsKey)
    val bloomCols = cols(props, BloomKey)
    val expected = props.get(ExpectedKey).map { v =>
      val n = v.toLongOption.getOrElse(sys.error(
        s"$ExpectedKey must be a positive integer, got '$v'"))
      require(n > 0, s"$ExpectedKey must be positive, got $n"); n
    }.getOrElse(100000L)
    val fpp = props.get(FppKey).map { v =>
      val f = v.toDoubleOption.getOrElse(sys.error(
        s"$FppKey must be a number in (0,1), got '$v'"))
      require(f > 0 && f < 1, s"$FppKey must be in (0,1), got $f"); f
    }.getOrElse(0.03)
    require(bloomCols.nonEmpty ||
      (!props.contains(ExpectedKey) && !props.contains(FppKey)),
      s"$ExpectedKey/$FppKey size a bloom index — declare $BloomKey too")
    val cadence = props.get(CadenceKey).map { v =>
      val n = v.toIntOption.getOrElse(sys.error(
        s"$CadenceKey must be a positive integer, got '$v'"))
      require(n >= 1, s"$CadenceKey must be >= 1, got $n"); n
    }
    val mode = props.get(ModeKey).map { v =>
      require(v == "id" || v == "name",
        s"$ModeKey must be 'id' or 'name', got '$v'")
      v
    }.filter(_ == "id") // 'name' is the default: nothing to declare
    val clusterBy = props.get(ClusterKey).map { _ =>
      val cs = cols(props, ClusterKey)
      require(cs.nonEmpty,
        s"$ClusterKey declares at least one column; UNSET " +
          "TBLPROPERTIES clears the clustering policy")
      cs
    }
    val txnRetention = props.get(TxnRetentionKey).map { v =>
      val ms = graft.lake.Versioned.parseDurationMillis(v)
      require(ms > 0, s"$TxnRetentionKey must be a positive duration")
      ms
    }
    val schemaEnforce = props.get(SchemaEnforceKey).map { v =>
      require(v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false"),
        s"$SchemaEnforceKey must be 'true' or 'false', got '$v'")
      v.equalsIgnoreCase("true")
    }
    // maintenance thresholds: each declared key validates eagerly
    // (the same checks Versioned.setPolicy applies), carried as the
    // short header vocabulary
    val maintain = props.collect {
      case (k, v) if k.startsWith(MaintainPrefix) =>
        val short = k.stripPrefix(MaintainPrefix)
        graft.lake.Versioned.MaintainKeys(short)(v)
        (short, v)
    }.toSeq.sortBy(_._1)
    (statCols, bloomCols.map((_, expected, fpp)), cadence, mode,
      clusterBy, txnRetention, schemaEnforce, maintain)
  }

  /** `CREATE TABLE … CLUSTER BY (c1, c2)` / CTAS arrive as the ONE
    * V2 transform this substrate honors (it IS the write-time
    * clustering policy); hive-style partition transforms refuse
    * loudly, naming the clustering levers. Shared by the catalog's
    * createTable and the CTAS rule so the two DDL routes cannot
    * diverge. */
  def clusterByOf(
      partitions: Seq[org.apache.spark.sql.connector.expressions.Transform],
      context: String): Option[Seq[String]] = partitions match {
    case Seq() => None
    case Seq(org.apache.spark.sql.connector.expressions
        .ClusterByTransform(refs)) =>
      Some(refs.map { r =>
        require(r.fieldNames().length == 1,
          s"$context CLUSTER BY takes top-level columns only, got: " +
            r.fieldNames().mkString("."))
        r.fieldNames()(0)
      })
    case _ => throw new IllegalArgumentException(
      s"graft tables take no hive-style partition transforms " +
        s"($context) — file CLUSTERING plus per-file min/max stats " +
        "and blooms is the layout lever on this substrate: declare " +
        "write-time clustering with CREATE TABLE … CLUSTER BY " +
        "(c1, c2) / TBLPROPERTIES ('graft.cluster.cols'='c1,c2'), " +
        "or re-cluster later with CALL graft.system.compact(" +
        "cluster_by => …, zorder => …) — both give readers the same " +
        "file pruning a partition filter would, without small-file " +
        "explosion or partition-evolution rewrites")
  }

  /** The single clustering declaration from the DDL transform and/or
    * the TBLPROPERTIES key — a disagreeing double declaration
    * refuses. */
  def resolveClusterBy(ddl: Option[Seq[String]],
      prop: Option[Seq[String]]): Option[Seq[String]] = {
    require(ddl.isEmpty || prop.isEmpty || ddl == prop,
      "CLUSTER BY and TBLPROPERTIES 'graft.cluster.cols' disagree — " +
        "declare the clustering once")
    ddl.orElse(prop)
  }

  private def cols(props: Map[String, String], key: String): Seq[String] =
    props.get(key).toSeq
      .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .distinct
}
