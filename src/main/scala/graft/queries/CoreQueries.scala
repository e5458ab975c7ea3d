package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.transform.WeatherTransforms
import graft.warehouse.Merge
import graft.schemas.Schemas

/** Shared helpers for the verified query suite. */
object Q {
  /** Load a testdata table, normalizing `events.ts` to ONE canonical
    * dtype ([[TimestampType]]) whatever the parquet file encodes — the
    * engine's front-door schema alignment (the reference aligns drifting
    * upstream schemas the same way, main.py:241-263). The column has
    * shipped in three encodings across testdata generations; all are
    * accepted, anything else fails loudly at load time:
    *   - TIMESTAMP(NANOS): no native Spark type — read as nanos Long
    *     (`spark.sql.legacy.parquet.nanosAsLong`), µs-aligned (verified
    *     remainder 0), converted via `timestamp_micros`.
    *   - TIMESTAMP_NTZ (µs, isAdjustedToUTC=false): wall-clock cast to
    *     instant under the pinned UTC session zone — the same instants
    *     DuckDB's naive read produces.
    *   - TIMESTAMP: already canonical.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    // SCHEMA memo (optimization round 18): resolving a bare-path
    // parquet read re-infers the schema from file footers on EVERY
    // call — measured ~60 ms per Q.t at sf0.1, ~6× the whole
    // schema-supplied construct, and the suite calls Q.t hundreds of
    // times per bench run. Spark caches relations for CATALOG tables
    // (spark.sql.filesourceTableRelationCacheSize) but not bare
    // paths; this memo is that cache for the harness's table loader.
    // Keyed by path alone: testdata is immutable within a run, and
    // inference is deterministic (the nanosAsLong flag above is
    // always set before the first read). Only the SCHEMA is reused —
    // every call still builds a fresh DataFrame (fresh attribute ids,
    // so self-joins of the same table disambiguate exactly as
    // before), and every action re-scans the files.
    val schema = tSchemaCache.computeIfAbsent(path,
      p => s.read.parquet(p).schema)
    normalizeTs(s.read.schema(schema).parquet(path))
  }

  private val tSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Shuffle-partition count the streaming queries pin for their
    * micro-batch joins/aggregates (state-store count is fixed by the
    * FIRST checkpointed batch, so this is also the number of state
    * stores committed per batch). 4 measured best at sf0.1 against 32
    * (≈10× task overhead) — env-overridable so lifecycle-floor probes
    * can measure other values without a code edit.
    */
  def streamParts: String =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4")

  /** Streaming read of a testdata-shaped parquet directory with the SAME
    * `ts` normalization as [[t]] — the q37/q98 stream readers go through
    * here, so a testdata re-encode can never split the static and
    * streamed views of the same file.
    */
  def streamTable(s: SparkSession, path: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.readStream.schema(s.read.parquet(path).schema)
      .parquet(path))
  }

  /** Normalize every timestamp-family column to canonical
    * [[TimestampType]]; see [[t]]. `ts` additionally accepts its legacy
    * nanos-Long read (TIMESTAMP(NANOS) has no native Spark type) but
    * rejects any OTHER non-timestamp encoding by name. All remaining
    * TIMESTAMP_NTZ columns (`o_orderdate`, `l_shipdate`, ... — whatever a
    * testdata regeneration produces) cast to instants under the pinned
    * UTC session zone, so operators downstream see exactly one dtype
    * whichever way the files were written. Works on batch and streaming
    * frames alike.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    val tsFixed =
      if (!df.columns.contains("ts")) df
      else df.schema("ts").dataType match {
        case LongType => // legacy nanos-as-long read of TIMESTAMP(NANOS)
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType | TimestampType => df // cast below
        case other => throw new IllegalArgumentException(
          s"unsupported ts encoding ${other.sql}: expected TIMESTAMP, " +
            "TIMESTAMP_NTZ, or legacy nanos BIGINT")
      }
    tsFixed.schema.fields.foldLeft(tsFixed) { (d, f) =>
      if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      else d
    }
  }

  /** Order-independent, cross-engine-exact monetary aggregate: round each
    * row to integer cents (identical IEEE double op in Spark and DuckDB),
    * sum as BIGINT (exact), divide once by 100.0 (identical double op).
    * Avoids the accumulation-order nondeterminism of sum(double).
    */
  def centsSum(rowExpr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(round(rowExpr * 100).cast("long")) / lit(100.0)

  /** The same in DuckDB SQL. sum(BIGINT) is HUGEINT there; /100.0 takes it
    * back through the identical double division.
    */
  def centsSumSql(rowExpr: String): String =
    s"sum(CAST(round(($rowExpr)*100) AS BIGINT))/100.0"

  /** Integer-cents conversion of a MEASUREMENT column, total over dirty
    * streams: NULL and non-finite readings (NaN/±Inf — the fuzz-corpus
    * gate fed all three; the plain `round(x*100).cast(long)` is an ANSI
    * CAST_OVERFLOW on NaN, killing six queries and a running stream) are
    * DEFINED as missing → NULL, so sums/mins/maxes skip them while
    * row counts still count the event. Wrap in `coalesce(_, 0)` where a
    * concrete per-row number is required (session totals).
    *
    * Money columns (prices) keep the strict [[centsSum]] form — a
    * non-finite price is corrupt input that SHOULD fail loudly; a
    * non-finite measurement is Tuesday.
    */
  /** Largest |measurement| whose cents fit a BIGINT with margin: a
    * finite-but-absurd reading (1e17, DBL_MAX garbage) is as corrupt as
    * Inf and must read as missing, not ANSI-CAST_OVERFLOW the stream.
    */
  val CentsBound: Double = 9.0e16

  def centsSafe(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(!isnan(c) && abs(c) < lit(CentsBound),
      round(c * 100).cast("long"))

  /** DuckDB twin of [[centsSafe]] (`abs(NULL)` is NULL → CASE yields
    * NULL, same as the missing branch; the bound also excludes ±Inf
    * and the NaN test keeps DuckDB's NaN-is-greatest ordering from
    * passing it).
    */
  def centsSafeSql(e: String): String =
    s"CASE WHEN NOT isnan($e) AND abs($e) < $CentsBound " +
      s"THEN CAST(round(($e)*100) AS BIGINT) END"

  /** Copy a parquet table's data files FLAT into `dstDir`, whether the
    * table shipped as one file (the driver testdata layout) or as a
    * Spark-written directory of part files (the stress-probe synthesis
    * layout) — the streaming fixtures copy their source out of the
    * table dir before streaming it, and both the schema-inference batch
    * read and the file-stream source list `dstDir` non-recursively, so
    * the parts must land at its top level.
    */
  def copyTableFiles(src: java.nio.file.Path,
      dstDir: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    if (Files.isDirectory(src)) {
      val walk = Files.walk(src)
      try walk
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .forEach { p =>
          Files.copy(p, dstDir.resolve(p.getFileName.toString),
            StandardCopyOption.REPLACE_EXISTING); ()
        }
      finally walk.close()
    } else {
      Files.copy(src, dstDir.resolve(src.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** Shared streaming-fixture input writer: split `df` into three
    * single-file batches (`idCol % 3` — plain `%`, so a negative id
    * falls in no class and is dropped, exactly as the per-class
    * `filter(col % 3 === b)` always did) under `tmp` with strictly
    * ascending mod-times so the file source replays them oldest-first.
    * ONE scan+write job instead of three (optimization round 18): the
    * frame is written once, partitioned by the class, and the part
    * files move into place; a class with no rows still gets an
    * (empty) file so the stream's batch numbering stays
    * corpus-independent.
    */
  def writeModBatches(df: DataFrame, idCol: String,
      tmp: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, attribute}
    def firstPart(dir: java.nio.file.Path): Option[java.nio.file.Path] = {
      if (!Files.isDirectory(dir)) return None
      val st = Files.list(dir)
      try {
        val it = st.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst()
        if (it.isPresent) Some(it.get()) else None
      } finally st.close()
    }
    val stage = Files.createTempDirectory("graft-batch-stage")
    try {
      df.withColumn("__b", col(idCol) % 3)
        .coalesce(1)
        .write.partitionBy("__b").mode("overwrite")
        .parquet(stage.toString)
      (0 to 2).foreach { b =>
        val dst = tmp.resolve(s"b$b.parquet")
        firstPart(stage.resolve(s"__b=$b")) match {
          case Some(p) => Files.move(p, dst); ()
          case None => // empty class (tiny/empty corpora): schema-only file
            val es = Files.createTempDirectory("graft-batch-empty")
            try {
              df.limit(0).coalesce(1).write.mode("overwrite")
                .parquet(es.toString)
              Files.move(firstPart(es).get, dst); ()
            } finally deleteRecursively(es)
        }
        Files.setLastModifiedTime(dst,
          attribute.FileTime.fromMillis(1700000000000L + b * 60000L))
        ()
      }
    } finally deleteRecursively(stage)
  }

  /** Per-run scratch warehouse root for the harness mains (Verify /
    * Bench / Stress): managed-table fixtures (q43/q70/q101/q108/q111/…)
    * create and drop tables under `spark.sql.warehouse.dir`, so two
    * concurrent runs sharing the default `./spark-warehouse` can drop
    * each other's tables mid-read. A unique temp root isolates each
    * JVM; the shutdown hook (plus each main's end-of-run janitor)
    * removes it.
    */
  def scratchWarehouse(): String = {
    // a kill -9'd run skips the shutdown hook and leaves its scratch
    // root behind — sweep stale siblings (age-gated: anything younger
    // may belong to a LIVE concurrent run) before creating this run's
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    try {
      val ls = java.nio.file.Files.list(tmp)
      try ls.filter(d => d.getFileName.toString.startsWith(
          "graft-warehouse-") &&
          java.nio.file.Files.getLastModifiedTime(d).toMillis < cutoff)
        .forEach(d => try deleteRecursively(d) catch { case _: Exception => () })
      finally ls.close()
    } catch { case _: Exception => () }
    val p = java.nio.file.Files.createTempDirectory("graft-warehouse-")
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(p)))
    p.toAbsolutePath.toString
  }

  /** Remove a fixture temp dir (best-effort): repeated bench/verify runs
    * must not accumulate copies of the testdata under /tmp.
    */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => { Files.deleteIfExists(q); () })
      finally walk.close()
    }
  }
}

/** Reference-surface queries (SURVEY.md §2.1-§2.10) over the driver
  * testdata, each with a DuckDB oracle twin. Determinism rules:
  * explicit ORDER BY with full tiebreaks; aggregates of non-integral
  * doubles via [[Q.centsSum]]; per-row double arithmetic left unrounded
  * (bit-identical across engines on identical inputs).
  */
object CoreQueries {
  import Q._

  // ---------------------------------------------------------------- q01
  // §2.4 aggregation surface (TPC-H Q1 shape): groupBy + sum/count/avg.
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integral doubles: exact sum
        centsSum(col("l_extendedprice")).as("sum_base_price"),
        centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  sum(l_quantity) AS sum_qty,
       |  ${centsSumSql("l_extendedprice")} AS sum_base_price,
       |  ${centsSumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
       |  count(*) AS count_order,
       |  sum(l_quantity)/count(*) AS avg_qty
       |FROM lineitem GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  // §3.3 flagship: the whole weather transform pipeline (D1-D4, M1-M3,
  // J1/P2/P4, P3) mapped onto events ⟕ customer. `value` plays
  // winddirection (same [0,360] domain), the cardinal CaseWhen is the
  // reference's exact branch table (transf.py:55-81).
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val shifted = WeatherTransforms.shiftToLocalTime(col("ts"))
    t(s, dir, "events")
      .withColumn("date", date_format(shifted, "dd/MM/yyyy"))
      .withColumn("time", date_format(shifted, "HH:mm"))
      .withColumn("dir_cardinal", WeatherTransforms.windCardinal(col("value")))
      .withColumn("value_mmhg", WeatherTransforms.hPaToMmHg(col("value")))
      .withColumn("is_flag", col("event_type") === "click")
      .join(broadcast(
          t(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment")),
        col("user_id") === col("c_custkey"), "left")
      .drop("c_custkey")
      .withColumnRenamed("c_name", "city")
      .select("event_id", "date", "time", "dir_cardinal", "value_mmhg",
        "is_flag", "city", "c_mktsegment")
      .orderBy("event_id")
  }

  private val q02Sql =
    """SELECT e.event_id,
      |  strftime(e.ts - INTERVAL 3 HOUR, '%d/%m/%Y') AS date,
      |  strftime(e.ts - INTERVAL 3 HOUR, '%H:%M') AS time,
      |  CASE WHEN e.value = 0 OR e.value = 360 THEN 'N'
      |       WHEN e.value > 0 AND e.value < 90 THEN 'NO'
      |       WHEN e.value = 90 THEN 'W'
      |       WHEN e.value > 90 AND e.value < 180 THEN 'SE'
      |       WHEN e.value = 180 THEN 'S'
      |       WHEN e.value > 180 AND e.value < 270 THEN 'SO'
      |       WHEN e.value = 270 THEN 'E'
      |       ELSE 'NE' END AS dir_cardinal,
      |  e.value * 0.750064 AS value_mmhg,
      |  (e.event_type = 'click') AS is_flag,
      |  c.c_name AS city, c.c_mktsegment
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q03
  // §1.3 schema alignment (P8+M4+P3, main.py:242-263): conform a frame
  // missing columns to a fixed schema — absent fields become typed nulls.
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val target = StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_size", IntegerType),
      StructField("region_hint", StringType)))
    Schemas.conformTo(target)(t(s, dir, "part").select("p_partkey", "p_name"))
      .orderBy("p_partkey")
  }

  private val q03Sql =
    """SELECT p_partkey, p_name, CAST(NULL AS INTEGER) AS p_size,
      |  CAST(NULL AS VARCHAR) AS region_hint
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q04
  // MG1 (transf.py:329-362): insert-if-absent on a composite key as a
  // left-anti join — stage rows whose (o_orderdate, o_orderkey) is not in
  // the target slice.
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val stage = orders.filter(col("o_orderkey") % 7 === 0)
    val target = orders.filter(col("o_orderkey") % 3 === 0)
    Merge.insertIfAbsent(target, stage, Seq("o_orderdate", "o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
      .orderBy("o_orderkey")
  }

  private val q04Sql =
    """SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_orderdate
      |FROM orders s
      |WHERE s.o_orderkey % 7 = 0 AND NOT EXISTS (
      |  SELECT 1 FROM orders t WHERE t.o_orderkey % 3 = 0
      |    AND t.o_orderdate = s.o_orderdate AND t.o_orderkey = s.o_orderkey)
      |ORDER BY s.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q05
  // MG2 (transf.py:215-273): SCD Type 1 upsert — unmatched target rows ∪
  // stage rows (stage wins), audit date set, creation date preserved.
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val target = cust
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        to_date(lit("2025-01-01")).as("fecha_actualizacion_origen"),
        to_date(lit("2025-01-01")).as("fecha_actualizacion"))
    val stage = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), concat(col("c_name"), lit(" (upd)")).as("c_name"),
        (round(col("c_acctbal") * 100).cast("long") / lit(100.0) + lit(100.0))
          .as("c_acctbal"),
        to_date(lit("2026-08-01")).as("fecha_actualizacion_origen"),
        to_date(lit("2026-08-01")).as("fecha_actualizacion"))
    Merge.scd1(target, stage, "c_custkey",
        auditDate = to_date(lit("2026-08-12")))
      .orderBy("c_custkey")
  }

  private val q05Sql =
    """SELECT c_custkey, c_name, c_acctbal,
      |  DATE '2025-01-01' AS fecha_actualizacion_origen,
      |  DATE '2025-01-01' AS fecha_actualizacion
      |FROM customer WHERE c_custkey % 10 <> 0
      |UNION ALL
      |SELECT c_custkey, c_name || ' (upd)' AS c_name,
      |  CAST(round(c_acctbal*100) AS BIGINT)/100.0 + 100.0 AS c_acctbal,
      |  DATE '2025-01-01' AS fecha_actualizacion_origen,
      |  DATE '2026-08-12' AS fecha_actualizacion
      |FROM customer WHERE c_custkey % 10 = 0
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q06
  // §2.9 window functions: top-3 orders per customer by totalprice.
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  private val q06Sql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q07
  // §2.11 exact dedup, deterministic representative: first event_id per
  // (user_id, event_type) + duplicate count. The scalable groupBy form of
  // dropDuplicates (hash-agg, map-side partial).
  private def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(min("event_id").as("first_event_id"), count(lit(1)).as("n_dups"))
      .orderBy("user_id", "event_type")

  private val q07Sql =
    """SELECT user_id, event_type, min(event_id) AS first_event_id,
      |  count(*) AS n_dups
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q08
  // §2.9 top-k: global orderBy + limit with full tiebreak (A2 analogue).
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private val q08Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q09
  // §2.5 datetime surface: D1-D5 formats + fixed-offset shift on orders.
  private def q09(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "dd/MM/yyyy").as("date_ddmmyyyy"),
        date_format(col("o_orderdate"), "MM-dd-yy").as("fecha_partic"),
        date_format(WeatherTransforms.shiftToLocalTime(col("o_orderdate")),
          "HH:mm").as("hhmm_gmt3"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"))
      .orderBy("o_orderkey")

  private val q09Sql =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%d/%m/%Y') AS date_ddmmyyyy,
      |  strftime(o_orderdate, '%m-%d-%y') AS fecha_partic,
      |  strftime(o_orderdate - INTERVAL 3 HOUR, '%H:%M') AS hhmm_gmt3,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  day(o_orderdate) AS d
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q10
  // U1 union-by-name append of two disjoint slices (column orders differ;
  // unionByName realigns — the Spark-native form of the reference's
  // implicit append union, main.py:109-114).
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val a = part.filter(col("p_size") < 10)
      .select("p_partkey", "p_name", "p_size")
    val b = part.filter(col("p_size") >= 40)
      .select("p_size", "p_partkey", "p_name") // shuffled order on purpose
    a.unionByName(b.select("p_partkey", "p_name", "p_size"))
      .orderBy("p_partkey")
  }

  private val q10Sql =
    """SELECT p_partkey, p_name, p_size FROM part
      |WHERE p_size < 10 OR p_size >= 40
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q11
  // J2-semi: membership probe (EXISTS) — customers having orders.
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private val q11Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q12
  // J2-anti: the dedup gate shape (main.py:127-133) — customers with no
  // high-value order (every customer has SOME order in this data, so the
  // probe side is filtered to keep the anti-join non-trivial).
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 450000)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private val q12Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q13
  // §2.7 string surface: translate (T1's strip), upper, substring, length,
  // concat — all codegen'd built-ins.
  private def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("p_name_vup"),
        upper(col("p_brand")).as("brand_up"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  private val q13Sql =
    """SELECT p_partkey,
      |  translate(p_name, 'aeiou', 'AEIOU') AS p_name_vup,
      |  upper(p_brand) AS brand_up,
      |  substring(p_type, 1, 5) AS type5,
      |  length(p_name) AS name_len,
      |  p_brand || '|' || p_type AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q14
  // §2.4 stats: count / exact distinct / min / max per group.
  private def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("n_parts"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        min("l_shipdate").as("first_ship"),
        max("l_shipdate").as("last_ship"))
      .orderBy("l_returnflag")

  private val q14Sql =
    """SELECT l_returnflag, count(*) AS n,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q15
  // §2.9 grouping sets: ROLLUP subtotals (Catalyst Expand).
  /** SQL-standard grouping-sets totality: `GROUP BY ROLLUP/CUBE` always
    * contains the grand-total `()` group — even over ZERO input rows
    * (count 0, sums NULL), which is what DuckDB/PostgreSQL emit. Spark's
    * Expand-based rollup/cube emits nothing at all on empty input
    * (found by the fuzz gate's empty-corpus sweep). Reconstruct the
    * `()` row from the grouped result's finest level (no second corpus
    * scan) and append it only when absent — non-empty inputs already
    * carry it, and the group keys are non-null by data contract, so the
    * all-NULL-keys marker is unambiguous.
    */
  private def withGrandTotal(base0: DataFrame): DataFrame = {
    // materialize the grouped result ONCE (it is |groups|-sized — tiny):
    // three consumers below would otherwise each re-run the corpus scan
    // (Catalyst does not share non-exchange subplans; measured 6 scans
    // un-checkpointed)
    val base = base0.localCheckpoint(true)
    val finest = base.filter(col("l_returnflag").isNotNull &&
      col("l_linestatus").isNotNull)
    val global = finest
      .agg(sum("sum_qty").as("sum_qty"),
        coalesce(sum("n"), lit(0L)).as("n"))
      .select(lit(null).cast("string").as("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"),
        col("sum_qty"), col("n"))
    val existing = base.filter(col("l_returnflag").isNull &&
      col("l_linestatus").isNull)
    base.unionByName(global.join(existing, lit(true), "left_anti"))
  }

  private def q15(s: SparkSession, dir: String): DataFrame =
    withGrandTotal(t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n")))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val q15Sql =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q16
  // §2.3 multi-join star: revenue per region — fact shuffles ONCE for the
  // agg; all three dims broadcast (no fact-side shuffle for joins).
  private def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")

  private val q16Sql =
    s"""SELECT r_name,
       |  ${centsSumSql("l_extendedprice*(1-l_discount)")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ---------------------------------------------------------------- q17
  // §2.11 JSON props extraction (S8 family): get_json_object on
  // events.props, aggregated per event_type.
  private def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(col("k")).as("n_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  private val q17Sql =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k,
      |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q18
  // ST4/ST5 batch form: 15-minute tumbling event-time window (epoch
  // aligned in both engines) — the batch twin of the streaming agg.
  private def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Q.centsSafe(col("value")))
        .as("value_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("value_cents"))
      .orderBy("window_start", "event_type")

  private val q18Sql =
    s"""SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(${Q.centsSafeSql("value")}) AS BIGINT) AS value_cents
      |FROM events GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q19a
  // §2.9 windows beyond row_number: running totals (ROWS frame), lag,
  // rank. Running sums stay on integer cents — engines disagree on
  // windowed double-sum association (segment trees vs running), integers
  // don't care.
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(round(col("o_totalprice") * 100).cast("long")).over(frame)
          .as("running_cents"),
        count(lit(1)).over(frame).as("running_n"),
        lag(col("o_orderkey"), 1).over(order).as("prev_orderkey"),
        rank().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_orderpriority").asc, col("o_orderkey").asc))
          .cast("long").as("prio_rank"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val q19Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS running_cents,
      |  count(*) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
      |  lag(o_orderkey, 1) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |    AS prev_orderkey,
      |  rank() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderpriority ASC, o_orderkey ASC) AS prio_rank
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q19b
  // §2.9 grouping sets: CUBE (all 4 grouping combinations in one pass
  // via Catalyst Expand).
  private def q19b(s: SparkSession, dir: String): DataFrame =
    withGrandTotal(t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n")))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val q19bSql =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q19c
  // Pivot (wide aggregation): event counts per user × event_type. The
  // value list is explicit — required for a deterministic column set at
  // scale (implicit pivot collects distinct values to the driver).
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def q19c(s: SparkSession, dir: String): DataFrame = {
    val pivoted = t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    // absent combos: Spark pivot yields null, the oracle's FILTER count
    // yields 0 — align on 0
    eventTypes.foldLeft(pivoted)((d, c) =>
        d.withColumn(c, coalesce(col(c), lit(0L))))
      .orderBy("user_id")
  }

  private val q19cSql = {
    val cols = eventTypes.map(t =>
      s"""count(*) FILTER (WHERE event_type = '$t') AS "$t"""").mkString(",\n  ")
    s"""SELECT user_id, $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q19d
  // Statistical aggregates, order-independently: exact interpolated
  // percentiles (both engines sort, then interpolate linearly on
  // identical doubles) and stddev derived from exact integer-cents
  // Σc/Σc² instead of streaming-variance merges (whose merge order
  // differs between engines).
  private def q19d(s: SparkSession, dir: String): DataFrame = {
    val c = round(col("l_extendedprice") * 100).cast("long")
    val nd = col("n").cast("double")
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"),
        sum(c).as("s_c"), sum(c * c).as("q_c"))
      // sample stddev of a single row is NULL (the stddev_samp
      // convention) — the n−1 divisor is 0 there, an ANSI
      // divide-by-zero (fuzz gate, single-row corpus)
      .withColumn("stddev_price",
        when(col("n") > 1L,
          sqrt((col("q_c").cast("double")
            - col("s_c").cast("double") * col("s_c").cast("double") / nd)
            / (nd - 1.0)) / 100.0))
      .select("l_returnflag", "median_qty", "p90_qty", "n", "stddev_price")
      .orderBy("l_returnflag")
  }

  private val q19dSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  count(*) AS n,
      |  CASE WHEN count(*) > 1 THEN
      |    sqrt((CAST(sum(c*c) AS DOUBLE)
      |      - CAST(sum(c) AS DOUBLE)*CAST(sum(c) AS DOUBLE)/CAST(count(*) AS DOUBLE))
      |      / (CAST(count(*) AS DOUBLE) - 1.0)) / 100.0 END AS stddev_price
      |FROM (SELECT l_returnflag, l_quantity,
      |        CAST(round(l_extendedprice*100) AS BIGINT) AS c
      |      FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q43
  // MG2 at fact scale (transf.py:215-273): SCD1 against a PARTITIONED
  // managed table via Warehouse.scd1UpsertPartitioned — only partitions
  // containing staged keys are rewritten (dynamic partition overwrite),
  // retiring the full-table-rewrite trade-off. End-to-end side-effecting:
  // the query builds the table, runs the upsert, and returns the final
  // table content for the oracle compare.
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation")
    val target = nation.select(col("n_nationkey"), col("n_name"),
      col("n_regionkey"),
      to_date(lit("2025-01-01")).as("fecha_actualizacion_origen"),
      to_date(lit("2025-01-01")).as("fecha_actualizacion"))
    s.sql("CREATE DATABASE IF NOT EXISTS graft_q43")
    // the in-memory catalog is per-JVM but the warehouse dir persists, so
    // a fresh session's plain DROP is a no-op while the stale location
    // still exists on disk and saveAsTable's CREATE path then throws
    // LOCATION_ALREADY_EXISTS; dropManagedTable clears both
    graft.warehouse.Warehouse.dropManagedTable(s, "graft_q43.dim_nation")
    target.write.mode("overwrite").partitionBy("n_regionkey")
      .saveAsTable("graft_q43.dim_nation")
    val stage = nation.filter(col("n_nationkey") % 5 === 0)
      .select(col("n_nationkey"),
        concat(col("n_name"), lit(" (upd)")).as("n_name"),
        col("n_regionkey"),
        to_date(lit("2026-08-01")).as("fecha_actualizacion_origen"),
        to_date(lit("2026-08-01")).as("fecha_actualizacion"))
    graft.warehouse.Warehouse.scd1UpsertPartitioned(s,
      "graft_q43.dim_nation", stage, "n_nationkey", "n_regionkey",
      auditDate = to_date(lit("2026-08-12")))
    s.table("graft_q43.dim_nation")
      .select("n_nationkey", "n_name", "n_regionkey",
        "fecha_actualizacion_origen", "fecha_actualizacion")
      .orderBy("n_nationkey")
  }

  private val q43Sql =
    """SELECT n_nationkey, n_name, n_regionkey,
      |  DATE '2025-01-01' AS fecha_actualizacion_origen,
      |  DATE '2025-01-01' AS fecha_actualizacion
      |FROM nation WHERE n_nationkey % 5 <> 0
      |UNION ALL
      |SELECT n_nationkey, n_name || ' (upd)' AS n_name, n_regionkey,
      |  DATE '2025-01-01' AS fecha_actualizacion_origen,
      |  DATE '2026-08-12' AS fecha_actualizacion
      |FROM nation WHERE n_nationkey % 5 = 0
      |ORDER BY n_nationkey""".stripMargin

  // --------------------------------------------------------------- q101
  // SCD Type 2 history-keeping upsert (Merge.scd2): one full-outer join
  // against the WHOLE target (history rows fall out as join-misses on
  // the `valid_to IS NULL` residual), changed keys emit closed + opened
  // rows via a single inline'd struct array. Balances in integer cents
  // (exact cross-engine). Stage: %10==0 changed, %10==3 identical
  // (no-op), +1000000-shifted keys brand-new; %7==0 keys carry a closed
  // history row that must pass through untouched.
  private def q101(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val key = col("c_custkey").cast("long")
    val cents = round(col("c_acctbal") * 100).cast("long")
    val cur = cust.select(key.as("c_custkey"), col("c_name"),
      cents.as("bal_cents"), to_date(lit("2025-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val hist = cust.filter(col("c_custkey") % 7 === 0)
      .select(key.as("c_custkey"),
        concat(col("c_name"), lit(" (v0)")).as("c_name"),
        (cents - 500L).as("bal_cents"),
        to_date(lit("2024-01-01")).as("valid_from"),
        to_date(lit("2025-01-01")).as("valid_to"))
    val stage = cust.filter(col("c_custkey") % 10 === 0 ||
        col("c_custkey") % 10 === 3)
      .select(key.as("c_custkey"),
        when(col("c_custkey") % 10 === 0,
          concat(col("c_name"), lit(" (v2)"))).otherwise(col("c_name"))
          .as("c_name"),
        (cents + when(col("c_custkey") % 10 === 0, 10000L).otherwise(0L))
          .as("bal_cents"))
      .unionByName(cust.filter(col("c_custkey") % 10 === 6)
        .select((key + 1000000L).as("c_custkey"), col("c_name"),
          cents.as("bal_cents")))
    Merge.scd2(hist.unionByName(cur), stage, "c_custkey",
        Seq("c_name", "bal_cents"), to_date(lit("2026-08-13")))
      .orderBy("c_custkey", "valid_from")
  }

  private val q101Sql =
    """WITH cur AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
      |    DATE '2025-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
      |  FROM customer),
      |hist AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |    c_name || ' (v0)' AS c_name,
      |    CAST(round(c_acctbal*100) AS BIGINT) - 500 AS bal_cents,
      |    DATE '2024-01-01' AS valid_from, DATE '2025-01-01' AS valid_to
      |  FROM customer WHERE c_custkey % 7 = 0),
      |stage AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |    CASE WHEN c_custkey % 10 = 0 THEN c_name || ' (v2)'
      |         ELSE c_name END AS c_name,
      |    CAST(round(c_acctbal*100) AS BIGINT)
      |      + CASE WHEN c_custkey % 10 = 0 THEN 10000 ELSE 0 END
      |      AS bal_cents
      |  FROM customer WHERE c_custkey % 10 IN (0, 3)
      |  UNION ALL
      |  SELECT CAST(c_custkey AS BIGINT) + 1000000, c_name,
      |    CAST(round(c_acctbal*100) AS BIGINT)
      |  FROM customer WHERE c_custkey % 10 = 6),
      |changed AS (
      |  SELECT c.c_custkey FROM cur c JOIN stage s USING (c_custkey)
      |  WHERE s.c_name IS DISTINCT FROM c.c_name
      |     OR s.bal_cents IS DISTINCT FROM c.bal_cents)
      |SELECT * FROM hist
      |UNION ALL
      |SELECT c.c_custkey, c.c_name, c.bal_cents, c.valid_from,
      |  CASE WHEN ch.c_custkey IS NOT NULL THEN DATE '2026-08-13'
      |  END AS valid_to
      |FROM cur c LEFT JOIN changed ch USING (c_custkey)
      |UNION ALL
      |SELECT s.c_custkey, s.c_name, s.bal_cents,
      |  DATE '2026-08-13' AS valid_from, CAST(NULL AS DATE) AS valid_to
      |FROM stage s LEFT JOIN cur c USING (c_custkey)
      |WHERE c.c_custkey IS NULL OR s.c_name IS DISTINCT FROM c.c_name
      |   OR s.bal_cents IS DISTINCT FROM c.bal_cents
      |ORDER BY c_custkey, valid_from""".stripMargin

  // ----------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_scd1_partitioned" -> (q43 _),
    "q101_merge_scd2" -> (q101 _),
    "q01_agg_pricing" -> (q01 _),
    "q02_flagship_pipeline" -> (q02 _),
    "q03_schema_conform" -> (q03 _),
    "q04_merge_insert_if_absent" -> (q04 _),
    "q05_merge_scd1" -> (q05 _),
    "q06_window_topk_per_group" -> (q06 _),
    "q07_dedup_exact" -> (q07 _),
    "q08_orderby_limit" -> (q08 _),
    "q09_datetime_formats" -> (q09 _),
    "q10_union_by_name" -> (q10 _),
    "q11_semi_join" -> (q11 _),
    "q12_anti_join" -> (q12 _),
    "q13_string_funcs" -> (q13 _),
    "q14_agg_stats" -> (q14 _),
    "q15_rollup" -> (q15 _),
    "q16_star_join_revenue" -> (q16 _),
    "q17_json_props" -> (q17 _),
    "q18_tumbling_window" -> (q18 _),
    "q19_window_running" -> (q19 _),
    "q19b_cube" -> (q19b _),
    "q19c_pivot" -> (q19c _),
    "q19d_stats_percentiles" -> (q19d _))

  val oracles: Map[String, String] = Map(
    "q43_scd1_partitioned" -> q43Sql,
    "q101_merge_scd2" -> q101Sql,
    "q01_agg_pricing" -> q01Sql,
    "q02_flagship_pipeline" -> q02Sql,
    "q03_schema_conform" -> q03Sql,
    "q04_merge_insert_if_absent" -> q04Sql,
    "q05_merge_scd1" -> q05Sql,
    "q06_window_topk_per_group" -> q06Sql,
    "q07_dedup_exact" -> q07Sql,
    "q08_orderby_limit" -> q08Sql,
    "q09_datetime_formats" -> q09Sql,
    "q10_union_by_name" -> q10Sql,
    "q11_semi_join" -> q11Sql,
    "q12_anti_join" -> q12Sql,
    "q13_string_funcs" -> q13Sql,
    "q14_agg_stats" -> q14Sql,
    "q15_rollup" -> q15Sql,
    "q16_star_join_revenue" -> q16Sql,
    "q17_json_props" -> q17Sql,
    "q18_tumbling_window" -> q18Sql,
    "q19_window_running" -> q19Sql,
    "q19b_cube" -> q19bSql,
    "q19c_pivot" -> q19cSql,
    "q19d_stats_percentiles" -> q19dSql)
}
