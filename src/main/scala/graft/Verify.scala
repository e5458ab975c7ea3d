package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure contract (matches Bench): a query that fails to RUN is loud,
  * not merely absent — round 8's CORRECTNESS file read 130/130 while 6
  * registered queries crashed, because a crash left no row and absence
  * looked like "not declared". Failures land in `_errors.json` beside
  * `oracle_sql.json` and the exit code is non-zero.
  */
object Verify {
  /** The dump pass, separated from [[main]]'s `sys.exit` so VerifySpec
    * can drive the failure contract in-JVM. Returns the intended exit
    * code (0 = every selected query dumped).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Seq[String]]): Int = {
    def selected(name: String) = only.forall(_.exists(name.contains))
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try {
          val df = fn(spark, sfDir)
          // The dump encoding is part of the oracle contract: DuckDB/
          // pandas read INT96 as NAIVE wall-clock timestamps, matching
          // the oracle's own arithmetic. Lake fixtures pin the ENGINE's
          // staged files to INT64 TIMESTAMP_MICROS (Versioned.stage,
          // sticky session conf — footer stats + pushdown need it);
          // that must not bleed into the dump files, so re-pin the
          // dump's own encoding after the fixture has run.
          spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
          df.coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }
        catch { case e: Throwable =>
          errors(name) =
            e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v.take(300))}" }
        .mkString("{", ",", "}"))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    // end-of-run janitor: drop this run's graft databases and sweep
    // prior runs' orphaned spark-warehouse dirs so repeated rounds
    // can't accumulate managed-table churn on disk
    try {
      graft.warehouse.Warehouse.dropGraftDatabases(spark)
      graft.warehouse.Warehouse.sweepOrphanGraftDirs(spark)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] warehouse cleanup failed: ${e.getMessage}")
    }
    if (errors.nonEmpty) 1 else 0
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name substrings — verify only
    // matching queries (local iteration; the driver always passes 2)
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).headOption.map(_.split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // per-run scratch warehouse: concurrent Verify/Bench/Stress JVMs
      // must not drop each other's managed-table fixtures
      .config("spark.sql.warehouse.dir", queries.Q.scratchWarehouse())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rc = run(spark, sfDir, outDir, only)
    spark.stop()
    if (rc != 0) sys.exit(rc)
  }
}
