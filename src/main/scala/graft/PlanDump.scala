package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 plan evidence for the ENGINE-level read changes, which
  * fixture queries hide behind their final `localCheckpoint`
  * (`graft.Explain` on those prints `Scan ExistingRDD`). Builds a
  * small versioned table and prints, side by side:
  *   1. the OLD read shape — `spark.read.schema(sc).parquet(files:_*)`
  *      over the manifest's files, which constructs an
  *      InMemoryFileIndex and re-LISTS every path per query;
  *   2. the NEW `Versioned.read` — the manifest-backed FileIndex
  *      ([[graft.lake.Versioned]] `manifestScan`), zero listing;
  *   3. `readPruned` and a deletion-vector read through the same path.
  * Output lands in plans/r18/ (see OPTIMIZATION_r18.md).
  *
  *   sbt "runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    import graft.lake.Versioned
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-plandump")
    try {
      val orders = queries.Q.t(spark, sfDir, "orders")
        .select("o_orderkey", "o_totalprice")
      val tbl = s"$tmp/table"
      Versioned.commitWithStats(spark, tbl,
        orders.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      Versioned.commitWithStats(spark, tbl,
        orders.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1), "o_orderkey")
      Versioned.deleteWhereMor(spark, tbl, col("o_orderkey") % 11 === 0)

      println("\n========== lake_read_oldshape (spark.read over the " +
        "manifest's files — re-lists every path) ==========")
      val m = Versioned.read(spark, tbl) // schema source only
      val files = Versioned.manifestDataLines(spark, tbl,
        Versioned.latestVersion(spark, tbl).get)
        .map(l => s"$tbl/${l.takeWhile(_ != '\t')}")
      spark.read.schema(m.schema).parquet(files: _*).explain("formatted")

      println("\n========== lake_read (Versioned.read — manifest-backed " +
        "FileIndex, zero listing, DV anti-join) ==========")
      Versioned.read(spark, tbl).explain("formatted")

      println("\n========== lake_read_pruned (readPruned BETWEEN — " +
        "stats-pruned file set through the same index) ==========")
      val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(0) +
        (mm.getLong(1) - mm.getLong(0)) / 4)
      Versioned.readPruned(spark, tbl, "o_orderkey", lo, hi)
        .explain("formatted")
    } finally queries.Q.deleteRecursively(tmp)
    spark.stop()
  }
}
