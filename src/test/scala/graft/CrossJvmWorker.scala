package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM append worker for CrossJvmCommitSpec: a SECOND Spark
  * process committing to the same local-filesystem table as the
  * in-process suite writer — the multi-`spark-submit` shape the
  * hard-link CAS ([[graft.lake.Versioned.LinkCasStore]]) exists for.
  *
  * Protocol (file-based, so the two JVMs genuinely overlap instead of
  * serializing on process startup): boot a session, drop
  * `.worker_ready` beside the table, wait for the spec's `.go`, then
  * append `n` single-row commits as fast as the CAS allows and print
  * `WORKER_OK`.
  */
object CrossJvmWorker {
  def main(args: Array[String]): Unit = {
    val Array(dir, nStr) = args.take(2)
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-crossjvm-worker")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-cjw-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val ready = java.nio.file.Paths.get(dir, ".worker_ready")
      val go = java.nio.file.Paths.get(dir, ".go")
      java.nio.file.Files.createFile(ready)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(go)) {
        if (System.nanoTime() > deadline)
          throw new IllegalStateException("spec never signalled .go")
        Thread.sleep(20)
      }
      for (i <- 0 until n)
        graft.lake.Versioned.commit(spark, dir,
          Seq((1000L + i, "worker")).toDF("id", "src"))
      // stdout marker the spec greps for — reached only if every
      // commit published (a lost-forever race would have thrown)
      println("WORKER_OK")
    } finally spark.stop()
    sys.exit(0)
  }
}
