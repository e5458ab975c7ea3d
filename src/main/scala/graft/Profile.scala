package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler (round 18): runs named queries once and
  * prints a per-Spark-job wall-time breakdown, so a fixture query's
  * seconds can be attributed to their jobs (commit writes, stats
  * scans, streaming batches, the final count) instead of guessed at.
  * Not part of the driver contract — a human tool like Explain.
  *
  *   sbt "runMain graft.Profile q154_lake_stream_upsert"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  *      SPARK_GRAFT_REPS (default 2 — rep 1 warms codegen, last rep prints).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", queries.Q.scratchWarehouse())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // (jobId, description|callsite, submitted, completed)
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]
    val starts = new scala.collection.mutable.HashMap[Int, (String, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.synchronized {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(js.stageInfos.lastOption.map(_.name))
            .getOrElse("?")
          starts(js.jobId) = (desc, js.time)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(je.jobId).foreach { case (d, t0) =>
            jobs += ((je.jobId, d, t0, je.time))
          }
        }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 until reps).foreach { _ => fn(spark, sfDir).count() } // warm
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      val snap = jobs.synchronized(jobs.toVector)
      println(f"\n===== $name total=$dt%.3f s, jobs=${snap.size} =====")
      val byDesc = snap.groupBy(_._2).map { case (d, js) =>
        (d, js.size, js.map(j => j._4 - j._3).sum)
      }.toSeq.sortBy(-_._3)
      byDesc.foreach { case (d, n, ms) =>
        println(f"  ${ms / 1000.0}%7.3f s  n=$n%-4d $d")
      }
      val jobMs = snap.map(j => j._4 - j._3).sum
      println(f"  job wall sum=${jobMs / 1000.0}%.3f s " +
        f"(gaps/driver=${dt - jobMs / 1000.0}%.3f s)")
    }
    spark.stop()
  }
}
