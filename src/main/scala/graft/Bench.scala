package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Methodology (round 3, per the round-2 review's
  * "re-bench honestly: n≥3 interleaved runs"): the FULL query suite runs
  * `SPARK_GRAFT_REPS` times (default 3) in sorted-name order, interleaved
  * — run 1 of every query, then run 2 of every query, ... — and each
  * query reports its minimum across runs. Interleaved minima measure the
  * steady-state plan cost (what scales to 100 TB) instead of one-shot
  * codegen/JIT compilation noise, which at sf0.1 is 2-4× the actual query
  * time and reshuffles whenever the suite order changes. Per-run totals
  * are also emitted (`run_totals`) so single-shot numbers stay visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // SPARK_GRAFT_INIT_PARTS: AQE coalescePartitions.initialPartitionNum
      // probe knob (see README round-10 partition-sizing probe). Default =
      // shuffle partitions, i.e. exactly the historical behavior.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", cpus))
      // pinned like Verify/tests: the NTZ→TIMESTAMP load normalization
      // (Q.normalizeTs) casts wall-clock through the session zone
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // per-run scratch warehouse: concurrent Verify/Bench/Stress JVMs
      // must not drop each other's managed-table fixtures
      .config("spark.sql.warehouse.dir", queries.Q.scratchWarehouse())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/scheduler once so the first measured query
    // doesn't absorb session startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Optional focus filter for local iteration: comma-separated query-name
    // substrings. Unset (the driver's path) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .toSeq.sortBy(_._1)
    // A failing query is recorded, not swallowed (round-3 review: "a
    // bench that can't fail is not a bench"): its time reports as the
    // sentinel -1, its message lands in `errors`, and the exit code is
    // non-zero — so a broken query can never hide inside a fast total.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_TRACE=1: per-rep per-query times to stderr, for chasing
    // warmup-rep variance locally (run_totals only shows the sum).
    val trace = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
    val runs = (1 to reps).map { rep =>
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors.getOrElseUpdate(name,
              (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
                .replaceAll("[\"\\n\\r\\\\]", " ").take(300))
            false
          }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        if (trace) System.err.println(f"TRACE rep=$rep $name%-28s $dt%8.3f s")
        name -> dt
      }
    }
    val best = selected.map { case (name, _) =>
      val ts = runs.map(_.toMap.apply(name))
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min) }
    // The driver keeps only the LAST 2000 chars of output, and sbt appends
    // a trailing "[success] Total time..." line (~80 chars) after ours. At
    // 63+ queries even a 3-decimal full-name line is ~1950 chars — round 6
    // still landed "parsed": null. So the printed line uses SHORT query ids
    // (the `qNN`/`qNNx` prefix before the first underscore: "q01", "q19b",
    // "q24c" — unique across the suite) at 3 decimals (~980 chars, ~900
    // chars of headroom for future rounds). The full-name map goes to
    // stderr for humans.
    def shortId(name: String): String = name.takeWhile(_ != '_')
    require(best.map { case (k, _) => shortId(k) }.distinct.size == best.size,
      "short query ids collide; bench line would drop a query")
    val qs = best.map { case (k, v) => f""""${shortId(k)}":$v%.3f""" }
      .mkString("{", ",", "}")
    System.err.println(best.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("full_queries={", ",", "}"))
    // Per-query rep dispersion (stderr, humans only): CoV = stddev/mean
    // of the reps. This pins the noise band sub-second queries live in —
    // a cross-round "regression" smaller than this band is rep noise,
    // not a plan change (the round-9 verdict's q61 case). Summary
    // percentiles keep it one line; per-query CoV rides TRACE mode.
    val covs = selected.flatMap { case (name, _) =>
      val ts = runs.map(_.toMap.apply(name)).filter(_ >= 0)
      if (ts.size < 2) None else {
        val m = ts.sum / ts.size
        val sd = math.sqrt(ts.map(t => (t - m) * (t - m)).sum / (ts.size - 1))
        if (m <= 0) None else Some(name -> sd / m)
      }
    }
    if (covs.nonEmpty) {
      val sorted = covs.map(_._2).sorted
      // nearest-rank: index ⌈p·n⌉ − 1 (floor(p·n) is biased one rank
      // HIGH for small/even n — e.g. n=2 would report the max as the
      // median, widening the printed noise band)
      def pct(p: Double) = sorted(math.min(sorted.size - 1,
        math.max(0, math.ceil(p * sorted.size).toInt - 1)))
      System.err.println(
        f"""rep_cov={"n":${sorted.size},"median":${pct(0.5)}%.3f,""" +
          f""""p90":${pct(0.9)}%.3f,"max":${sorted.last}%.3f}""")
      if (trace) covs.sortBy(-_._2).take(15).foreach { case (n, c) =>
        System.err.println(f"TRACE cov $n%-28s $c%6.3f") }
    }
    val runTotals = runs.map(_.map(_._2).filter(_ >= 0).sum)
      .map(t => f"$t%.3f").mkString("[", ",", "]")
    val total = best.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"reps":$reps,"errors":$errJson,"sf":"$sfDir"}"""
    // end-of-run janitor (outside the timed region): managed-table churn
    // from q43/q101-family queries must not accumulate across rounds
    try {
      graft.warehouse.Warehouse.dropGraftDatabases(spark)
      graft.warehouse.Warehouse.sweepOrphanGraftDirs(spark)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warehouse cleanup failed: ${e.getMessage}")
    }
    // Stop Spark BEFORE printing: executor/DAGScheduler shutdown warnings
    // must not land after the JSON line and eat the tail window.
    spark.stop()
    // run_totals (per-rep sums incl. warmup variance) go to stderr — info
    // for humans chasing rep noise, not part of the parsed metric line.
    System.err.println(s"run_totals=$runTotals")
    println(line)
    if (errors.nonEmpty) sys.exit(1)
  }
}
