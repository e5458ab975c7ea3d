package graft

/** The failure contract of the correctness dump: a query that fails to
  * RUN must surface in `_errors.json` AND flip the exit code — never
  * just vanish from the artifact set (the round-8 silent-absence hole).
  */
class VerifySpec extends SparkSuite {

  test("a crashing query lands in _errors.json and rc is non-zero") {
    val out = tmpDir()
    // a nonexistent sf dir makes the selected query throw at read time —
    // the same failure mode as a schema drift the loader rejects
    val rc = Verify.run(spark, "/nonexistent-testdata", out,
      only = Some(Seq("q01_agg_pricing")))
    assert(rc != 0, "Verify.run must return non-zero when a query fails")
    val errs = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_errors.json"))
    assert(errs.contains("q01_agg_pricing"), errs.take(300))
    // oracle_sql.json still written: the driver can always see what WAS
    // declared, so a crash can't be confused with non-registration
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")))
  }

  test("a clean run writes an empty _errors.json and rc 0") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/testdata/sf0.001")))
    val out = tmpDir()
    val rc = Verify.run(spark, "/root/testdata/sf0.001", out,
      only = Some(Seq("q01_agg_pricing")))
    assert(rc == 0)
    val errs = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_errors.json"))
    assert(errs == "{}", errs.take(300))
  }

  test("copyTableFiles flattens both table layouts into the target dir") {
    import java.nio.file.Paths
    import graft.queries.Q
    import spark.implicits._
    val src = tmpDir()
    // Spark-written directory layout (multiple part files)
    Seq(1L, 2L, 3L, 4L).toDF("id").repartition(2)
      .write.parquet(s"$src/t.parquet")
    val dstDir = tmpDir()
    Q.copyTableFiles(Paths.get(s"$src/t.parquet"), Paths.get(dstDir))
    // parts land FLAT at the top level, readable by a non-recursive scan
    assert(spark.read.parquet(dstDir).count() == 4)
    // single-file layout (the driver testdata shape)
    val one = tmpDir()
    Seq(5L, 6L).toDF("id").coalesce(1).write.parquet(s"$src/one.parquet")
    val part = {
      val st = java.nio.file.Files.list(Paths.get(s"$src/one.parquet"))
      try st.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      finally st.close()
    }
    Q.copyTableFiles(part, Paths.get(one))
    assert(spark.read.parquet(one).count() == 2)
  }
}
