package graft

import org.apache.spark.sql.functions._

import graft.lake.Versioned

/** Cross-PROCESS commit safety of the versioned lake: two JVMs (this
  * suite + a forked [[CrossJvmWorker]]) racing appends on the same
  * local-filesystem table. Round 11's exists+rename CAS was honest
  * about being single-JVM on local FS (rename(2) silently overwrites;
  * the mutex was a JVM lock); the hard-link CAS
  * ([[Versioned.LinkCasStore]]) moves the mutual exclusion into the
  * kernel — `link(2)` fails EEXIST atomically for ANY concurrent
  * creator — so this spec can demand the full multi-writer contract
  * across processes: every commit from both writers lands exactly
  * once, versions are contiguous, and no manifest was ever
  * overwritten (every version's append is still present at head).
  */
class CrossJvmCommitSpec extends SparkSuite {
  import spark.implicits._

  private def codeSrc(c: Class[_]): String =
    new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI)
      .getAbsolutePath

  /** Worker classpath from code sources, not sbt's internal loaders:
    * graft main classes, this test tree, the scala library, and the
    * directory of Spark jars (wildcard). */
  private def workerClasspath: String = {
    val sparkJar = codeSrc(classOf[org.apache.spark.sql.SparkSession])
    Seq(
      codeSrc(Versioned.getClass),
      codeSrc(getClass),
      codeSrc(classOf[scala.Option[_]]),
      new java.io.File(sparkJar).getParent + "/*"
    ).distinct.mkString(java.io.File.pathSeparator)
  }

  test("two JVMs racing appends on one local-FS table: every commit " +
      "lands exactly once, versions contiguous, no manifest overwritten") {
    val dir = tmpDir() + "/xjvm"
    val n = 5
    Versioned.commit(spark, dir, Seq((0L, "base")).toDF("id", "src"))
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val pb = new ProcessBuilder(javaBin, "-Xmx1g",
      "--add-opens=java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
      "--add-opens=java.base/java.io=ALL-UNNAMED",
      "--add-opens=java.base/java.net=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "--add-opens=java.base/java.util=ALL-UNNAMED",
      "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
      "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
      "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
      "-cp", workerClasspath, "graft.CrossJvmWorker", dir, n.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outBuf = new StringBuilder
    val drain = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      var l = br.readLine()
      while (l != null) { outBuf.append(l).append('\n'); l = br.readLine() }
    })
    drain.start()
    try {
      // rendezvous: wait for the worker's session to be up, THEN both
      // writers commit concurrently — without this the fork's ~15 s
      // boot would serialize the two loops and race nothing
      val ready = java.nio.file.Paths.get(dir, ".worker_ready")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(ready)) {
        assert(proc.isAlive, s"worker died during boot:\n$outBuf")
        assert(System.nanoTime() < deadline, "worker never became ready")
        Thread.sleep(50)
      }
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(dir, ".go"))
      for (i <- 0 until n)
        Versioned.commit(spark, dir,
          Seq((2000L + i, "local")).toDF("id", "src"))
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"worker did not finish:\n$outBuf")
    } finally { proc.destroyForcibly(); () }
    drain.join(10000)
    assert(proc.exitValue() == 0 && outBuf.toString.contains("WORKER_OK"),
      s"worker failed (rc=${proc.exitValue()}):\n$outBuf")
    // both writers' rows present EXACTLY once
    val got = Versioned.read(spark, dir).as[(Long, String)]
      .collect().toSeq
    assert(got.size == got.distinct.size, "a commit landed twice")
    assert(got.toSet ==
      (Set((0L, "base")) ++
        (0 until n).map(i => (1000L + i, "worker")) ++
        (0 until n).map(i => (2000L + i, "local"))),
      s"lost or phantom commits: ${got.sorted}")
    // contiguous versions: base + n + n appends, none overwritten —
    // every version reads as a strict superset of its parent
    assert(Versioned.latestVersion(spark, dir).contains(2 * n))
    val sizes = (0 to 2 * n)
      .map(v => Versioned.read(spark, dir, Some(v)).count())
    assert(sizes == (1L to (2L * n + 1L)),
      s"version row counts not strictly growing: $sizes — " +
        "an append overwrote another's manifest")
  }
}
