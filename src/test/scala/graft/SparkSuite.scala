package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (SURVEY.md §5.2 determinism
  * hygiene: UTC, fixed shuffle partitions). Every temp path a suite
  * creates — including the session warehouse — is removed recursively on
  * JVM exit (`File.deleteOnExit` alone silently leaks non-empty dirs).
  */
trait SparkSuite extends AnyFunSuite {
  private def rmOnExit(path: String): String = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(path))))
    path
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      rmOnExit(s"/tmp/graft-warehouse-${java.util.UUID.randomUUID()}"))
    .getOrCreate()

  /** A FRESH session with the graft extensions + catalog registered
    * — the SQL-front-door fixture shared by every catalog suite
    * (previously copy-pasted per suite, drifting independently). The
    * suite's default session is parked and restored; `f` receives
    * the new session and its warehouse dir. `extraConf` tunes the
    * session (e.g. tiny AQE sizes for multi-file fixtures). */
  def withCatalogSession[A](extraConf: Map[String, String] = Map.empty)(
      f: (SparkSession, String) => A): A = {
    spark // force the shared suite session first
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = tmpDir() + "/wh"
    val b = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft",
        classOf[graft.sql.GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", wh)
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val ext = b.getOrCreate()
    try f(ext, wh)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }

  def withCatalogSession[A](f: (SparkSession, String) => A): A =
    withCatalogSession()(f)

  def tmpDir(): String =
    rmOnExit(java.nio.file.Files.createTempDirectory("graft-test-")
      .toAbsolutePath.toString)

  /** One version's manifest lines with the per-run noise normalized
    * away — commit-scoped UUID file names and wall-clock `#ts`
    * instants — so twin tables written through different drivers
    * (SQL vs Scala API) can be compared line-for-line. Shared here
    * because every new manifest header must update this normalizer
    * exactly once, not once per suite. */
  def normalizedManifest(dir: String, v: Int): Seq[String] =
    graft.lake.Versioned.manifestSnapshot(spark, dir, v).map(
      _.replaceAll("data/c-[0-9a-f-]+/[^\t]+", "<file>")
        .replaceAll("^#ts\t\\d+$", "#ts\t<instant>")
        .replaceAll("^#commituuid\t.*$", "#commituuid\t<uuid>")
        // byte sizes track parquet encoding details, not semantics
        .replaceAll("\t~b\\d+", "\t~b<size>")).sorted
}
