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

  def tmpDir(): String =
    rmOnExit(java.nio.file.Files.createTempDirectory("graft-test-")
      .toAbsolutePath.toString)
}
