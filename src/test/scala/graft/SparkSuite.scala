package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (SURVEY.md §5.2 determinism
  * hygiene: UTC, fixed shuffle partitions).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-warehouse-${java.util.UUID.randomUUID()}")
    .getOrCreate()

  def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-test-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }
}
