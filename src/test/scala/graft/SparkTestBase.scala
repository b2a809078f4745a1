package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per suite, lazily). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      // GRAFT_TEST_CPUS: rerun the whole suite at a different parallelism
      // to flush partition-count-dependent assumptions
      .master(s"local[${sys.env.getOrElse("GRAFT_TEST_CPUS", "4")}]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_TEST_CPUS", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
