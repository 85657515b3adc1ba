package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for suites (one per JVM — local[4], UTC, AQE on). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      // The plan-shape suites pin AT-SCALE contracts, where the
      // Spread scan-parallelism heal is a footer-guarded structural
      // no-op (row groups >= cores/2) — so it is off here and its
      // local firing behavior (guard verdicts, result equality, the
      // reused exchange) is owned by SpreadSpec, which re-enables it
      // per test.
      .config(Spread.EnabledConf, "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf(dir: String): String = s"/root/testdata/$dir"
}
