package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM under Test/fork). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .getOrCreate()

  graft.functions.Native.register(spark)

  def scratch(name: String): String = {
    val dir = s"/root/repo/target/testtmp/$name-${System.nanoTime()}"
    new java.io.File(dir).getParentFile.mkdirs()
    dir
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
