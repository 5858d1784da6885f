package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, forked by sbt). */
object TestSpark {
  // 2 attempts per task so fault-injection specs can exercise retries
  lazy val spark: SparkSession = GraftSession.local("4", "graft-test", maxTaskFailures = 2)
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
