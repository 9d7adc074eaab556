package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one SparkSession per suite, tuned like production. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local(cores = 4, appName = getClass.getSimpleName)
  val sf: String = "/root/testdata/sf0.001"
}
