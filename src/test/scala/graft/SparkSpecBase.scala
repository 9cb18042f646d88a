package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite; sf0.001 for speed. */
abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, getClass.getSimpleName)
  val sfDir = "/root/testdata/sf0.001"
}
