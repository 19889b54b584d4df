package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (same config surface as the driver's
  * Verify/Bench sessions, smaller parallelism for test speed). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.install(
    GraftSession.builder("local[4]", 4)
      .appName("graft-test").getOrCreate())

  val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = { /* shared across suites; do not stop */ }

  def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)
}
