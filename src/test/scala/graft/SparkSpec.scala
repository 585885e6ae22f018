package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for the unit layer (SURVEY §5 item 1). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    Engine.session(master = "local[4]", shufflePartitions = 4, appName = "graft-test")

  override def afterAll(): Unit = {
    // shared across suites in one JVM — do not stop
    super.afterAll()
  }
}
