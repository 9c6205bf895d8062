package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites; mirrors the Verify/Bench
  * session config (UTC, nanosAsLong for the events fixture). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // same Sessions.local base as the three driver mains, so the config
    // the suites exercise IS the config the graded runs use
    val s = graft.Sessions.local("4")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
