package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs: one JVM-wide session (getOrCreate),
  * UTC, small shuffle partitions, nanos handling on. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sqlImplicits: org.apache.spark.sql.SQLImplicits = spark.implicits

  /** Driver-testdata root, overridable for the regeneration drill
    * (`SPARK_GRAFT_TESTDATA=/tmp/variant sbt test` must stay green on a
    * freshly regenerated corpus — the r8→r9 lesson institutionalized).
    * Every spec that reads driver testdata goes through [[sfDir]]. */
  lazy val testdataRoot: String = sys.env.get("SPARK_GRAFT_TESTDATA")
    .orElse(sys.props.get("graft.testdata"))
    .getOrElse("/root/testdata")

  /** `sfDir("0.001")` → `<root>/sf0.001`. */
  def sfDir(sf: String): String = s"$testdataRoot/sf$sf"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
