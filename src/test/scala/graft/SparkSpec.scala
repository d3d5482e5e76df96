package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per suite; small
  * shuffle-partition count keeps tiny-data tests fast.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // plan-shape specs read PushedFilters out of plan strings; the
    // 100-char default truncates them mid-token (set ONCE here — a
    // per-test conf.set would leak into suites sharing this session)
    .config("spark.sql.maxMetadataStringLength", "4000")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // SparkSession is shared across suites in one JVM (sbt forks one
    // test JVM); don't stop it here or later suites fail.
    super.afterAll()
  }
}
