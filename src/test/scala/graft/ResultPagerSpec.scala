package graft

/** Pins the batched result-consumption facade (the reference's
  * Execute()/ResultSet paging loop, executor.go:184-274).
  */
class ResultPagerSpec extends SparkSpec {

  test("pages a 10k-row result in 1k batches preserving order") {
    val df = spark.range(10000).toDF("id").orderBy("id")
    val pages = ResultPager(df, 1000).toVector
    assert(pages.length == 10)
    assert(pages.forall(_.length == 1000))
    assert(pages.flatten.map(_.getLong(0)) == (0L until 10000L).toVector)
  }

  test("final partial page, empty result, bad page size") {
    val pages = ResultPager(spark.range(2500).toDF("id").orderBy("id"), 1000).toVector
    assert(pages.map(_.length) == Vector(1000, 1000, 500))
    assert(ResultPager(spark.range(0).toDF("id"), 10).toVector.isEmpty)
    intercept[IllegalArgumentException](ResultPager(spark.range(1).toDF("id"), 0))
  }
}
