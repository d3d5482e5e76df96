package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}

/** Incremental result consumption — the facade analogue of the
  * reference's batched Execute()/ResultSet paging loop
  * (query/executor/executor.go:184-274; query/executor/resultset.go:16-28),
  * where a caller repeatedly pulls maxRows-sized ResultSet pages until
  * the executor is drained.
  *
  * Spark-first translation: `toLocalIterator()` streams the result to
  * the driver ONE PARTITION AT A TIME (never a full `collect()`), and
  * the pager re-chunks that stream into fixed-size pages. Driver
  * memory is bounded by one partition + one page regardless of result
  * size; each partition is fetched lazily as the iterator reaches it.
  */
final class ResultPager private (df: DataFrame, val pageSize: Int)
    extends Iterator[Seq[Row]] {
  private val rows = df.toLocalIterator().asScala

  override def hasNext: Boolean = rows.hasNext

  /** The next page: `pageSize` rows, or fewer on the final page. */
  override def next(): Seq[Row] = {
    if (!hasNext) throw new NoSuchElementException("result set drained")
    val page = Vector.newBuilder[Row]
    var n = 0
    while (n < pageSize && rows.hasNext) { page += rows.next(); n += 1 }
    page.result()
  }
}

object ResultPager {
  def apply(df: DataFrame, pageSize: Int = 1000): ResultPager = {
    require(pageSize > 0, "pageSize must be positive")
    new ResultPager(df, pageSize)
  }
}
