package graft.examples

import org.apache.spark.sql.SparkSession

/** Scratch probe (round 15): raw parquet-footer read throughput over a
  * directory tree — isolates the cost of compact()'s footer-count
  * verification from its rewrite.
  */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.get
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath.toString
    }
    println(s"[fprobe] files: ${buf.length}")
    val t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    import scala.jdk.CollectionConverters._
    val tasks: java.util.List[java.util.concurrent.Callable[Long]] =
      buf.toSeq.map[java.util.concurrent.Callable[Long]] { f => () =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.asJava
    val total = pool.invokeAll(tasks).asScala.map(_.get()).sum
    pool.shutdown()
    println(f"[fprobe] rows=$total footers in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
