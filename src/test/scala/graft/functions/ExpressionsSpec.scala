package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.impl.{HashImpl, VectorImpl}

/** The Catalyst expressions produce kernel-identical results through
  * the DataFrame (whole-stage-codegen) path and are reachable from SQL
  * via GraftExtensions.
  */
class ExpressionsSpec extends SparkSpec {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private lazy val docs = spark.createDataFrame(Seq(
    (1L, "a b c d e f", Array(1.0f, 2.0f, 3.0f)),
    (2L, "a b c d e g", Array(3.0f, 2.0f, 1.0f)),
    (3L, "x", Array(0.0f, 0.0f, 0.0f))
  )).toDF("id", "text", "vec")

  test("minhash via DataFrame equals the kernel directly") {
    val rows = docs.select(col("id"),
      GraftFunctions.minhash(split(col("text"), " "), 16, 9L).as("sig"),
      split(col("text"), " ").as("toks")).collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](2)
      val expected = HashImpl.minhash(
        ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray), 16, 9L)
        .toLongArray().toSeq
      assert(r.getSeq[Long](1) == expected, s"row ${r.getLong(0)}")
    }
  }

  test("simhash + fingerprint via DataFrame equal the kernels") {
    val rows = docs.select(col("text"),
      GraftFunctions.simhash(split(col("text"), " ")).as("sim"),
      GraftFunctions.fingerprint(col("text"), 4).as("fp")).collect()
    rows.foreach { case Row(text: String, sim: Long, fp: Long) =>
      val toks = ArrayData.toArrayData(
        text.split(" ").map(UTF8String.fromString))
      assert(sim == HashImpl.simhash(toks))
      assert(fp == HashImpl.rollingFingerprint(UTF8String.fromString(text), 4))
    }
  }

  test("cosine/dot accept float arrays and match the kernels") {
    val r = docs.select(
      GraftFunctions.cosine(col("vec"), col("vec")).as("self"),
      GraftFunctions.dot(col("vec"), col("vec")).as("dd")).collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(r(0).getDouble(1) == 14.0)
    assert(r(2).getDouble(0) == 0.0) // zero vector → cosine 0
  }

  test("null inputs propagate nulls") {
    val withNull = docs.withColumn("t2",
      when(col("id") === 1, col("text")))
    val r = withNull.select(
      GraftFunctions.simhash(split(col("t2"), " ")).as("s"),
      GraftFunctions.fingerprint(col("t2"), 4).as("f")).collect()
    assert(!r(0).isNullAt(0) && !r(0).isNullAt(1))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("SQL surface via GraftExtensions") {
    docs.createOrReplaceTempView("exprspec_docs")
    val out = spark.sql(
      """SELECT graft_simhash(split(text, ' ')) AS sim,
        |       graft_cosine(vec, vec) AS cs,
        |       graft_minhash(split(text, ' '), 8, 1) AS mh,
        |       graft_fingerprint(text, 4) AS fp,
        |       graft_lsh_bucket(vec, 8) AS bk
        |FROM exprspec_docs WHERE id = 1""".stripMargin).collect()
    assert(out.length == 1)
    assert(out(0).getSeq[Long](2).length == 8)
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-12)
  }

  test("expressions stay inside whole-stage codegen") {
    // a file-backed scan (local relations get constant-folded away)
    val d = graft.tables.Tables.documents(spark, sfDir)
    val plan = d.select(
      GraftFunctions.fingerprint(col("text"), 8).as("f"),
      GraftFunctions.simhash(split(col("text"), " ")).as("s"))
      .queryExecution.executedPlan
    // the `*(n)` prefix marks a WholeStageCodegen stage in the simple
    // plan string; also assert the scan pruned down to the text column
    assert(plan.toString.startsWith("*("),
      s"expected a WholeStageCodegen stage in:\n$plan")
    assert(plan.toString.contains("ReadSchema: struct<text:string>"),
      s"expected column-pruned scan in:\n$plan")
  }

  test("denseNormalize via DataFrame equals the kernel, handles edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0L, 2L, 0L), Seq(3.0, 4.0, 1.0)),     // bucket 0 accumulates
      (2L, Seq(5L, -1L, 99L), Seq(7.0, 9.0, 9.0)),   // out-of-range ignored
      (3L, Seq.empty[Long], Seq.empty[Double])        // zero vector stays zero
    ).toDF("id", "bs", "ws")
    val rows = df.select(col("id"),
      GraftFunctions.denseNormalize(col("bs"), col("ws"), 8).as("v"))
      .orderBy("id").collect()
    val v1 = rows(0).getSeq[Float](1)
    assert(v1.length == 8)
    // entries: bucket0 = 3+1 = 4, bucket2 = 4 → norm = sqrt(32)
    assert(math.abs(v1(0) - (4.0 / math.sqrt(32))) < 1e-6)
    assert(math.abs(v1(2) - (4.0 / math.sqrt(32))) < 1e-6)
    assert(v1(1) == 0.0f)
    val v2 = rows(1).getSeq[Float](1)
    assert(math.abs(v2(5) - 1.0) < 1e-6 && v2.count(_ != 0f) == 1)
    assert(rows(2).getSeq[Float](1).forall(_ == 0.0f))
    // kernel parity
    val direct = VectorImpl.denseNormalize(
      ArrayData.toArrayData(Array(0L, 2L, 0L)),
      ArrayData.toArrayData(Array(3.0, 4.0, 1.0)), 8)
    assert((0 until 8).forall(i => direct.getFloat(i) == v1(i)))
  }

  test("lshBucket via DataFrame equals the kernel") {
    val r = docs.filter(col("id") === 1).select(
      GraftFunctions.lshBucket(col("vec"), 12, 5L)).collect()
    val expected = VectorImpl.hyperplaneBucket(
      ArrayData.toArrayData(Array(1.0, 2.0, 3.0)), 12, 5L)
    assert(r(0).getLong(0) == expected)
  }
}
