package graft.tables

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the whole driver-testdata contract, not just events.ts
  * ([[TablesContractSpec]]): every table the queries read must load with
  * the columns and type *shapes* they rely on. The harness regenerates
  * `/root/testdata` between rounds and has already changed a physical
  * type once (round 9's TIMESTAMP unit swap, 77 queries down) — this
  * spec makes the next schema drift one red test naming the table and
  * column instead of dozens of opaque analysis errors at driver time.
  *
  * Pins are deliberately as loose as the code: exact types where
  * operators depend on them (join keys, text, vectors), "any temporal"
  * where the SQL tolerates date/timestamp variants.
  */
class TestdataContractSpec extends SparkSpec {

  private def temporal(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  private def integral(dt: DataType): Boolean = dt match {
    case IntegerType | LongType => true
    case _ => false
  }

  private def check(table: String, cols: (String, DataType => Boolean)*): Unit = {
    val df = Tables.load(spark, sfDir, table)
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach { case (name, ok) =>
      assert(have.contains(name), s"$table: required column $name missing " +
        s"(has: ${have.keys.toSeq.sorted.mkString(", ")})")
      assert(ok(have(name)), s"$table.$name: unexpected type ${have(name)}")
    }
  }

  test("TPC-H tables carry the columns and type shapes the queries join on") {
    check("region", "r_regionkey" -> integral, "r_name" -> (_ == StringType))
    check("nation", "n_nationkey" -> integral, "n_name" -> (_ == StringType),
      "n_regionkey" -> integral)
    check("customer", "c_custkey" -> integral, "c_name" -> (_ == StringType),
      "c_nationkey" -> integral, "c_acctbal" -> (_ == DoubleType),
      "c_mktsegment" -> (_ == StringType))
    check("supplier", "s_suppkey" -> integral, "s_nationkey" -> integral,
      "s_acctbal" -> (_ == DoubleType))
    check("part", "p_partkey" -> integral, "p_type" -> (_ == StringType),
      "p_size" -> integral, "p_retailprice" -> (_ == DoubleType))
    check("orders", "o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> (_ == StringType), "o_totalprice" -> (_ == DoubleType),
      "o_orderdate" -> temporal, "o_orderpriority" -> (_ == StringType))
    check("lineitem", "l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_quantity" -> (_ == DoubleType),
      "l_extendedprice" -> (_ == DoubleType), "l_discount" -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType), "l_shipdate" -> temporal)
  }

  test("events loads through Tables.events with the series-family shape") {
    // raw required columns (unit-agnostic — normalizeEventsTs dispatches)
    check("events", "event_id" -> integral, "user_id" -> integral,
      "event_type" -> (_ == StringType), "value" -> (_ == DoubleType),
      "props" -> (_ == StringType))
    // and the normalized contract the whole ts face builds on
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)
  }

  test("documents and embeddings carry the curation-tier shapes") {
    check("documents", "doc_id" -> integral, "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> integral)
    val emb = Tables.embeddings(spark, sfDir).schema
    assert(emb.fields.exists(_.name == "vec_id"), "embeddings.vec_id missing")
    assert(integral(emb("vec_id").dataType))
    emb("embedding").dataType match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case other => fail(s"embeddings.embedding must be array<float|double>, got $other")
    }
  }

  test("documents corpus is pure ASCII (txt_fingerprint oracle precondition)") {
    // the fingerprint/simhash DuckDB oracle equates UTF-16 units (fp
    // kernel), UTF-8 bytes (fnv64 kernel), and SQL code points — an
    // identity that holds exactly on ASCII. If the generator ever emits
    // non-ASCII text (e.g. CJK zh docs), this names the break instead of
    // an opaque hash mismatch in CORRECTNESS_r{N}.json.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII text; the txt_fingerprint " +
        "oracle's char=byte=codepoint identity no longer holds")
  }
}
