package graft.boostql

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** End-to-end fuzz of the dialect's ERROR SURFACE: every generated
  * query — syntactically well-formed by construction, semantically
  * arbitrary (aggregate/window mixes, ungrouped bare fields, FILL on
  * non-bucket keys, quantifiers, sketch params…) — must either compile
  * and execute, or refuse with the dialect's own exceptions
  * (ParseException / CompileException). A raw Spark AnalysisException
  * (or anything else) escaping means a validation hole: the user typed
  * SQL and got an internal stack trace instead of a dialect error.
  */
object CompileFuzzProps extends Properties("boostql.compilefuzz") {

  private lazy val spark = new SparkSpec {}.spark
  private lazy val fam: DataFrame = {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    val rows = for {
      s <- Seq("cpu", "mem"); i <- 0 until 40
    } yield (s, new Timestamp(1704067200000L + i * 977000L + s.length),
      i * 1.5 + s.length, s"h${i % 3}")
    spark.createDataFrame(rows).toDF("series", "ts", "value", "h")
      .withColumn("attributes", map(lit("host"), col("h"))).drop("h")
      .withColumn("tags", map().cast("map<string,string>"))
  }

  private val scalarItem: Gen[String] = Gen.oneOf(
    "cpu", "mem", "cpu.host", "cpu + mem", "upper(cpu.host)",
    "CAST(cpu AS int)", "bucket(ts, '1 hour')", "hour(ts)",
    "CASE WHEN cpu > 10.0 THEN mem END", "ts")
  private val aggItem: Gen[String] = Gen.oneOf(
    "count(*)", "sum(cpu)", "avg(cpu + mem)", "mad(cpu)", "twa(cpu)",
    "increase(cpu)", "median(mem)", "percentile(cpu, 0.5)",
    "approx_top_k(cpu.host, 4)", "first(cpu)", "corr(cpu, mem)",
    "histogram(cpu, 0, 100, 4)", "stddev(mem)",
    "arg_max(cpu.host, cpu)", "min_by(mem, ts)",
    "arg_min(cpu, mem + 1.0) FILTER (WHERE mem > 4.0)",
    "string_agg(cpu.host, ',')", "bool_and(cpu < 50.0)",
    "bool_or(cpu.host = 'h1')", "count_if(mem > cpu)",
    "regr_slope(mem, cpu)", "regr_r2(mem, cpu)",
    "regr_count(mem, cpu)")
  private val winItem: Gen[String] = Gen.oneOf(
    "rank() OVER (ORDER BY cpu)",
    "lag(cpu, 1) OVER (PARTITION BY cpu.host ORDER BY cpu)",
    "avg(mem) OVER (ORDER BY cpu ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
    "rate(cpu)", "locf(mem)", "zscore(cpu)",
    "holt(cpu, 0.5, 0.25)", "holt_forecast(mem, 1, 0)",
    "rank() OVER w", "sum(cpu) OVER w")

  private val item: Gen[String] = Gen.frequency(
    5 -> scalarItem, 3 -> aggItem, 2 -> winItem)

  private val queryGen: Gen[String] = for {
    n     <- Gen.choose(1, 3)
    items <- Gen.listOfN(n, item)
    withAliases = items.zipWithIndex.map { case (it, i) =>
      // bare 1-part fields keep their name; everything else aliased
      if (it.matches("[a-z_.]+") && !it.contains("(")) it else s"$it AS c$i"
    }
    source <- Gen.frequency(
      6 -> Gen.const(" FROM dom.f"),
      1 -> Gen.const(" FROM dom.f AS a JOIN dom.f AS b " +
        "ON a.cpu.host = b.mem.host"),
      1 -> Gen.const(" FROM dom.f AS a ASOF JOIN dom.f AS b " +
        "ON a.cpu.host = b.mem.host WITHIN '1 hour'"),
      1 -> Gen.const(" FROM (SELECT ts, cpu AS v, cpu.host AS h " +
        "FROM dom.f WHERE cpu > 3.0) AS t"),
      1 -> Gen.const(" FROM dom.f, dom.g"))
    where <- Gen.oneOf("", " WHERE cpu > 5.0", " WHERE cpu > ALL " +
      "(SELECT mem FROM dom.f)", " WHERE cpu.host IN ('h0', 'h1')",
      " WHERE NOT (mem < ANY (SELECT cpu FROM dom.f WHERE cpu > 20.0))",
      " WHERE EXISTS (SELECT mem FROM dom.f WHERE mem > 50.0)",
      " WHERE cpu > (SELECT avg(mem) FROM dom.f)")
    group <- Gen.oneOf("", " GROUP BY cpu.host", " GROUP BY ALL",
      " GROUP BY bucket(ts, '1 hour')",
      " GROUP BY cpu.host FILL(previous)",
      " GROUP BY bucket(ts, '2 hours', '1 hour')",
      " GROUP BY ROLLUP (cpu.host)")
    having <- Gen.frequency(4 -> Gen.const(""),
      1 -> Gen.const(" HAVING count(*) > 1"),
      1 -> Gen.const(" HAVING sum(cpu) > 10.0"))
    qualify <- Gen.frequency(5 -> Gen.const(""),
      1 -> Gen.const(" QUALIFY rank() OVER (ORDER BY cpu) <= 2"))
    // a WINDOW clause defining w half the time — `OVER w` items hit
    // both the defined path and the undefined-name refusal
    window <- Gen.oneOf("", " WINDOW w AS (PARTITION BY cpu.host " +
      "ORDER BY cpu DESC)", " WINDOW w AS (ORDER BY ts " +
      "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)")
    order <- Gen.oneOf("", " ORDER BY 1", " ORDER BY ALL DESC",
      " ORDER BY cpu NULLS LAST")
    limit <- Gen.oneOf("", " LIMIT 5", " LIMIT 5 OFFSET 2")
    dist  <- Gen.oneOf("", "DISTINCT ", "DISTINCT ON (cpu.host) ")
    setop <- Gen.frequency(6 -> Gen.const(""),
      1 -> Gen.const(" UNION ALL SELECT mem FROM dom.f"),
      1 -> Gen.const(" INTERSECT SELECT cpu FROM dom.f"))
  } yield s"SELECT $dist${withAliases.mkString(", ")}$source" +
    s"$where$group$having$qualify$window$order$limit$setop"

  property("execute or refuse with a dialect exception — nothing leaks") =
    forAll(queryGen) { q =>
      try {
        Compiler.compile(Parser.parse(q), fam).collect()
        true
      } catch {
        case _: Parser.ParseException       => true
        case _: Compiler.CompileException   => true
        case e: Throwable =>
          println(s"FUZZLEAK ${e.getClass.getSimpleName} on: $q\n  " +
            String.valueOf(e.getMessage).takeWhile(_ != '\n').take(200))
          false
      }
    }
}
