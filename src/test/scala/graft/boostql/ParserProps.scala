package graft.boostql

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import Ast._

/** ScalaCheck properties over the dialect's arithmetic grammar: random
  * expression trees are rendered to SQL two ways — fully parenthesized
  * and with precedence-minimal parens — and both must parse back to an
  * operand that evaluates to the tree's own value. Pins operator
  * precedence, left associativity, paren handling, and unary-minus
  * folding against an independent evaluator.
  */
object ParserProps extends Properties("graft.boostql.parser") {

  private sealed trait T
  private case class Leaf(v: Long) extends T
  private case class Neg(x: T) extends T
  private case class Bin(op: String, l: T, r: T) extends T
  /** Scalar call over long-exact functions — pins the function-call
    * grammar inside arbitrary arithmetic nesting. */
  private case class Fn(name: String, args: Seq[T]) extends T
  /** Searched CASE with one comparison condition — pins the CASE
    * grammar (a full boolean inside an operand position) and its
    * interaction with arithmetic nesting. */
  private case class CaseT(op: String, a: T, b: T, thenV: T, elseV: T) extends T

  private def fnGen(depth: Int): Gen[T] = Gen.oneOf(
    Gen.lzy(tree(depth - 1)).map(x => Fn("abs", Seq(x))),
    Gen.lzy(for { a <- tree(depth - 1); b <- tree(depth - 1) }
      yield Fn("least", Seq(a, b))),
    Gen.lzy(for { a <- tree(depth - 1); b <- tree(depth - 1) }
      yield Fn("greatest", Seq(a, b))))

  private def caseGen(depth: Int): Gen[T] = Gen.lzy(for {
    op <- Gen.oneOf("<", ">", "=")
    a <- tree(depth - 1); b <- tree(depth - 1)
    th <- tree(depth - 1); el <- tree(depth - 1)
  } yield CaseT(op, a, b, th, el))

  private def tree(depth: Int): Gen[T] =
    if (depth <= 0) Gen.choose(0L, 9L).map(Leaf)
    else Gen.frequency(
      3 -> Gen.choose(0L, 9L).map(Leaf),
      1 -> Gen.lzy(tree(depth - 1).map(Neg)),
      1 -> fnGen(depth),
      1 -> caseGen(depth),
      4 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        l <- Gen.lzy(tree(depth - 1))
        r <- Gen.lzy(tree(depth - 1))
      } yield Bin(op, l, r)))

  private def eval(t: T): Long = t match {
    case Leaf(v)       => v
    case Neg(x)        => -eval(x)
    case Bin("+", l, r) => eval(l) + eval(r)
    case Bin("-", l, r) => eval(l) - eval(r)
    case Bin("*", l, r) => eval(l) * eval(r)
    case Bin(op, _, _)  => sys.error(op)
    case Fn("abs", Seq(x))         => math.abs(eval(x))
    case Fn("least", Seq(a, b))    => math.min(eval(a), eval(b))
    case Fn("greatest", Seq(a, b)) => math.max(eval(a), eval(b))
    case Fn(n, _)                  => sys.error(n)
    case CaseT(op, a, b, th, el) =>
      val hit = op match {
        case "<" => eval(a) < eval(b)
        case ">" => eval(a) > eval(b)
        case "=" => eval(a) == eval(b)
      }
      if (hit) eval(th) else eval(el)
  }

  private def full(t: T): String = t match {
    case Leaf(v)        => v.toString
    case Neg(x)         => s"(- ${full(x)})"
    case Bin(op, l, r)  => s"(${full(l)} $op ${full(r)})"
    case Fn(n, args)    => s"$n(${args.map(full).mkString(", ")})"
    case CaseT(op, a, b, th, el) =>
      s"CASE WHEN ${full(a)} $op ${full(b)} THEN ${full(th)} ELSE ${full(el)} END"
  }

  /** Precedence-minimal rendering: * binds tighter than +/-; operators
    * are left-associative, so a right child at the same precedence is
    * parenthesized (it matters for `-`), a left child is not.
    */
  private def prec(t: T): Int = t match {
    case Bin("+", _, _) | Bin("-", _, _) => 1
    case Bin("*", _, _)                  => 2
    case _                               => 3
  }
  private def minimal(t: T): String = t match {
    case Leaf(v) => v.toString
    case Fn(n, args) => s"$n(${args.map(minimal).mkString(", ")})"
    // CASE is self-delimiting (WHEN … END) — never needs parens
    case CaseT(op, a, b, th, el) =>
      s"CASE WHEN ${minimal(a)} $op ${minimal(b)} " +
        s"THEN ${minimal(th)} ELSE ${minimal(el)} END"
    case Neg(x)  => if (prec(x) < 3) s"- (${minimal(x)})" else s"- ${minimal(x)}"
    case b @ Bin(op, l, r) =>
      val ls = if (prec(l) < prec(b)) s"(${minimal(l)})" else minimal(l)
      val rs = if (prec(r) <= prec(b)) s"(${minimal(r)})" else minimal(r)
      s"$ls $op $rs"
  }

  private def evalOperand(o: Operand): Long = o match {
    case OLit(BInt(v))   => v
    case ONeg(x)         => -evalOperand(x)
    case OArith("+", l, r) => evalOperand(l) + evalOperand(r)
    case OArith("-", l, r) => evalOperand(l) - evalOperand(r)
    case OArith("*", l, r) => evalOperand(l) * evalOperand(r)
    case OFn("abs", Seq(x))         => math.abs(evalOperand(x))
    case OFn("least", Seq(a, b))    => math.min(evalOperand(a), evalOperand(b))
    case OFn("greatest", Seq(a, b)) => math.max(evalOperand(a), evalOperand(b))
    case OCase(Seq((Cmp(op, l, r), th)), Some(el)) =>
      val hit = op match {
        case "<" => evalOperand(l) < evalOperand(r)
        case ">" => evalOperand(l) > evalOperand(r)
        case "=" => evalOperand(l) == evalOperand(r)
        case o   => sys.error(o)
      }
      if (hit) evalOperand(th) else evalOperand(el)
    case other           => sys.error(s"unexpected operand $other")
  }

  private def parseExpr(sql: String): Operand =
    Parser.parse(s"SELECT $sql AS v FROM d.f").select.head match {
      case ExprItem(e, "v") => e
      case other            => sys.error(s"unexpected item $other")
    }

  private val trees = Gen.choose(0, 4).flatMap(tree)

  property("fully parenthesized rendering parses to the tree's value") =
    forAll(trees) { t => evalOperand(parseExpr(full(t))) == eval(t) }

  property("precedence-minimal rendering parses to the same value") =
    forAll(trees) { t => evalOperand(parseExpr(minimal(t))) == eval(t) }

  property("comments between tokens never change the parse") =
    forAll(trees) { t =>
      // the minimal rendering separates every token with one space;
      // replacing each separator with a comment must parse identically
      // (comments lex as whitespace — including block comments right
      // after `*`, the hint-delimiter ambiguity corner)
      val commented = minimal(t).replace(" ", " /* c */ ")
      // and with NO surrounding spaces: `a * b` becomes `a/*c*/*/*c*/b`,
      // where a comment closes right before the `*` operator and another
      // opens right after it — the exact star/slash adjacency the
      // hint-aware lexer must not mis-read as a hint terminator
      val tight = minimal(t).replace(" ", "/*c*/")
      evalOperand(parseExpr(commented)) == eval(t) &&
        evalOperand(parseExpr(tight)) == eval(t)
    }

  property("literal negation folds at parse time (no ONeg over literals)") =
    forAll(Gen.choose(0L, 99L)) { v =>
      parseExpr(s"- $v") == OLit(BInt(-v))
    }

  // ---- robustness: hostile input must fail as ParseException ----------

  private val soupToken: Gen[String] = Gen.oneOf(
    Gen.oneOf("SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "(", ")", ",",
      ".", "*", "+", "-", "/", "=", "<", ">=", "IS", "NULL", "AS", "JOIN",
      "CASE", "WHEN", "THEN", "ELSE", "END", "UNION", "INTERSECT", "EXCEPT",
      "ALL", "EXISTS", "IN", "LIMIT", "ORDER", "BY"),
    Gen.identifier.map(_.take(8)),
    Gen.choose(0, 999).map(_.toString),
    Gen.alphaStr.map(s => s"'${s.take(6)}'"))

  property("random token soup parses or throws ParseException, never anything else") =
    forAll(Gen.listOfN(30, soupToken)) { toks =>
      try { Parser.parse(toks.mkString(" ")); true }
      catch {
        case _: Parser.ParseException => true
        case _: Throwable             => false
      }
    }

  property("adversarial nesting depth is a ParseException, not StackOverflowError") =
    forAll(Gen.oneOf(600, 5000, 50000)) { d =>
      val deep = "(" * d + "1" + ")" * d
      try { Parser.parse(s"SELECT cpu FROM d.f WHERE cpu > $deep"); false }
      catch {
        case _: Parser.ParseException => true
        case _: Throwable             => false
      }
    }

  // ---- set-operation chains: left associativity + INTERSECT precedence

  private val setOpChain: Gen[List[String]] =
    Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("union", "union all", "intersect", "except")))

  property("set-op chains parse left-associative with INTERSECT tighter") =
    forAll(setOpChain) { ops =>
      val branches = (0 to ops.length).map(i =>
        Parser.parse(s"SELECT s$i FROM d.f"))
      val sql = branches.indices.map { i =>
        (if (i == 0) "" else s" ${ops(i - 1).toUpperCase} ") + s"SELECT s$i FROM d.f"
      }.mkString
      // reference fold: INTERSECT extends the current term; UNION/EXCEPT
      // flush the term into the left-associative union-level chain
      var acc: Option[(QueryStmt, String)] = None
      var term: QueryStmt = branches(0)
      ops.zip(branches.tail).foreach { case (op, rhs) =>
        op match {
          case "intersect" => term = SetOpSpec("intersect", term, rhs)
          case u =>
            val left = acc match {
              case None         => term
              case Some((l, o)) => SetOpSpec(o, l, term)
            }
            acc = Some((left, if (u == "union all") "union_all" else u))
            term = rhs
        }
      }
      val expected = acc match {
        case None         => term
        case Some((l, o)) => SetOpSpec(o, l, term)
      }
      Parser.parseStmt(sql) == expected
    }

  /** Depth of the SubSource chain hanging off a statement's FROM. */
  private def fromDepth(st: QueryStmt): Int = st match {
    case q: QuerySpec => q.source match {
      case SubSource(inner, _) => 1 + fromDepth(inner)
      case _ => 0
    }
    case s: SetOpSpec => math.max(fromDepth(s.left), fromDepth(s.right))
  }

  // derived-table nesting round-trips to exactly its rendered depth
  property("derivedTableNesting") = forAll(Gen.choose(1, 30)) { n =>
    def rel(d: Int): String =
      if (d == 0) "dom.fam"
      else if (d == 1) s"(SELECT cpu AS c FROM ${rel(0)}) AS t1"
      else s"(SELECT c AS c FROM ${rel(d - 1)}) AS t$d"
    fromDepth(Parser.parseStmt(s"SELECT c FROM ${rel(n)}")) == n
  }

  // a CTE chain (each binding reading the previous) substitutes to a
  // SubSource chain of the same length
  property("cteChainSubstitution") = forAll(Gen.choose(1, 20)) { k =>
    val binds = (1 to k).map { i =>
      if (i == 1) "t1 AS (SELECT cpu AS c FROM dom.fam)"
      else s"t$i AS (SELECT c AS c FROM t${i - 1})"
    }.mkString(", ")
    fromDepth(Parser.parseStmt(s"WITH $binds SELECT c FROM t$k")) == k
  }

  // pathological FROM nesting dies as a bounded ParseException, never a
  // StackOverflowError
  property("deepFromNestingBounded") = {
    val deep = "(SELECT c FROM " * 600 + "dom.fam" + ") AS t" * 600
    try { Parser.parseStmt(s"SELECT c FROM $deep AS x"); false }
    catch { case _: Parser.ParseException => true }
  }

  // percentile's fraction rides the AST as its parsed Double — the node
  // round-trips the numeric value, and textual variants of one fraction
  // (0.5 / 0.50 / 0.500…) are ONE structural node, so the cross-clause
  // aggregate dedup extends over them
  property("percentileFractionRoundTrip") =
    forAll(Gen.choose(0, 1000)) { millis =>
      val p = millis / 1000.0
      parseExpr(s"percentile(cpu, $p)") == OAggX("percentile",
        ORef(RawName(Seq("cpu"))), Seq(p))
    }

  property("percentileTextualVariantsCanonicalize") =
    forAll(Gen.oneOf("0.125" -> "0.1250", "0.5" -> "0.50",
      "0" -> "0.0", "1" -> "1.00")) { case (a, b) =>
      parseExpr(s"percentile(cpu, $a)") == parseExpr(s"percentile(cpu, $b)")
    }

  // the ONE duration grammar (bucket/session/WITHIN/INTERVAL): any
  // count/unit/spacing/case/plural spelling parses to count*unit micros
  // exactly; products past Long.MaxValue and junk reject as None
  private val durationUnits = Seq(
    "microsecond" -> 1L, "millisecond" -> 1000L, "second" -> 1000000L,
    "minute" -> 60000000L, "hour" -> 3600000000L, "day" -> 86400000000L)

  property("durationGrammarRoundTrip") = forAll(
    Gen.choose(0L, 1000000L), Gen.oneOf(durationUnits),
    Gen.oneOf("", " ", "  "), Gen.oneOf(false, true), Gen.oneOf("", "s")
  ) { (n, unitMult, sep, upper, plural) =>
    val (unit, mult) = unitMult
    val text = s"$n$sep${if (upper) unit.toUpperCase else unit}$plural"
    val expected = BigInt(n) * mult
    Compiler.parseIntervalMicros(text) ==
      (if (expected <= Long.MaxValue) Some(expected.toLong) else None)
  }

  property("durationGrammarRejectsOverflowAndJunk") = forAll(
    Gen.oneOf("99999999999999999999 days", "200000000000000 days",
      "5 fortnights", "banana", "", "-3 minutes", "1 month", "2 weeks")
  ) { bad => Compiler.parseIntervalMicros(bad).isEmpty }

  // FILL clause: every mode spelling (any case) round-trips to its
  // FillSpec; numeric modes keep their value; junk modes reject
  property("fillModeRoundTrip") = forAll(
    Gen.oneOf("null" -> FillSpec("null"), "previous" -> FillSpec("previous"),
      "linear" -> FillSpec("linear"), "0" -> FillSpec("value", Some(0.0)),
      "2.5" -> FillSpec("value", Some(2.5)),
      "-1.5" -> FillSpec("value", Some(-1.5))),
    Gen.oneOf(false, true)
  ) { case ((text, expected), upper) =>
    val t = if (upper) text.toUpperCase else text
    Parser.parse("SELECT bucket(ts, '1 day') AS d, count(cpu) AS n " +
      s"FROM dom.f GROUP BY d FILL($t)").fill.contains(expected)
  }

  property("fillJunkModesReject") = forAll(
    Gen.oneOf("sideways", "prev", "''", "--", "null null")
  ) { bad =>
    scala.util.Try(Parser.parse(
      "SELECT bucket(ts, '1 day') AS d, count(cpu) AS n " +
        s"FROM dom.f GROUP BY d FILL($bad)")).isFailure
  }

  // histogram literal contract: any integer bin count in [1, 256]
  // parses with the exact (lo, hi, n) params; out-of-range rejects
  property("histogramLiteralRoundTrip") = forAll(
    Gen.choose(1, 256), Gen.choose(-100, 100)
  ) { (n, lo) =>
    parseExpr(s"histogram(cpu, $lo, ${lo + 50}, $n)") ==
      OAggX("histogram", ORef(RawName(Seq("cpu"))),
        Seq(lo.toDouble, (lo + 50).toDouble, n.toDouble))
  }

  property("histogramBadBinCountsReject") = forAll(
    Gen.oneOf("0", "257", "2.5", "-3")
  ) { bad =>
    scala.util.Try(parseExpr(s"histogram(cpu, 0, 100, $bad)")).isFailure
  }

  // corr desugar: textual whitespace variants of one call desugar to
  // the IDENTICAL operand tree (structural dedup depends on it), and
  // the tree contains only sum() aggregates
  property("corrDesugarCanonical") = forAll(
    Gen.oneOf("corr", "covar_pop", "covar_samp", "regr_slope",
      "regr_intercept", "regr_r2", "regr_count", "regr_avgx",
      "regr_avgy"),
    Gen.oneOf("cpu,mem" -> "cpu , mem", "cpu,mem" -> "cpu,  mem")
  ) { case (fn, (a, b)) =>
    def aggs(o: Operand): Seq[String] = o match {
      case OAggX(f, e, _, _) => f +: aggs(e)
      case OArith(_, l, r) => aggs(l) ++ aggs(r)
      case OCast(x, _)     => aggs(x)
      case OFn(_, as)      => as.flatMap(aggs)
      case OCase(bs, el)   => bs.flatMap(x => aggs(x._2)) ++
        el.toSeq.flatMap(aggs)
      case _               => Seq.empty
    }
    val p1 = parseExpr(s"$fn($a)"); val p2 = parseExpr(s"$fn($b)")
    p1 == p2 && aggs(p1).nonEmpty && aggs(p1).forall(_ == "sum")
  }

  // sliding bucket: the 3-argument form parses as a plain 3-arg OFn in
  // a grouping-key position for any fixed-width spelling pair
  property("slidingBucketParseShape") = forAll(
    Gen.oneOf("'1 day'" -> "'12 hours'", "'1 hour'" -> "'30 minutes'",
      "'10 minutes'" -> "'5 minutes'")
  ) { case (w, s) =>
    val q = Parser.parse(s"SELECT bucket(ts, $w, $s) AS d, " +
      s"count(cpu) AS n FROM dom.f GROUP BY d")
    q.select.head match {
      case ExprItem(OFn("bucket", args), "d") => args.length == 3
      case _ => false
    }
  }

  // ---- round-13 grammar: DISTINCT ON / NULLS placement / ALL sugar /
  //      quantified comparisons ----------------------------------------

  private val identGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.alphaLowerChar).map("s" + _.mkString))

  // WINDOW clause: for ANY spec, `OVER w` + `WINDOW w AS (spec)` must
  // parse to the IDENTICAL tree as spelling the spec inline at every
  // OVER site — substitution is invisible downstream by construction
  private val winSpecGen: Gen[String] = for {
    part <- Gen.oneOf("", "PARTITION BY cpu.host", "PARTITION BY cpu.host, mem")
    ord  <- Gen.oneOf("", "ORDER BY cpu", "ORDER BY cpu DESC, ts")
    frame <- Gen.oneOf("", "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    // a frame needs an ordered window; empty spec is legal
    spec = Seq(part, ord, if (ord.nonEmpty) frame else "")
      .filter(_.nonEmpty).mkString(" ")
  } yield spec
  property("windowClauseSubstitutionInvisible") = forAll(
    winSpecGen, Gen.oneOf(1, 2, 3)
  ) { (spec, uses) =>
    val calls = Seq("rank()", "sum(cpu)", "lag(cpu, 1)").take(uses)
    val named = calls.zipWithIndex
      .map { case (c, i) => s"$c OVER w AS c$i" }.mkString(", ")
    val inline = calls.zipWithIndex
      .map { case (c, i) => s"$c OVER ($spec) AS c$i" }.mkString(", ")
    Parser.parse(s"SELECT $named FROM dom.f WINDOW w AS ($spec)") ==
      Parser.parse(s"SELECT $inline FROM dom.f")
  }

  property("distinctOnKeysRoundTrip") = forAll(
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, identGen))
  ) { keys =>
    val q = Parser.parse(s"SELECT DISTINCT ON (${keys.mkString(", ")}) " +
      s"${keys.mkString(", ")} FROM dom.f ORDER BY ${keys.head}")
    q.distinct && q.distinctOn == keys.map(k => RawName(Seq(k)))
  }

  property("nullsPlacementRoundTrip") = forAll(
    Gen.oneOf(true, false), Gen.oneOf(Option.empty[Boolean],
      Some(true), Some(false)), Gen.oneOf(false, true)
  ) { (asc, nf, upper) =>
    val dir = (if (asc) "ASC" else "DESC") +
      nf.fold("")(f => if (f) " nulls first" else " nulls last")
    val t = if (upper) dir.toUpperCase else dir
    val q = Parser.parse(s"SELECT cpu FROM dom.f ORDER BY cpu $t")
    q.orderBy == Seq(OrderItem(FieldItem(RawName(Seq("cpu"))), asc, nf))
  }

  property("groupByAllDesugarsToNonAggregateItems") = forAll(
    Gen.choose(1, 3), Gen.choose(1, 3)
  ) { (nKeys, nAggs) =>
    val keys = (1 to nKeys).map(i => s"k$i")
    val sel = keys.map(k => s"cpu.$k") ++
      (1 to nAggs).map(i => s"sum(cpu) AS a$i")
    val q = Parser.parse(
      s"SELECT ${sel.mkString(", ")} FROM dom.f GROUP BY ALL")
    q.groupBy == keys.map(k => RawName(Seq("cpu", k)))
  }

  property("quantifiedComparisonNormalization") = forAll(
    Gen.oneOf(">" -> "<=", ">=" -> "<", "<" -> ">=", "<=" -> ">"),
    Gen.oneOf(false, true)
  ) { case ((op, flipped), isAll) =>
    val quant = if (isAll) "ALL" else "ANY"
    val q = Parser.parse("SELECT cpu FROM dom.f WHERE cpu " +
      s"$op $quant (SELECT mem FROM dom.g)")
    q.where match {
      // ALL stores its negated-ANY complement (x > ALL ≡ NOT(x <= ANY))
      case Some(QuantE(o, ORef(RawName(Seq("cpu"))), _, neg)) =>
        neg == isAll && o == (if (isAll) flipped else op)
      case _ => false
    }
  }

  property("equalityQuantifiersPointAtInNotIn") = forAll(
    Gen.oneOf("=", "!="), Gen.oneOf("ANY", "ALL")
  ) { (op, quant) =>
    scala.util.Try(Parser.parse(
      s"SELECT cpu FROM dom.f WHERE cpu $op $quant (SELECT mem FROM dom.g)"))
      .failed.toOption.exists(_.getMessage.contains("IN"))
  }
}
