package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Tiny scalar-expression AST: the engine's expression compiler.
  *
  * All closed-form model math in the reference (unit conversions,
  * thermometers, Fe3+/Fe2+ models, fO2 buffers, rheology — SURVEY.md §2.6/2.7)
  * is pure per-row arithmetic. We express it once in this AST and compile it
  * to Catalyst `Column`s (codegen'd, no UDFs). A secondary renderer emits the
  * same expression tree as ANSI SQL for the DuckDB correctness oracle, which
  * guarantees the oracle computes the *same arithmetic in the same order* —
  * IEEE 754 ops are then bit-identical across engines (transcendentals are
  * rounded at query edges).
  */
sealed trait E {
  def +(o: E): E = Bin("+", this, o)
  def -(o: E): E = Bin("-", this, o)
  def *(o: E): E = Bin("*", this, o)
  def /(o: E): E = Bin("/", this, o)
  def %(o: E): E = Bin("%", this, o)
  def unary_- : E = Bin("-", Lit(0.0), this)
  def <(o: E): Cond = Cmp("<", this, o)
  def <=(o: E): Cond = Cmp("<=", this, o)
  def >(o: E): Cond = Cmp(">", this, o)
  def >=(o: E): Cond = Cmp(">=", this, o)
  def ===(o: E): Cond = Cmp("=", this, o)
}
final case class C(name: String) extends E                       // column ref
final case class Lit(v: Double) extends E                        // double literal
final case class ILit(v: Long) extends E                         // integer literal
final case class SLit(v: String) extends E                       // string literal
final case class Bin(op: String, l: E, r: E) extends E           // + - * / %
final case class Fn(fn: String, args: List[E]) extends E         // exp ln log10 sqrt abs pow least greatest round floor
final case class If(cond: Cond, t: E, f: E) extends E            // CASE WHEN
final case class CastD(a: E) extends E                           // cast to double
final case class Raw(column: Column, sql: String) extends E      // escape hatch

sealed trait Cond {
  def &&(o: Cond): Cond = AndOr("AND", this, o)
  def ||(o: Cond): Cond = AndOr("OR", this, o)
}
final case class Cmp(op: String, l: E, r: E) extends Cond
final case class AndOr(op: String, l: Cond, r: Cond) extends Cond
final case class NotC(c: Cond) extends Cond

object E {
  implicit def fromDouble(v: Double): E = Lit(v)
  implicit def fromInt(v: Int): E = ILit(v.toLong)

  def exp(a: E): E = Fn("exp", List(a))
  def ln(a: E): E = Fn("ln", List(a))
  def log10(a: E): E = Fn("log10", List(a))
  def sqrt(a: E): E = Fn("sqrt", List(a))
  def cos(a: E): E = Fn("cos", List(a))
  def abs(a: E): E = Fn("abs", List(a))
  def pow(a: E, b: E): E = Fn("pow", List(a, b))
  def least(xs: E*): E = Fn("least", xs.toList)
  def greatest(xs: E*): E = Fn("greatest", xs.toList)
  def round(a: E, d: Int): E = Fn("round", List(a, ILit(d.toLong)))
  def floor(a: E): E = Fn("floor", List(a))
  def when(c: Cond, t: E, f: E): E = If(c, t, f)

  /** Compile to a Catalyst Column (the engine execution path). */
  // String helpers with identical Spark/DuckDB semantics (ASCII data):
  def length(a: E): E = Fn("length", List(a))
  def replace(s: E, find: E, repl: E): E = Fn("replace", List(s, find, repl))
  def lower(a: E): E = Fn("lower", List(a))
  def concatS(xs: E*): E = Fn("concat", xs.toList)
  def md5S(a: E): E = Fn("md5_str", List(a))
  /** Occurrences of `marker` in `padded` via length/replace arithmetic —
    * deterministic in both engines, no regex dialect issues. */
  def countOccurrences(padded: E, marker: String): E =
    CastD(length(padded) - length(replace(padded, SLit(marker), SLit("")))) /
      Lit(marker.length.toDouble)
  /** `suffix` appended after EVERY Unicode code point of `a` — the BPE
    * alphabet seeding, as the one regex both dialects agree on:
    * `(?s)(.)` matches exactly one code point (incl. newline via (?s),
    * incl. supplementary-plane chars as ONE match — java.util.regex and
    * RE2 both iterate code points, verified empirically), and the
    * backref replacement is `$1` in Java vs `\1` + the 'g' flag in
    * DuckDB, which is why this is a dedicated node instead of a generic
    * Fn rendering. `suffix` must not contain `$`/`\` (Java replacement
    * metachars) — the BPE separator (U+0001) never does. */
  def seedCp(a: E, suffix: String): E = Fn("seed_cp", List(a, SLit(suffix)))

  def toColumn(e: E): Column = e match {
    case C(n)    => F.col(n)
    case Lit(v)  => F.lit(v)
    case ILit(v) => F.lit(v)
    case SLit(v) => F.lit(v)
    case Bin("+", l, r) => toColumn(l) + toColumn(r)
    case Bin("-", l, r) => toColumn(l) - toColumn(r)
    case Bin("*", l, r) => toColumn(l) * toColumn(r)
    case Bin("/", l, r) => toColumn(l) / toColumn(r)
    case Bin("%", l, r) => toColumn(l) % toColumn(r)
    case Bin(op, _, _)  => throw new IllegalArgumentException(s"op $op")
    case Fn("exp", List(a))      => F.exp(toColumn(a))
    case Fn("ln", List(a))       => F.log(toColumn(a))
    case Fn("log10", List(a))    => F.log10(toColumn(a))
    case Fn("sqrt", List(a))     => F.sqrt(toColumn(a))
    case Fn("cos", List(a))      => F.cos(toColumn(a))
    case Fn("abs", List(a))      => F.abs(toColumn(a))
    case Fn("pow", List(a, b))   => F.pow(toColumn(a), toColumn(b))
    case Fn("least", xs)         => F.least(xs.map(toColumn): _*)
    case Fn("greatest", xs)      => F.greatest(xs.map(toColumn): _*)
    case Fn("round", List(a, ILit(d))) => F.round(toColumn(a), d.toInt)
    case Fn("floor", List(a))    => F.floor(toColumn(a))
    case Fn("length", List(a))   => F.length(toColumn(a))
    case Fn("replace", xs)       => F.call_function("replace", xs.map(toColumn): _*)
    case Fn("lower", List(a))    => F.lower(toColumn(a))
    case Fn("concat", xs)        => F.concat(xs.map(toColumn): _*)
    case Fn("md5_str", List(a))  => F.md5(toColumn(a).cast("binary"))
    case Fn("seed_cp", List(a, SLit(suffix))) =>
      F.regexp_replace(toColumn(a), "(?s)(.)", "$1" + suffix)
    case Fn(fn, _)               => throw new IllegalArgumentException(s"fn $fn")
    case If(c, t, f) => F.when(toCond(c), toColumn(t)).otherwise(toColumn(f))
    case CastD(a)    => toColumn(a).cast("double")
    case Raw(c, _)   => c
  }

  def toCond(c: Cond): Column = c match {
    case Cmp("<", l, r)  => toColumn(l) < toColumn(r)
    case Cmp("<=", l, r) => toColumn(l) <= toColumn(r)
    case Cmp(">", l, r)  => toColumn(l) > toColumn(r)
    case Cmp(">=", l, r) => toColumn(l) >= toColumn(r)
    case Cmp("=", l, r)  => toColumn(l) === toColumn(r)
    case Cmp(op, _, _)   => throw new IllegalArgumentException(s"cmp $op")
    case AndOr("AND", l, r) => toCond(l) && toCond(r)
    case AndOr("OR", l, r)  => toCond(l) || toCond(r)
    case AndOr(op, _, _)    => throw new IllegalArgumentException(s"bool $op")
    case NotC(x) => !toCond(x)
  }

  /** Render as DuckDB-compatible ANSI SQL (the oracle path). */
  def toSql(e: E): String = e match {
    case C(n)    => "\"" + n + "\""
    case Lit(v)  => formatDouble(v)
    case ILit(v) => v.toString
    case SLit(v) => "'" + v.replace("'", "''") + "'"
    case Bin(op, l, r) => s"(${toSql(l)} $op ${toSql(r)})"
    case Fn("round", List(a, ILit(d))) => s"round(${toSql(a)}, $d)"
    case Fn("md5_str", List(a)) => s"md5(${toSql(a)})"
    case Fn("seed_cp", List(a, SLit(suffix))) =>
      s"regexp_replace(${toSql(a)}, '(?s)(.)', " +
        s"'\\1${suffix.replace("'", "''")}', 'g')"
    case Fn(fn, xs) => s"$fn(${xs.map(toSql).mkString(", ")})"
    case If(c, t, f) => s"(CASE WHEN ${condSql(c)} THEN ${toSql(t)} ELSE ${toSql(f)} END)"
    case CastD(a)    => s"CAST(${toSql(a)} AS DOUBLE)"
    case Raw(_, s)   => s
  }

  def condSql(c: Cond): String = c match {
    case Cmp(op, l, r)  => s"(${toSql(l)} $op ${toSql(r)})"
    case AndOr(op, l, r) => s"(${condSql(l)} $op ${condSql(r)})"
    case NotC(x)         => s"(NOT ${condSql(x)})"
  }

  /** Shortest decimal repr that round-trips (Java Double.toString) — DuckDB
    * parses it back to the identical IEEE double. Always rendered in
    * exponent notation: DuckDB types plain decimal literals as DECIMAL
    * (exact arithmetic), but e-notation literals as DOUBLE, which is what
    * Spark computes with. */
  def formatDouble(v: Double): String = {
    require(!v.isNaN && !v.isInfinite, s"non-finite literal $v")
    val s = v.toString
    if (s.contains("E")) s.replace("E", "e") else s + "e0"
  }

  /** Left-assoc sum matching `cols.reduce(_ + _)` evaluation order. */
  def sumAll(xs: Seq[E]): E = xs.reduce(_ + _)
}

/** One SELECT stage: output column name -> expression over the previous
  * stage. Pipelines of stages compile to chained `df.select`s, or to a SQL
  * WITH-chain for the oracle. */
final case class Stage(cols: Seq[(String, E)])

/** Common-subexpression elimination over a stage: repeated subtrees (e.g.
  * the mole-sum denominator a normalisation divides EVERY element column
  * by, or the cation denominator a model references per cation) are hoisted
  * into a prelude projection stage and replaced by column references.
  *
  * Why this matters at scale: the expression generators inline conversion
  * chains, so one model stage can carry a dozen copies of a 40-node sum.
  * Catalyst's codegen-time subexpression elimination does not always save
  * such stages — the generated method blows past the JIT/codegen size
  * limits and execution falls back to interpreted eval (observed: the EP3
  * chain spending 23s at sf0.1 on arithmetic worth <2s). Hoisting keeps
  * each projection small and codegen-friendly. The SQL renderer consumes
  * the SAME rewritten stages, so engine and oracle still compute identical
  * arithmetic in identical order.
  */
object Cse {
  private def sizeOf(e: E): Int = e match {
    case Bin(_, l, r) => 1 + sizeOf(l) + sizeOf(r)
    case Fn(_, args)  => 1 + args.map(sizeOf).sum
    case If(c, t, f)  => 1 + sizeCond(c) + sizeOf(t) + sizeOf(f)
    case CastD(a)     => 1 + sizeOf(a)
    case _            => 1
  }
  private def sizeCond(c: Cond): Int = c match {
    case Cmp(_, l, r)   => 1 + sizeOf(l) + sizeOf(r)
    case AndOr(_, l, r) => 1 + sizeCond(l) + sizeCond(r)
    case NotC(x)        => 1 + sizeCond(x)
  }

  private def contains(hay: E, needle: E): Boolean =
    hay == needle || (hay match {
      case Bin(_, l, r) => contains(l, needle) || contains(r, needle)
      case Fn(_, args)  => args.exists(contains(_, needle))
      case If(c, t, f)  => condContains(c, needle) || contains(t, needle) ||
        contains(f, needle)
      case CastD(a)     => contains(a, needle)
      case _            => false
    })
  private def condContains(c: Cond, needle: E): Boolean = c match {
    case Cmp(_, l, r)   => contains(l, needle) || contains(r, needle)
    case AndOr(_, l, r) => condContains(l, needle) || condContains(r, needle)
    case NotC(x)        => condContains(x, needle)
  }

  private def count(e: E, acc: scala.collection.mutable.Map[E, Int]): Unit = {
    e match {
      case Bin(_, l, r) => count(l, acc); count(r, acc)
      case Fn(_, args)  => args.foreach(count(_, acc))
      case If(c, t, f)  => countCond(c, acc); count(t, acc); count(f, acc)
      case CastD(a)     => count(a, acc)
      case _: Raw       => return // opaque: Column equality is unreliable
      case _            => return
    }
    if (sizeOf(e) >= minSize) acc.update(e, acc.getOrElse(e, 0) + 1)
  }
  private def countCond(c: Cond, acc: scala.collection.mutable.Map[E, Int]): Unit =
    c match {
      case Cmp(_, l, r)   => count(l, acc); count(r, acc)
      case AndOr(_, l, r) => countCond(l, acc); countCond(r, acc)
      case NotC(x)        => countCond(x, acc)
    }

  def rewrite(e: E, m: Map[E, String]): E = m.get(e) match {
    case Some(n) => C(n)
    case None => e match {
      case Bin(op, l, r) => Bin(op, rewrite(l, m), rewrite(r, m))
      case Fn(f, args)   => Fn(f, args.map(rewrite(_, m)))
      case If(c, t, f)   => If(rewriteCond(c, m), rewrite(t, m), rewrite(f, m))
      case CastD(a)      => CastD(rewrite(a, m))
      case other         => other
    }
  }
  def rewriteCond(c: Cond, m: Map[E, String]): Cond = c match {
    case Cmp(op, l, r)   => Cmp(op, rewrite(l, m), rewrite(r, m))
    case AndOr(op, l, r) => AndOr(op, rewriteCond(l, m), rewriteCond(r, m))
    case NotC(x)         => NotC(rewriteCond(x, m))
  }

  private def freeVars(e: E, acc: scala.collection.mutable.LinkedHashSet[String]): Unit =
    e match {
      case C(n)         => acc += n
      case Bin(_, l, r) => freeVars(l, acc); freeVars(r, acc)
      case Fn(_, args)  => args.foreach(freeVars(_, acc))
      case If(c, t, f)  => freeVarsCond(c, acc); freeVars(t, acc); freeVars(f, acc)
      case CastD(a)     => freeVars(a, acc)
      case _            => ()
    }
  private def freeVarsCond(c: Cond, acc: scala.collection.mutable.LinkedHashSet[String]): Unit =
    c match {
      case Cmp(_, l, r)   => freeVars(l, acc); freeVars(r, acc)
      case AndOr(_, l, r) => freeVarsCond(l, acc); freeVarsCond(r, acc)
      case NotC(x)        => freeVarsCond(x, acc)
    }

  private val minSize = 5
  private val maxPicks = 16

  /** Split a stage into (prelude, rewritten) when profitable; None when the
    * stage has no repeated subtree worth hoisting. */
  def split(stage: Stage): Option[(Stage, Stage)] = {
    val counts = scala.collection.mutable.Map.empty[E, Int]
    stage.cols.foreach { case (_, e) => count(e, counts) }
    // Rank by SAVED NODES (occurrences-1) x size, not raw size: a model's
    // cation-sum denominator repeats ~12x but is CONTAINED in pow/ln trees
    // that repeat only twice — size ordering picked the big twice-trees and
    // the non-overlap rule then excluded the denominator, leaving a dozen
    // inline copies whose generated code blew past the JIT method budget
    // (q_monte_carlo: 4s of JIT per WARM pass, warm == cold).
    val candidates = counts.toSeq.collect {
      case (e, n) if n >= 2 => (e, (n - 1).toLong * sizeOf(e))
    }.sortBy(-_._2)
    if (candidates.isEmpty) return None
    // greedy non-overlapping pick, largest savings first
    val picked = scala.collection.mutable.ArrayBuffer.empty[E]
    candidates.iterator.takeWhile(_ => picked.size < maxPicks).foreach {
      case (e, _) =>
        if (!picked.exists(p => contains(p, e) || contains(e, p)))
          picked += e
    }
    if (picked.isEmpty) return None
    // prelude passes through every column the original stage reads; pick
    // names must dodge the free vars — a re-split of a REWRITTEN stage
    // sees the previous level's _cseN as inputs, and a colliding fresh
    // name would shadow the column it still references
    val fv = scala.collection.mutable.LinkedHashSet.empty[String]
    stage.cols.foreach { case (_, e) => freeVars(e, fv) }
    var idx = 0
    def fresh(): String = {
      while (fv.contains(s"_cse$idx")) idx += 1
      val n = s"_cse$idx"; idx += 1; n
    }
    val names = picked.map(e => e -> fresh()).toMap
    val prelude = Stage(fv.toSeq.map(c => c -> (C(c): E)) ++
      picked.map(e => names(e) -> e))
    val rewritten = Stage(stage.cols.map { case (n, e) => n -> rewrite(e, names) })
    Some((prelude, rewritten))
  }

  /** Recursive: the prelude's hoisted definitions can themselves share
    * subtrees (a hoisted cation fraction still contains the hoisted
    * denominator), and the REWRITTEN stage can too (trees that overlapped
    * a bigger pick this round become independent once the pick is a column
    * ref), so re-split both sides until stable. Depth-bounded; every level
    * keeps arithmetic and op order identical. Consecutive projections fuse
    * inside one WholeStageCodegen span, so extra levels cost no per-row
    * materialisation — they only partition the generated code into
    * JIT-compilable methods. */
  def expand(stage: Stage, depth: Int = 4): Seq[Stage] = split(stage) match {
    case Some((p, r)) if depth > 0 => expand(p, depth - 1) ++ expand(r, depth - 1)
    case Some((p, r))              => Seq(p, r)
    case None                      => Seq(stage)
  }
}

object Pipeline {
  import E._

  def applySpark(df: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(df) { (d, st) =>
      d.select(st.cols.map { case (n, e) => toColumn(e).as(n) }: _*)
    }

  /** The expression that produces output column `name` of the LAST stage,
    * composed back over the SOURCE table's columns by inlining each
    * stage's definitions front to back. Lets a caller key a pre-compute
    * range repartition on the final sort key (guide §2.4: two operations
    * keyed the same way share one exchange): the repartition expression
    * and the stage's alias then canonicalize identically, so the final
    * `orderBy` needs no second exchange and — crucially — its range-bound
    * sampling pass runs over the cheap key projection instead of
    * re-executing the whole post-shuffle compute. Returns None when the
    * column is opaque (contains [[Raw]]) — Column equality is unreliable
    * there, so callers fall back to the plain two-exchange shape. */
  def sourceExpr(stages: Seq[Stage], name: String): Option[E] = {
    val env = stages.foldLeft(Map.empty[String, E]) { (m, st) =>
      st.cols.map { case (n, e) => n -> substitute(e, m) }.toMap
    }
    env.get(name).filter(noRaw)
  }

  private def noRaw(e: E): Boolean = e match {
    case _: Raw        => false
    case Bin(_, l, r)  => noRaw(l) && noRaw(r)
    case Fn(_, args)   => args.forall(noRaw)
    case If(c, t, f)   => noRawCond(c) && noRaw(t) && noRaw(f)
    case CastD(a)      => noRaw(a)
    case _             => true
  }
  private def noRawCond(c: Cond): Boolean = c match {
    case Cmp(_, l, r)   => noRaw(l) && noRaw(r)
    case AndOr(_, l, r) => noRawCond(l) && noRawCond(r)
    case NotC(x)        => noRawCond(x)
  }

  private def substitute(e: E, env: Map[String, E]): E = e match {
    case C(n)          => env.getOrElse(n, C(n))
    case Bin(op, l, r) => Bin(op, substitute(l, env), substitute(r, env))
    case Fn(f, args)   => Fn(f, args.map(substitute(_, env)))
    case If(c, t, f)   => If(substituteCond(c, env), substitute(t, env),
      substitute(f, env))
    case CastD(a)      => CastD(substitute(a, env))
    case other         => other
  }
  private def substituteCond(c: Cond, env: Map[String, E]): Cond = c match {
    case Cmp(op, l, r)   => Cmp(op, substitute(l, env), substitute(r, env))
    case AndOr(op, l, r) => AndOr(op, substituteCond(l, env),
      substituteCond(r, env))
    case NotC(x)         => NotC(substituteCond(x, env))
  }

  /** Render stages as `WITH s0 AS (SELECT ... FROM <source>), s1 AS ...`
    * and a final SELECT with optional ORDER BY. `source` may itself be a
    * subquery: `(SELECT ... FROM lineitem)`. */
  def toSql(source: String, stages: Seq[Stage], orderBy: Seq[String]): String = {
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) source else s"s${i - 1}"
      val sel = st.cols.map { case (n, e) => s"${E.toSql(e)} AS \"$n\"" }.mkString(", ")
      s"s$i AS (SELECT $sel FROM $from)"
    }
    val ob = if (orderBy.isEmpty) "" else orderBy.map(c => "\"" + c + "\"").mkString(" ORDER BY ", ", ", "")
    s"WITH ${ctes.mkString(", ")} SELECT * FROM s${stages.size - 1}$ob"
  }
}
