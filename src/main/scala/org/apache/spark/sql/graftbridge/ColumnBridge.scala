package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** A storage unit's `[min, max]` range for one tracked column — the
  * typed currency of the data-skipping proofs ([[ColumnBridge.statsProveEmpty]])
  * and of [[graft.core.ParquetLog]]'s bucket-stats manifest. Two
  * domains: integral (seqs, numeric doc ids, epoch-long event times)
  * and string (urls, uuids, content hashes — the id shapes real
  * corpora key on). String order is Spark's own — binary UTF-8
  * ([[org.apache.spark.unsafe.types.UTF8String]]), the order parquet
  * stats and Spark comparisons use — NOT Java's UTF-16 `compareTo`,
  * which disagrees above the BMP. */
sealed trait StatsRange {
  /** `(cmp(v, lo), cmp(v, hi))` when literal `v`'s type matches this
    * range's domain; None (Unknown, unprunable) otherwise. */
  def cmpToRange(v: Any): Option[(Int, Int)]
}

final case class LongStats(lo: Long, hi: Long) extends StatsRange {
  def cmpToRange(v: Any): Option[(Int, Int)] = StatsRange.asLong(v)
    .map(x => (java.lang.Long.compare(x, lo), java.lang.Long.compare(x, hi)))
}

final case class StringStats(lo: String, hi: String) extends StatsRange {
  import org.apache.spark.unsafe.types.UTF8String
  def cmpToRange(v: Any): Option[(Int, Int)] = StatsRange.asString(v).map { x =>
    val u = UTF8String.fromString(x)
    (u.compareTo(UTF8String.fromString(lo)), u.compareTo(UTF8String.fromString(hi)))
  }
}

object StatsRange {
  private[graftbridge] def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l); case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong); case b: Byte => Some(b.toLong)
    case _ => None
  }
  private[graftbridge] def asString(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case _ => None
  }
}

/** Bridge into the `private[sql]` Column ⇄ Expression converters (the
  * Spark 4 replacement for the removed public `new Column(expr)`), so the
  * engine can expose custom Catalyst expressions as user-facing Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

  /** The "and"-split conjuncts of a boolean filter Column. Spark 4
    * Columns are lazy [[ColumnNode]] trees (`private[sql]`), so the
    * decomposition has to live in this bridge — `&&` is the node
    * `UnresolvedFunction("and", …)`, not a Catalyst `And`. */
  def conjuncts(c: Column): Seq[Column] = {
    def go(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction if f.functionName == "and" => f.arguments.flatMap(go)
      case other => Seq(other)
    }
    go(c.node).map(n => Column(n))
  }

  /** The "or"-split disjuncts of a boolean filter Column — the dual of
    * [[conjuncts]], for index-union selection: `a || b` is the node
    * `UnresolvedFunction("or", …)`. A non-disjunction returns itself
    * (one disjunct). */
  def disjuncts(c: Column): Seq[Column] = {
    def go(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction if f.functionName == "or" => f.arguments.flatMap(go)
      case other => Seq(other)
    }
    go(c.node).map(n => Column(n))
  }

  private def attr(n: ColumnNode): Option[String] = n match {
    case a: UnresolvedAttribute => Some(a.nameParts.mkString("."))
    case _ => None
  }
  private def lit(n: ColumnNode): Option[Any] = n match {
    case l: Literal => Some(l.value)
    case _ => None
  }

  /** If the filter Column is `attr = literal`, `literal = attr` or
    * `attr IN (literals…)`, return (attribute name, literal values) —
    * the shape a secondary index can serve. Null literals are dropped
    * (`x = NULL` / `IN (NULL)` never select a row). */
  def eqInOnAttribute(c: Column): Option[(String, Seq[Any])] = {
    c.node match {
      case f: UnresolvedFunction if f.functionName == "=" && f.arguments.size == 2 =>
        val Seq(x, y) = f.arguments
        attr(x).zip(lit(y)).orElse(attr(y).zip(lit(x)))
          .map { case (a, v) => (a, Seq(v).filter(_ != null)) }
      case f: UnresolvedFunction if f.functionName == "in" && f.arguments.size >= 2 =>
        attr(f.arguments.head).flatMap { a =>
          val vs = f.arguments.tail.map(lit)
          if (vs.forall(_.isDefined)) Some((a, vs.flatten.filter(_ != null))) else None
        }
      case _ => None
    }
  }

  /** If the filter Column is a comparison `attr op literal` (either arg
    * order), return (attribute name, op normalized to attr-on-the-left,
    * literal value) — the shape an ORDERED secondary index can serve as a
    * range read. Null literals disqualify (`x >= NULL` selects nothing a
    * range read could improve on). */
  def rangeOnAttribute(c: Column): Option[(String, String, Any)] = {
    val flip = Map(">=" -> "<=", "<=" -> ">=", ">" -> "<", "<" -> ">")
    c.node match {
      case f: UnresolvedFunction if flip.contains(f.functionName) && f.arguments.size == 2 =>
        val Seq(x, y) = f.arguments
        attr(x).zip(lit(y)).map { case (a, v) => (a, f.functionName, v) }
          .orElse(attr(y).zip(lit(x)).map { case (a, v) => (a, flip(f.functionName), v) })
          .filter(_._3 != null)
      case _ => None
    }
  }

  /** Bare attribute name of a Column, if it is exactly one. */
  def attributeName(c: Column): Option[String] = attr(c.node)

  /** True when the filter PROVABLY selects no row of a storage unit
    * whose per-column `[min, max]` ranges are `stats` (None = column
    * untracked ⇒ unknowable). Conservative three-valued logic over the
    * unresolved ColumnNode tree — the Delta-style data-skipping grammar:
    * and/or, the four comparisons, equality and IN against integral OR
    * string literals (string ranges compare in Spark's binary UTF-8
    * order — [[StatsRange.cmpToRange]]); a literal whose type disagrees
    * with the tracked range is Unknown, as is every other node shape,
    * and keeps the unit. `expr("...")`-built predicates arrive as a
    * [[org.apache.spark.sql.internal.SqlExpression]] leaf — parsed with
    * [[org.apache.spark.sql.catalyst.parser.CatalystSqlParser]] and
    * evaluated over the Catalyst tree by the same grammar, so durable
    * predicate takedowns replayed from SQL text keep their pruning.
    * Used by [[graft.core.ParquetLog]]'s bucket-stats pruning. */
  def statsProveEmpty(c: Column, stats: String => Option[StatsRange]): Boolean = {
    // (cmp(v, lo), cmp(v, hi)) when the literal's type matches the range
    def cmps(a: String, v: Any): Option[(Int, Int)] =
      stats(a).flatMap(_.cmpToRange(v))
    def eqEmpty(a: String, v: Any): Option[Boolean] =
      cmps(a, v).map { case (cl, ch) => cl < 0 || ch > 0 }
    def cmpEmpty(a: String, op: String, v: Any): Option[Boolean] =
      cmps(a, v).map { case (cl, ch) => op match {
        case ">"  => ch >= 0 // hi <= v: no row can exceed v
        case ">=" => ch > 0
        case "<"  => cl <= 0
        case "<=" => cl < 0
      } }
    val flip = Map(">" -> "<", "<" -> ">", ">=" -> "<=", "<=" -> ">=")
    def ev(n: ColumnNode): Boolean = n match {
      case f: UnresolvedFunction => f.functionName match {
        case "and" => f.arguments.exists(ev)
        case "or" => f.arguments.nonEmpty && f.arguments.forall(ev)
        case "=" if f.arguments.size == 2 =>
          val Seq(x, y) = f.arguments
          attr(x).zip(lit(y)).flatMap { case (a, v) => eqEmpty(a, v) }
            .orElse(attr(y).zip(lit(x)).flatMap { case (a, v) => eqEmpty(a, v) })
            .getOrElse(false)
        case op @ (">" | ">=" | "<" | "<=") if f.arguments.size == 2 =>
          val Seq(x, y) = f.arguments
          attr(x).zip(lit(y)).flatMap { case (a, v) => cmpEmpty(a, op, v) }
            .orElse(attr(y).zip(lit(x)).flatMap { case (a, v) => cmpEmpty(a, flip(op), v) })
            .getOrElse(false)
        case "in" if f.arguments.size >= 2 =>
          attr(f.arguments.head).exists { a =>
            val vs = f.arguments.tail.map(lit)
            // provable only when EVERY member is a known literal of the
            // range's type, outside the range (an unknown could match)
            vs.nonEmpty && vs.forall(_.flatMap(v => eqEmpty(a, v)).contains(true))
          }
        case _ => false
      }
      case s: org.apache.spark.sql.internal.SqlExpression =>
        // expr("...") leaf: parse once, walk the Catalyst tree
        scala.util.Try(
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(s.expression))
          .toOption.exists(e => evCatalyst(e, eqEmpty, cmpEmpty))
      case _ => false
    }
    ev(c.node)
  }

  /** The same conservative data-skipping walk over a PARSED Catalyst
    * expression tree — durable takedown predicates replay from SQL text
    * (`expr(sql)`), whose Column is one opaque [[org.apache.spark.sql.internal.SqlExpression]]
    * leaf the ColumnNode walk cannot see into. */
  private def evCatalyst(e: org.apache.spark.sql.catalyst.expressions.Expression,
      eqEmpty: (String, Any) => Option[Boolean],
      cmpEmpty: (String, String, Any) => Option[Boolean]): Boolean = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute => UAttr}
    def aName(x: ce.Expression): Option[String] = x match {
      case u: UAttr => Some(u.nameParts.mkString("."))
      case _ => None
    }
    def lv(x: ce.Expression): Option[Any] = x match {
      case ce.Literal(v, _) if v != null => Some(v)
      case _ => None
    }
    def binary(l: ce.Expression, r: ce.Expression,
        direct: (String, Any) => Option[Boolean],
        flipped: (String, Any) => Option[Boolean]): Boolean =
      aName(l).zip(lv(r)).flatMap { case (a, v) => direct(a, v) }
        .orElse(aName(r).zip(lv(l)).flatMap { case (a, v) => flipped(a, v) })
        .getOrElse(false)
    def ev(x: ce.Expression): Boolean = x match {
      case ce.And(l, r) => ev(l) || ev(r)
      case ce.Or(l, r) => ev(l) && ev(r)
      case ce.EqualTo(l, r) => binary(l, r, eqEmpty, eqEmpty)
      case ce.GreaterThan(l, r) =>
        binary(l, r, cmpEmpty(_, ">", _), cmpEmpty(_, "<", _))
      case ce.GreaterThanOrEqual(l, r) =>
        binary(l, r, cmpEmpty(_, ">=", _), cmpEmpty(_, "<=", _))
      case ce.LessThan(l, r) =>
        binary(l, r, cmpEmpty(_, "<", _), cmpEmpty(_, ">", _))
      case ce.LessThanOrEqual(l, r) =>
        binary(l, r, cmpEmpty(_, "<=", _), cmpEmpty(_, ">=", _))
      case ce.In(v, list) =>
        aName(v).exists { a =>
          list.nonEmpty && list.forall(m =>
            lv(m).flatMap(eqEmpty(a, _)).contains(true))
        }
      case _ => false
    }
    ev(e)
  }

  /** If the Column is an ALIASED bare `count(<literal>)` (non-distinct),
    * return the alias — the aggregate shape a covering index can serve
    * without touching the log. */
  def countAlias(c: Column): Option[String] = c.node match {
    case al: org.apache.spark.sql.internal.Alias if al.name.size == 1 =>
      al.child match {
        case f: UnresolvedFunction if f.functionName == "count" && !f.isDistinct &&
            f.arguments.size == 1 && lit(f.arguments.head).isDefined =>
          Some(al.name.head)
        case _ => None
      }
    case _ => None
  }

  /** If the Column is an ALIASED `min(attr)`/`max(attr)`, return
    * (fn, attribute, alias) — with attr = the log's seq column this is
    * the other aggregate the `(key, seq)` posting table covers. */
  def minMaxAlias(c: Column): Option[(String, String, String)] = c.node match {
    case al: org.apache.spark.sql.internal.Alias if al.name.size == 1 =>
      al.child match {
        case f: UnresolvedFunction if (f.functionName == "min" || f.functionName == "max") &&
            !f.isDistinct && f.arguments.size == 1 =>
          attr(f.arguments.head).map(a => (f.functionName, a, al.name.head))
        case _ => None
      }
    case _ => None
  }
}
