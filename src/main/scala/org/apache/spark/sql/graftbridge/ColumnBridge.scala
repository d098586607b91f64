package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

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
    * and/or, the four comparisons, equality and IN against integral
    * literals; every other node is Unknown and keeps the unit. Used by
    * [[graft.core.ParquetLog]]'s bucket-stats takedown pruning. */
  def statsProveEmpty(c: Column, stats: String => Option[(Long, Long)]): Boolean = {
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l); case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong); case b: Byte => Some(b.toLong)
      case _ => None
    }
    def ev(n: ColumnNode): Boolean = n match {
      case f: UnresolvedFunction => f.functionName match {
        case "and" => f.arguments.exists(ev)
        case "or" => f.arguments.nonEmpty && f.arguments.forall(ev)
        case "=" if f.arguments.size == 2 =>
          val Seq(x, y) = f.arguments
          (for { a <- attr(x); v <- lit(y).flatMap(asLong); r <- stats(a) }
            yield v < r._1 || v > r._2)
            .orElse(for { a <- attr(y); v <- lit(x).flatMap(asLong); r <- stats(a) }
              yield v < r._1 || v > r._2)
            .getOrElse(false)
        case op @ (">" | ">=" | "<" | "<=") if f.arguments.size == 2 =>
          val Seq(x, y) = f.arguments
          def prove(a: String, o: String, v: Long): Option[Boolean] =
            stats(a).map { case (lo, hi) => o match {
              case ">"  => hi <= v  // no row can exceed v
              case ">=" => hi < v
              case "<"  => lo >= v
              case "<=" => lo > v
            } }
          val flip = Map(">" -> "<", "<" -> ">", ">=" -> "<=", "<=" -> ">=")
          attr(x).zip(lit(y).flatMap(asLong)).flatMap { case (a, v) => prove(a, op, v) }
            .orElse(attr(y).zip(lit(x).flatMap(asLong))
              .flatMap { case (a, v) => prove(a, flip(op), v) })
            .getOrElse(false)
        case "in" if f.arguments.size >= 2 =>
          (for { a <- attr(f.arguments.head); r <- stats(a) } yield {
            val vs = f.arguments.tail.map(lit)
            // provable only when EVERY member is a known integral
            // literal outside the range (an unknown member could match)
            vs.forall(_.flatMap(asLong).exists(v => v < r._1 || v > r._2))
          }).getOrElse(false)
        case _ => false
      }
      case _ => false
    }
    ev(c.node)
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
