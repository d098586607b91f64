package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** flumeview-query (`/root/reference/README.md:94`): a declarative
  * map-filter-reduce query surface over the log.
  *
  * In the reference this is a JS "functional query language" with index
  * selection; on Spark the DataFrame DSL *is* that language and Catalyst
  * *is* the index/pushdown selector — so `Query` is a thin, serializable
  * description that compiles to DataFrame operators and inherits predicate
  * pushdown, column pruning, limit pushdown and `TakeOrderedAndProject`
  * (top-k) for free.
  */
final case class Query(
    filters: Seq[Column] = Nil,
    projections: Seq[Column] = Nil,
    sort: Seq[Column] = Nil,
    limitN: Option[Int] = None,
    groupBys: Seq[Column] = Nil,
    aggs: Seq[Column] = Nil) {

  def where(c: Column): Query = copy(filters = filters :+ c)
  def select(cs: Column*): Query = copy(projections = projections ++ cs)
  def orderBy(cs: Column*): Query = copy(sort = sort ++ cs)
  def limit(n: Int): Query = copy(limitN = Some(n))
  def groupBy(cs: Column*): Query = copy(groupBys = groupBys ++ cs)
  def agg(cs: Column*): Query = copy(aggs = aggs ++ cs)

  /** Compile to a DataFrame plan. Order: filter → group/agg → project →
    * sort → limit (filters before aggregation so they push to the scan). */
  def run(log: DataFrame): DataFrame = {
    var df = log
    filters.foreach(f => df = df.where(f))
    if (groupBys.nonEmpty || aggs.nonEmpty) {
      df =
        if (groupBys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
        else df.groupBy(groupBys: _*).agg(aggs.head, aggs.tail: _*)
    }
    if (projections.nonEmpty) df = df.select(projections: _*)
    if (sort.nonEmpty) df = df.orderBy(sort: _*)
    limitN.foreach(n => df = df.limit(n))
    df
  }
}

object Query {
  def apply(): Query = new Query()
}
