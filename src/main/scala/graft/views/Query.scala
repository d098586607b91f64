package graft.views

import graft.core.FlumeDb
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType

/** flumeview-query (`/root/reference/README.md:94`): a declarative
  * map-filter-reduce query surface over the log.
  *
  * In the reference this is a JS "functional query language" with index
  * selection; on Spark the DataFrame DSL *is* that language and Catalyst
  * *is* the pushdown selector — so `Query` is a thin, serializable
  * description that compiles to DataFrame operators and inherits predicate
  * pushdown, column pruning, limit pushdown and `TakeOrderedAndProject`
  * (top-k) for free.
  *
  * What Catalyst does NOT know about is the db's mounted secondary
  * indexes. [[run(db*]] adds that half of flumeview-query's contract:
  * an equality / `isin` conjunct on a column covered by a mounted
  * [[IndexView.onColumn]] / [[PersistentIndexView.onColumn]] is rewritten
  * into a posting-table lookup — seqs come from the (small, keyed) index
  * state, and the log is read by seq like a batch of point gets — instead
  * of a full scan + filter of the log.
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
  def run(log: DataFrame): DataFrame =
    finish(filters.foldLeft(log)((d, f) => d.where(f)))

  /** Run against a [[FlumeDb]], consulting its mounted views for index
    * selection. If an equality/`isin` conjunct matches a mounted
    * single-column index, the plan becomes:
    *
    *   posting lookup (key-filtered index state) → seq list →
    *   log read by seq → residual filters → rest of the query.
    *
    * When the seq list is small (≤ `maxInline`) it is collected and
    * inlined as an `isin` predicate on the log's seq column — that pushes
    * to the parquet scan as row-group skipping, the distributed analog of
    * the reference's index-then-point-get. A bigger posting list falls
    * back to a semi-join (never worse than the scan it replaces). The
    * collect is fenced by `maxInline` rows of 8-byte seqs, same
    * model-sized-collect discipline as the IVF centroids.
    *
    * With no matching index the query runs as a plain log scan and
    * Catalyst's own pushdown takes over. */
  def run(db: FlumeDb, maxInline: Int = 8192): DataFrame = {
    val conjuncts = filters.flatMap(ColumnBridge.conjuncts)
    Query.indexHit(db, conjuncts) match {
      case None => run(db.mapped)
      case Some((viewName, matchedIdx, keys)) =>
        db.gated(viewName)(_.frameOption) match {
          case None => run(db.mapped)
          case Some(posting) =>
            val sc = db.log.seqCol
            val seqDf = posting.where(col("key").isin(keys: _*)).select(col("seq"))
            val residual = conjuncts.zipWithIndex.collect { case (c, j) if j != matchedIdx => c }
            val head = seqDf.limit(maxInline + 1).collect().map(_.getLong(0))
            val base =
              if (head.isEmpty) db.mapped.where(lit(false))
              else if (head.length <= maxInline)
                db.mapped.where(col(sc).isin(head.toIndexedSeq: _*))
              else
                db.mapped.join(seqDf.withColumnRenamed("seq", sc), Seq(sc), "left_semi")
            finish(residual.foldLeft(base)((d, f) => d.where(f)))
        }
    }
  }

  private def finish(filtered: DataFrame): DataFrame = {
    var df = filtered
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

  /** Literal value → the string key the single-column index stores. The
    * index build writes `cast(col as string)`; the filter `col = lit`
    * coerces the literal to the COLUMN's type first — so the key is
    * `cast(cast(lit as colType) as string)`, byte-for-byte what the
    * build produced for a matching row. A value the column type cannot
    * represent casts to null → disqualified (fall back to the scan
    * rather than risk a wrong-encoded lookup). */
  private def keyString(v: Any, colType: org.apache.spark.sql.types.DataType): Option[String] = {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(v)
    val typed = if (lit.dataType == colType) lit else Cast(lit, colType)
    Option(Cast(typed, StringType).eval(null)).map(_.toString)
  }

  /** First conjunct of the form `indexedCol = lit` / `indexedCol in
    * (lits…)` for which the db has a mounted single-column index:
    * (view name, conjunct position, key strings). */
  private def indexHit(
      db: FlumeDb, conjuncts: Seq[Column]): Option[(String, Int, Seq[String])] = {
    val indexes: Map[String, String] = db.viewNames.flatMap { n =>
      db.view(n).view match {
        case iv: IndexView           => iv.indexedColumn.map(_ -> n)
        case pv: PersistentIndexView => pv.indexedColumn.map(_ -> n)
        case _                       => None
      }
    }.toMap
    if (indexes.isEmpty) return None
    lazy val schema = db.mapped.schema
    conjuncts.zipWithIndex.collectFirst(Function.unlift { case (c, i) =>
      for {
        (attr, values) <- ColumnBridge.eqInOnAttribute(c)
        viewName <- indexes.get(attr)
        field <- schema.find(_.name == attr)
        keys <- Some(values.flatMap(v => keyString(v, field.dataType)))
        // a key that failed conversion means we can't trust the lookup
        if keys.length == values.length
      } yield (viewName, i, keys)
    })
  }
}
