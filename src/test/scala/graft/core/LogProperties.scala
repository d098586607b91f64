package graft.core

import graft.SparkSpec
import graft.views.{MergeableReduceView, StatsReduceView, Stats}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants the reference only samples (SURVEY §5):
  * monotone contiguous since, batch-append ≡ single appends, rebuild
  * idempotence, reduce-view/oracle agreement on arbitrary inputs. */
object LogProperties extends Properties("FlumeLog") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session
  private val schema = StructType(Seq(StructField("foo", LongType)))
  private def rows(vs: Seq[Long]) = vs.map(v => Row(v))
  private val values: Gen[List[Long]] = Gen.resize(20, Gen.listOf(Gen.chooseNum(-1000L, 1000L)))

  property("since is monotone and contiguous across appends") = forAll(values, values) { (a, b) =>
    val log = new MemoryLog(spark, schema)
    val s0 = log.since
    log.appendRows(rows(a))
    val s1 = log.since
    log.appendRows(rows(b))
    val s2 = log.since
    s0 == -1L && s1 == a.size.toLong - 1 && s2 == a.size.toLong + b.size - 1 && s1 <= s2
  }

  property("batch append ≡ one-by-one appends") = forAll(values) { vs =>
    val batched = new MemoryLog(spark, schema)
    batched.appendRows(rows(vs))
    val single = new MemoryLog(spark, schema)
    vs.foreach(v => single.appendRows(Seq(Row(v))))
    val a = batched.read.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = single.read.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    a == b
  }

  property("rebuild is idempotent for reduce views") = forAll(Gen.resize(12, Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)))) { vs =>
    val db = new FlumeDb(new MemoryLog(spark, schema))
    db.use("stats", StatsReduceView("foo"))
    db.append(spark.createDataFrame(spark.sparkContext.parallelize(rows(vs)), schema))
    def value: Stats = db.gated("stats")(_.asInstanceOf[MergeableReduceView[Stats]].value.get)
    val before = value
    db.rebuild()
    val after = value
    before.n == after.n &&
      math.abs(before.mean - after.mean) < 1e-9 &&
      math.abs(before.stdevSamp - after.stdevSamp) < 1e-9
  }

  property("compact preserves contents, cursor, and future appends") = forAll(
    Gen.resize(6, Gen.nonEmptyListOf(Gen.resize(4, Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L))))),
    Gen.resize(4, Gen.listOf(Gen.chooseNum(-100L, 100L)))) { (batches, after) =>
    val dir = java.nio.file.Files.createTempDirectory("graft-prop-compact").toString
    val log = new ParquetLog(spark, dir, schema)
    batches.foreach(b => log.appendRows(rows(b)))
    val expectBefore = batches.flatten.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val cursorBefore = log.since
    log.compact()
    val got = log.read.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val appendOk = if (after.nonEmpty) {
      log.appendRows(rows(after))
      log.since == cursorBefore + after.size
    } else true
    got == expectBefore && log.since >= cursorBefore && appendOk
  }

  property("retract ≡ filter: arbitrary takedown sets remove exactly their rows, seqs/cursor stable") = forAll(
    Gen.resize(12, Gen.nonEmptyListOf(Gen.chooseNum(0L, 30L))),
    Gen.resize(6, Gen.listOf(Gen.chooseNum(0L, 30L))),
    Gen.resize(4, Gen.listOf(Gen.chooseNum(0L, 30L)))) { (vs, takedown, after) =>
    import org.apache.spark.sql.functions.col
    val log = new MemoryLog(spark, schema)
    log.appendRows(rows(vs))
    val stamped = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val cursorBefore = log.since
    val ids = spark.createDataFrame(
      spark.sparkContext.parallelize(takedown.distinct.map(Row(_)), 1), schema)
    val removed = log.retractIds(ids, "foo")
    val expect = stamped.filterNot { case (_, v) => takedown.contains(v) }
    val got = log.read.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val appendOk = if (after.nonEmpty) {
      log.appendRows(rows(after))
      log.since == cursorBefore + after.size // retired tail seqs never reused
    } else true
    removed == (stamped.size - expect.size).toLong &&
      got == expect && log.since >= cursorBefore && appendOk
  }

  property("expire ≡ filter(seq > horizon): arbitrary horizons on the bucketed layout") = forAll(
    Gen.resize(16, Gen.nonEmptyListOf(Gen.chooseNum(0L, 30L))),
    Gen.chooseNum(-2L, 20L),
    Gen.resize(4, Gen.listOf(Gen.chooseNum(0L, 30L)))) { (vs, horizon, after) =>
    // bucketSize 3 puts arbitrary horizons at every alignment: inside a
    // bucket, on its edge, before the log, past the tail
    val dir = java.nio.file.Files.createTempDirectory("graft-prop-expire").toString
    val log = new ParquetLog(spark, dir, schema, bucketSize = 3L)
    log.appendRows(rows(vs))
    val stamped = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val cursorBefore = log.since
    val removed = log.expire(horizon)
    val expect = stamped.filter(_._1 > horizon)
    val got = log.read.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val appendOk = if (after.nonEmpty) {
      log.appendRows(rows(after))
      log.since == cursorBefore + after.size // expired tail seqs never reused
    } else true
    removed == (stamped.size - expect.size).toLong &&
      got == expect && log.since >= cursorBefore && appendOk
  }

  property("db takedown with every view family mounted ≡ rebuild from the retracted log") = forAll(
    Gen.resize(8, Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(-50L, 50L)))),
    Gen.resize(4, Gen.listOf(Gen.chooseNum(-50L, 50L)))) { (kvs, takedownVs) =>
    import org.apache.spark.sql.functions._
    val kvSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val dirs = Seq(tmp("gp-dbr-log"), tmp("gp-dbr-ht"), tmp("gp-dbr-dim"), tmp("gp-dbr-idx"))
    try {
      val log = new ParquetLog(spark, dirs(0), kvSchema, bucketSize = 4L)
      val db = new FlumeDb(log)
        .use("ht", graft.views.PersistentHashtableView(dirs(1), "k"))
        .use("dim", graft.views.Scd2TableView(dirs(2), "k", "seq", Seq("v")))
        .use("sum", graft.views.SumReduceView("v"))
        .use("stats", StatsReduceView("v"))
        .use("idx", graft.views.PersistentIndexView.onColumn(dirs(3), "k"))
      // two appends so the delta chains have >1 unit
      val (h, t) = kvs.splitAt(kvs.size / 2 max 1)
      def df(rs: Seq[(String, Long)]) = spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map(r => Row(r._1, r._2))), kvSchema)
      db.append(df(h)); if (t.nonEmpty) db.append(df(t))
      db.retract(col("v").isin(takedownVs.distinct: _*))
      // ground truth from the retracted log itself
      val kept = log.read.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq // (seq, k, v)
      val ht = db.view("ht").view.asInstanceOf[graft.views.PersistentHashtableView]
      val htGot: Set[(String, Long, Long)] =
        if (kept.isEmpty) { if (ht.frameOption.isEmpty) Set.empty else Set(("CORRUPT", -1L, -1L)) }
        else ht.frame.select("k", "v", "seq").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val htWant = kept.groupBy(_._2).view.mapValues(_.maxBy(_._1)).values
        .map(r => (r._2, r._3, r._1)).toSet
      val dim = db.view("dim").view.asInstanceOf[graft.views.Scd2TableView]
      val dimGot: Set[(String, Long, Long)] =
        if (kept.isEmpty) Set.empty
        else dim.dimension.select("k", "from_seq", "v").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val dimWant = kept.map(r => (r._2, r._1, r._3)).toSet // one row per log record
      val (sumV, cnt) = db.gated("sum")(
        _.asInstanceOf[MergeableReduceView[(Double, Long)]].value.getOrElse((0.0, 0L)))
      val st = db.gated("stats")(_.asInstanceOf[MergeableReduceView[Stats]].value)
      val idx = db.view("idx").view.asInstanceOf[graft.views.PersistentIndexView]
      val idxGot = if (kept.isEmpty) Set.empty[(String, Long)]
        else idx.frame.select("key", "seq").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
      val idxWant = kept.map(r => (r._2, r._1)).toSet
      htGot == htWant &&
        dimGot == dimWant &&
        math.abs(sumV - kept.map(_._3).sum.toDouble) < 1e-6 && cnt == kept.size.toLong &&
        st.forall(_.n == kept.size.toLong) &&
        idxGot == idxWant
    } finally dirs.foreach { d =>
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p))
        graft.views.FsLists.walkDeepestFirst(p).foreach(java.nio.file.Files.delete)
    }
  }

  property("incremental stats across appends match a one-shot fold") = forAll(
    Gen.resize(10, Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))),
    Gen.resize(10, Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L)))) { (a, b) =>
    val db = new FlumeDb(new MemoryLog(spark, schema))
    db.use("stats", StatsReduceView("foo"))
    db.append(spark.createDataFrame(spark.sparkContext.parallelize(rows(a)), schema))
    db.append(spark.createDataFrame(spark.sparkContext.parallelize(rows(b)), schema))
    val st = db.gated("stats")(_.asInstanceOf[MergeableReduceView[Stats]].value.get)
    val all = a ++ b
    val mean = all.sum.toDouble / all.size
    val m2 = all.map(v => (v - mean) * (v - mean)).sum
    st.n == all.size.toLong &&
      math.abs(st.mean - mean) < 1e-9 &&
      math.abs(st.m2 - m2) < 1e-6
  }
}
