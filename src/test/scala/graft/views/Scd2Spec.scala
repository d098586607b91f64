package graft.views

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  private def versions = {
    import spark.implicits._
    // (key, seq, value): interleaved versions, single-version keys, and
    // a key whose versions all land in the second half of the log
    Seq(
      (1L, 0L, "a"), (2L, 1L, "x"), (1L, 2L, "b"), (3L, 3L, "only"),
      (2L, 4L, "y"), (1L, 5L, "c"), (4L, 6L, "late"), (2L, 7L, "z"),
      (4L, 8L, "late2")
    ).toDF("k", "seq", "v")
  }

  private def dimRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3), r.getString(4))).toSet

  test("dimension: intervals tile each key's history; exactly one current row per key") {
    val dim = Scd2.dimension(versions, "k", "seq", Seq("v"))
    val rows = dimRows(dim)
    // key 1: three versions, [0,2) [2,5) [5,∞)
    assert(rows.contains((1L, 0L, 2L, false, "a")))
    assert(rows.contains((1L, 2L, 5L, false, "b")))
    assert(rows.contains((1L, 5L, -1L, true, "c")))
    // single-version key is current from birth
    assert(rows.contains((3L, 3L, -1L, true, "only")))
    // one row per log record; one current row per key
    assert(dim.count() === versions.count())
    assert(dim.where(col("is_current")).groupBy("k").count()
      .where(col("count") =!= 1).count() === 0L)
  }

  test("asOf == latest-per-key replay at ANY seq (record granularity)") {
    val dim = Scd2.dimension(versions, "k", "seq", Seq("v"))
    (0L to 8L).foreach { at =>
      val got = Scd2.asOf(dim, at).select(col("k"), col("from_seq"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val replay = versions.where(col("seq") <= at)
        .groupBy("k").agg(max("seq").as("s"), max_by(col("v"), col("seq")).as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === replay, s"as-of $at must equal the log replay")
    }
  }

  test("asOf agrees with the delta protocol's batch-granular frameAsOf at batch boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    val ht = new PersistentHashtableView(spark, s"$dir/ht", 1, "k", "seq")
    ht.absorb(versions.where(col("seq") <= 4), 4L)
    ht.absorb(versions.where(col("seq") > 4), 8L)
    val dim = Scd2.dimension(versions, "k", "seq", Seq("v"))
    Seq(4L, 8L).foreach { at =>
      val fa = ht.frameAsOf(at).select("k", "seq", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val ao = Scd2.asOf(dim, at).select(col("k"), col("from_seq"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(ao === fa, s"as-of $at must equal frameAsOf at the batch boundary")
    }
  }

  test("advance == full rebuild, at every split point; empty delta is the identity") {
    val full = dimRows(Scd2.dimension(versions, "k", "seq", Seq("v")))
    (0L to 8L).foreach { s =>
      val stored = Scd2.dimension(versions.where(col("seq") <= s), "k", "seq", Seq("v"))
      val delta = versions.where(col("seq") > s)
      val adv =
        if (delta.isEmpty) stored
        else Scd2.advance(stored, delta, "k", "seq", Seq("v"))
      assert(dimRows(adv) === full, s"advance from split $s must equal the rebuild")
    }
  }
}
