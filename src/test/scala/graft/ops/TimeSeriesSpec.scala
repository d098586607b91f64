package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resampleLocf fills interior gaps with the last observation, per key") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 00:40:00"), 20.0), // same hour -> averaged
      (1L, ts("2024-01-01 03:05:00"), 7.0),  // hours 1,2 missing -> LOCF 15.0
      (2L, ts("2024-01-01 05:00:00"), 1.0)   // single point -> single bucket
    ).toDF("user_id", "t", "value")
    val r = TimeSeries.resampleLocf(df, "user_id", col("t"), col("value"))
      .orderBy("user_id", "bucket")
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).toString, x.getDouble(2)))
    assert(r.toSeq === Seq(
      (1L, "2024-01-01 00:00:00.0", 15.0),
      (1L, "2024-01-01 01:00:00.0", 15.0),
      (1L, "2024-01-01 02:00:00.0", 15.0),
      (1L, "2024-01-01 03:00:00.0", 7.0),
      (2L, "2024-01-01 05:00:00.0", 1.0)))
  }

  test("grid spans each key's own range — no cross-key padding") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-01-01 10:00:00"), 2.0),
      (2L, ts("2024-01-01 11:30:00"), 3.0)
    ).toDF("user_id", "t", "value")
    val r = TimeSeries.resampleLocf(df, "user_id", col("t"), col("value"))
    // key 1: one bucket; key 2: two buckets — never key 1 padded to hour 11
    assert(r.groupBy("user_id").count().orderBy("user_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq === Seq((1L, 1L), (2L, 2L)))
  }

  test("rollingZscore flags a planted spike against its trailing baseline only") {
    // key 1: ten quiet observations around 10, then a spike, then quiet
    // again — only the spike is flagged; the spike itself must not be
    // part of its own baseline (frame excludes the current row)
    val rows = (1 to 10).map(i => (1L, i.toLong, 10.0 + (i % 3) * 0.1)) ++
      Seq((1L, 11L, 100.0)) ++ (12 to 15).map(i => (1L, i.toLong, 10.1))
    val df = rows.toDF("k", "seq", "v")
    val r = TimeSeries.rollingZscore(df, "k", col("seq"), col("v"),
      lookback = 10, minObs = 5, z = 2.5).collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(11L))
    val row = r.head
    assert(row.getDouble(2) === 100.0)
    assert(row.getLong(5) === 10L) // n_base: full lookback
    assert(row.getDouble(6) > 100) // zscore of a 90-sigma-ish spike
  }

  test("rollingZscore suppresses early rows below minObs — no zero-variance noise") {
    // first observations of a key have thin baselines; rows 1..minObs
    // are unscorable by construction even when wildly different
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 500.0), (1L, 3L, 5.0), (1L, 4L, 500.0))
      .toDF("k", "seq", "v")
    val r = TimeSeries.rollingZscore(df, "k", col("seq"), col("v"), minObs = 5)
    assert(r.count() === 0L)
  }

  test("rollingZscore zero-variance baseline: any nonzero deviation flags, zscore is null") {
    val rows = (1 to 6).map(i => (1L, i.toLong, 7.0)) :+ ((1L, 7L, 7.5))
    val df = rows.toDF("k", "seq", "v")
    val r = TimeSeries.rollingZscore(df, "k", col("seq"), col("v"), minObs = 5).collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(7L))
    assert(r.head.isNullAt(6)) // sd = 0 -> no finite z, the mad = 0 convention
  }

  test("ewma: constant series is a fixed point; recency outweighs history; truncation at lookback") {
    val df = ((1 to 6).map(i => (1L, i.toLong, 5.0)) ++ // constant -> ewma 5.0
      Seq((2L, 1L, 0.0), (2L, 2L, 0.0), (2L, 3L, 1.0),  // recent 1 beats old 1
        (3L, 1L, 1.0), (3L, 2L, 0.0), (3L, 3L, 0.0)))
      .toDF("k", "seq", "v")
    val r = TimeSeries.ewma(df, "k", col("seq"), col("v"), lookback = 3, decay = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    (1 to 6).foreach(i => assert(r((1L, i.toLong)) === 5.0, s"constant fixed point at $i"))
    // weights at len 3: 0.25, 0.5, 1.0 (normalized /1.75)
    assert(r((2L, 3L)) === 0.5714) // recent 1: 1/1.75
    assert(r((3L, 3L)) === 0.1429) // old 1: 0.25/1.75
    assert(r((2L, 3L)) > r((3L, 3L)), "recency must dominate")
    // truncation: only the last `lookback` rows contribute — a spike
    // older than the window leaves no trace
    val spike = (Seq((9L, 1L, 1000.0)) ++ (2 to 5).map(i => (9L, i.toLong, 1.0)))
      .toDF("k", "seq", "v")
    val out = TimeSeries.ewma(spike, "k", col("seq"), col("v"), lookback = 3, decay = 0.5)
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(out(5L) === 1.0, s"seq-1 spike must age out of the window, got ${out(5L)}")
  }

  test("rollingZscore baselines never cross keys") {
    // key 1 quiet at 10, key 2 quiet at 1000: key 2's first value would
    // be a huge outlier against key 1's baseline but must not be scored
    // against it
    val rows = (1 to 8).map(i => (1L, i.toLong, 10.0)) ++
      (1 to 8).map(i => (2L, i.toLong, 1000.0))
    val df = rows.toDF("k", "seq", "v")
    assert(TimeSeries.rollingZscore(df, "k", col("seq"), col("v"), minObs = 5).count() === 0L)
  }
}
