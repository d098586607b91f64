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
}
