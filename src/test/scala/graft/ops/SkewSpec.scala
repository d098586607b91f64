package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The OTHER skew remedy: `Skew.salted*` rewrites the query; AQE's
  * skew-join handling rewrites the RUNTIME plan, splitting an oversized
  * shuffle partition into parallel sub-reads. This spec pins that the
  * documented non-salted path actually engages on this Spark build —
  * the 100 TB contract is "hot keys do not serialize a join onto one
  * task" whichever remedy is active. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join (skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~97% of the fact side, 30 cold keys
      val fact = spark.range(0, 300000L)
        .select((when(col("id") % 30 === 0, 0L).otherwise(col("id") % 30)).as("k"),
          concat(lit("payload-"), col("id")).as(("v")))
      val dim = spark.range(0, 30L).select(col("id").as("k"), (col("id") * 10).as("d"))
      val joined = fact.join(dim, "k")
      assert(joined.collect().length === 300000)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true):\n${plan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
