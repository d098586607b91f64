package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def withDir[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("bucketedspec").toString
    try f(dir)
    finally {
      import scala.util.Using
      Using(java.nio.file.Files.walk(java.nio.file.Paths.get(dir))) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  private def executedString(df: DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  /** Force the join shape under test: no broadcast shortcut. */
  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-located bucketed join needs no exchange and matches the plain join") {
    withDir { dir =>
      val a = (0L until 3000L).map(i => (i % 500, i)).toDF("k", "va")
      val b = (0L until 4000L).map(i => (i % 700, i * 2)).toDF("k", "vb")
      Bucketed.write(a.repartition(4, col("k")), s"$dir/a", "bkt_a", "k", 4)
      Bucketed.write(b.repartition(4, col("k")), s"$dir/b", "bkt_b", "k", 4)
      try {
        withNoBroadcast {
          val joined = Bucketed.table(spark, "bkt_a")
            .join(Bucketed.table(spark, "bkt_b"), "k")
          val plan = executedString(joined)
          assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(2000)}")
          assert(!plan.contains("Exchange"),
            s"co-located join must not shuffle either side:\n${plan.take(3000)}")
          val got = joined.select("k", "va", "vb").as[(Long, Long, Long)].collect().sorted
          val want = a.join(b, "k").select("k", "va", "vb")
            .as[(Long, Long, Long)].collect().sorted
          assert(got.toSeq == want.toSeq)
        }
      } finally {
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
      }
    }
  }

  test("register re-attaches an existing layout without rewriting files") {
    withDir { dir =>
      val a = (0L until 2000L).map(i => (i % 300, s"x$i")).toDF("k", "v")
      Bucketed.write(a.repartition(4, col("k")), s"$dir/a", "bkt_reg", "k", 4)
      try {
        val before = Bucketed.table(spark, "bkt_reg").count()
        // simulate a fresh session losing the in-memory catalog entry
        spark.sql("DROP TABLE IF EXISTS bkt_reg")
        Bucketed.register(spark, s"$dir/a", "bkt_reg", "k", 4, "k BIGINT, v STRING")
        val t = Bucketed.table(spark, "bkt_reg")
        assert(t.count() == before)
        // bucket metadata survived the re-attach: a self-join still
        // plans with no exchange
        withNoBroadcast {
          val plan = executedString(t.join(Bucketed.table(spark, "bkt_reg"), "k"))
          assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
            s"re-registered table lost bucketing:\n${plan.take(3000)}")
        }
      } finally spark.sql("DROP TABLE IF EXISTS bkt_reg")
    }
  }
}
