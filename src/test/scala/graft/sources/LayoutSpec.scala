package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def withLayout[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("layoutspec").toString
    try f(dir)
    finally {
      import scala.util.Using
      Using(java.nio.file.Files.walk(java.nio.file.Paths.get(dir))) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("scanRange returns exactly the rows a plain filter would") {
    withLayout { dir =>
      val df = (0L until 5000L).map(i => (i, s"row-$i")).toDF("k", "v")
      Layout.writeRangeBucketed(df, dir, nBuckets = 16, key = "k")
      val got = Layout.scanRange(spark, dir, 1200, 1340)
        .orderBy("k").select("k", "v").as[(Long, String)].collect()
      val want = (1200L to 1340L).map(i => (i, s"row-$i"))
      assert(got.toSeq == want)
    }
  }

  test("bucket-edge rows are neither dropped nor duplicated") {
    withLayout { dir =>
      val df = (0L until 1000L).map(i => (i, i * 2)).toDF("k", "x")
      val (origin, width) = Layout.writeRangeBucketed(df, dir, nBuckets = 8, key = "k")
      // pick a range that starts exactly on a bucket boundary
      val lo = origin + width
      val got = Layout.scanRange(spark, dir, lo, lo + 10).select("k").as[Long].collect().sorted
      assert(got.toSeq == (lo to lo + 10).toSeq)
    }
  }

  test("key-range scan prunes partition directories at plan time") {
    withLayout { dir =>
      val df = (0L until 10000L).map(i => (i, i % 7)).toDF("k", "m")
      Layout.writeRangeBucketed(df, dir, nBuckets = 20, key = "k")
      val table = spark.read.parquet(dir)
      val filtered = Layout.scanRange(spark, dir, 500, 999)
      val (total, read) = Layout.pruningCounts(table, filtered)
      assert(total >= 18, s"expected ~20 bucket dirs, got $total")
      assert(read <= 3, s"narrow range should keep <=3 dirs, kept $read of $total")
    }
  }

  test("degenerate single-value key still round-trips") {
    withLayout { dir =>
      val df = Seq((42L, "a"), (42L, "b")).toDF("k", "v")
      Layout.writeRangeBucketed(df, dir, nBuckets = 4, key = "k")
      assert(Layout.scanRange(spark, dir, 42, 42).count() == 2)
      assert(Layout.scanRange(spark, dir, 0, 41).count() == 0)
    }
  }
}
