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

  // --- Z-order layout ---

  private def zGrid(n: Long) =
    (0L until n).map(i => (i % 200L, i / 200L, s"r$i")).toDF("x", "y", "v")

  test("scanBox returns exactly the rows a plain 2-D filter would, incl box edges") {
    withLayout { dir =>
      val df = zGrid(10000) // x in 0..199, y in 0..49
      Layout.writeZOrdered(df, dir, keyX = "x", keyY = "y", bitsPerDim = 6, nBuckets = 16)
      val got = Layout.scanBox(spark, dir, 17, 43, 5, 29)
        .select("x", "y", "v").as[(Long, Long, String)].collect().toSet
      val want = df.where($"x".between(17, 43) && $"y".between(5, 29))
        .select("x", "y", "v").as[(Long, Long, String)].collect().toSet
      assert(got == want && got.nonEmpty)
      assert(!Layout.scanBox(spark, dir, 17, 43, 5, 29).columns.exists(_.startsWith("__")))
    }
  }

  test("box scan prunes partition directories in BOTH dimensions at plan time") {
    withLayout { dir =>
      val df = zGrid(40000) // x in 0..199, y in 0..199
      Layout.writeZOrdered(df, dir, keyX = "x", keyY = "y", bitsPerDim = 8, nBuckets = 64)
      val table = spark.read.parquet(dir)
      // a narrow box in both dims: a single-key layout could prune only
      // one of the two; the morton prefix rectangles prune both
      val filtered = Layout.scanBox(spark, dir, 10, 30, 10, 30)
      val (total, read) = Layout.pruningCounts(table, filtered)
      assert(total >= 32, s"expected many z-bucket dirs, got $total")
      assert(read * 4 <= total, s"box should keep <=1/4 of dirs, kept $read of $total")
      // correctness under pruning
      assert(filtered.count() ==
        df.where($"x".between(10, 30) && $"y".between(10, 30)).count())
    }
  }

  test("query boxes outside or overlapping the domain edge clamp correctly") {
    withLayout { dir =>
      val df = zGrid(2000) // x 0..199, y 0..9
      Layout.writeZOrdered(df, dir, keyX = "x", keyY = "y", bitsPerDim = 4, nBuckets = 4)
      // overlapping the edge: clamps to the domain
      assert(Layout.scanBox(spark, dir, 190, 500, -5, 3).count() ==
        df.where($"x" >= 190 && $"y" <= 3).count())
      // entirely outside
      assert(Layout.scanBox(spark, dir, 1000, 2000, 0, 9).count() == 0)
      // inverted box is empty, not an error
      assert(Layout.scanBox(spark, dir, 50, 10, 0, 9).count() == 0)
    }
  }
}
