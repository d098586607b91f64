package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find over the same edges (driver-side, test-only). */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Both execution strategies must agree: `limit = 0` forces the
    * distributed alternating-star loop, the default takes the driver
    * union-find short-circuit. */
  private def ccOf(edges: Seq[(Long, Long)], driverLimit: Long = 500000L): Map[Long, Long] =
    Cluster.connectedComponents(edges.toDF("id_a", "id_b"), driverEdgeLimit = driverLimit)
      .as[(Long, Long)].collect().toMap

  private def bothPaths(name: String)(edges: Seq[(Long, Long)], want: Map[Long, Long]): Unit = {
    test(s"$name (driver union-find)") { assert(ccOf(edges) === want) }
    test(s"$name (distributed star loop)") { assert(ccOf(edges, driverLimit = 0L) === want) }
  }

  bothPaths("transitive chain collapses to one component")(
    // A~B, B~C, C~D: pair generator never emits A~D, clustering must
    Seq((1L, 2L), (2L, 3L), (3L, 4L)),
    Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))

  bothPaths("separate components keep separate minima; duplicates and reversed pairs are harmless")(
    Seq((10L, 7L), (7L, 10L), (10L, 7L), (20L, 25L), (3L, 3L)),
    Map(7L -> 7L, 10L -> 7L, 20L -> 20L, 25L -> 20L))

  test("empty pair set yields empty labels") {
    assert(ccOf(Seq.empty) === Map.empty)
  }

  test("matches union-find on random graphs, on both strategies") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 17
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }
      val want = bruteComponents(edges)
      assert(ccOf(edges) === want, s"trial $trial (driver): $edges")
      if (trial % 2 == 0)
        assert(ccOf(edges, driverLimit = 0L) === want, s"trial $trial (distributed): $edges")
    }
  }

  test("long path converges within the iteration budget (log rounds, not diameter)") {
    val path = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = ccOf(path, driverLimit = 0L) // the distributed loop is what the budget bounds
    assert(got.size === 200 && got.values.forall(_ == 0L))
  }

  test("dupClusters labels singletons with themselves and survivors by component min") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 4L)).toDF("id_a", "id_b")
    val got = Cluster.dupClusters(docs, pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L, 5L -> 5L))
  }
}
