package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate clustering: turn near-duplicate PAIRS (the output of the
  * [[Dedup]] family) into connected COMPONENTS, so a pipeline can keep
  * exactly one canonical document per duplicate group — the step a real
  * training-data curation run needs after pair generation, because
  * near-duplication is transitive in the data (A~B, B~C) even when the
  * pair generator only emits A~B and B~C.
  *
  * The algorithm is alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14): each round
  * computes per-node neighborhood minima with a groupBy (map-side
  * partial aggregation — a celebrity node with 10M duplicate neighbors
  * costs one partial min per map task, not a 10M-row array on one
  * reducer) and rewires edges with an equi-join (AQE splits the skewed
  * probe partitions). The edge set converges to a star forest pointing
  * every node at its component minimum in O(log^2 n) rounds — at 100 TB
  * this is the difference between "a couple of joins per round for ~log
  * rounds" and a label-propagation loop whose round count is the
  * component DIAMETER (a 1M-long chain of near-dups would take 1M
  * rounds).
  */
object Cluster {

  /** Connected components of the undirected graph given by pair rows.
    * Returns `(id, cluster_id)` for every node that appears in at least
    * one pair, where `cluster_id` is the minimum id in the component —
    * deterministic regardless of partitioning or iteration order.
    *
    * Each iteration localCheckpoints the edge frame: the loop would
    * otherwise stack two joins + unions + distincts per round onto the
    * lineage and re-plan the whole history at every convergence check.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 50,
      driverEdgeLimit: Long = 500000L): DataFrame = {
    // canonical orientation big -> small; both stars preserve it, so the
    // invariant "u > v on every edge" holds at every round
    var edges = pairs
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .where(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
      .distinct()
      .localCheckpoint()

    // Strategy switch, same spirit as a broadcast-join threshold: the
    // deduplicated edge set is already materialized, so its count is
    // free, and below ~500k edges (8 MB of longs) an exact driver-side
    // union-find replaces O(log^2 n) shuffle rounds with one collect.
    // The distributed loop below is the 100 TB path; this is the "the
    // pair generator found almost nothing" path, which is the common
    // case for a well-curated corpus.
    val edgeCount = edges.count()
    if (edgeCount > 0 && edgeCount <= driverEdgeLimit) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.collect().foreach { row =>
        val (ru, rv) = (find(row.getLong(0)), find(row.getLong(1)))
        if (ru != rv) { // union by min id -> the component root IS the min
          if (ru < rv) parent(rv) = ru else parent(ru) = rv
        }
        parent.getOrElseUpdate(row.getLong(0), find(row.getLong(0)))
        parent.getOrElseUpdate(row.getLong(1), find(row.getLong(1)))
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "cluster_id")
    }

    var converged = edgeCount == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: per node u (over BOTH endpoints' neighborhoods),
      // connect every strictly-larger neighbor to min(N(u) ∪ {u}).
      // No distinct here: duplicates can't change the small-star minima
      // and the final distinct cleans them — one less exchange per round.
      val nbrs = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = nbrs.groupBy("u").agg(min("v").as("mn"))
      val large = nbrs.join(minsL, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("nu"), least(col("mn"), col("u")).as("nv"))
        .toDF("u", "v")

      // small-star: per node u over its smaller neighbors (which is ALL
      // of them under the orientation invariant), point u and every
      // non-min neighbor at the min
      val minsS = large.groupBy("u").agg(min("v").as("mn"))
      val small = minsS.select(col("u"), col("mn").as("v"))
        .unionByName(large.join(minsS, "u")
          .where(col("v") =!= col("mn"))
          .select(col("v").as("nu"), col("mn").as("nv"))
          .toDF("u", "v"))
        .distinct()
        // LAZY checkpoint: the convergence-check job below is the first
        // to compute these partitions, so it doubles as the
        // materialization pass — one job per round instead of two
        .localCheckpoint(false)

      // exact convergence in ONE job: both sides are distinct sets, so
      // the edge set changed iff some (u,v) appears exactly once in the
      // union. Exact, not a checksum — a hash-collision "false
      // converged" would emit silently wrong clusters.
      converged = small.unionByName(edges)
        .groupBy("u", "v").agg(count(lit(1)).as("c"))
        .where(col("c") === 1)
        .isEmpty
      edges = small
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(s"connectedComponents did not converge in $maxIter rounds")

    // star forest: every non-root points at the root; roots label themselves
    edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .unionByName(edges.select(col("v").as("id"), col("v").as("cluster_id")).distinct())
      .distinct()
  }

  /** Survivor selection over a corpus: label every document with the
    * minimum doc id of its near-duplicate component (itself when it has
    * no duplicates). Downstream keeps `doc_id == cluster_id`. */
  def dupClusters(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol)
    val base = docs.select(col(idCol).cast("long").as(idCol))
    base.join(labels, base(idCol) === labels("id"), "left")
      .select(base(idCol), coalesce(col("cluster_id"), base(idCol)).as("cluster_id"))
  }

  /** QUALITY-based survivor selection: per duplicate cluster, keep the
    * member with the best (score DESC, id ASC) — "which copy do we
    * train on" once clusters are known (min-id labeling answers *which
    * cluster*, this answers *which member*). One shuffle on cluster_id;
    * the argmax is a map-side-combined `max_by` on a (score, -id)
    * struct, so no per-cluster sort is ever planned. */
  def survivors(
      clustered: DataFrame,
      scores: DataFrame,
      idCol: String = "doc_id",
      clusterCol: String = "cluster_id",
      scoreCol: String = "score"): DataFrame =
    clustered.join(scores, idCol)
      .groupBy(col(clusterCol))
      .agg(
        max_by(col(idCol), struct(col(scoreCol), (-col(idCol)).as("nid"))).as("survivor_id"),
        max(col(scoreCol)).as("survivor_score"),
        count(lit(1)).as("n_members"))
}
