package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packing equals the single-partition global prefix scan") {
    // ids with gaps and skewed doc lengths, many buckets -> the
    // cross-bucket offset path is actually exercised
    val docs = Seq.tabulate(500) { i =>
      val id = i.toLong * 7 + (i % 3)
      (id, Seq.fill(i % 37 + 1)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = Packing.packSequences(docs, capacity = 64, nBuckets = 16)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect()

    // reference: driver-side exclusive prefix sum in doc order
    val ref = got.map(r => (r._1, r._2)).sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .drop(1)
      .map { case (id, n, cumAfter) => (id, n, (cumAfter - n) / 64, (cumAfter - n) % 64) }
    assert(got.toSeq == ref.toSeq)
  }

  test("parity holds at every bucketing granularity") {
    val docs = Seq.tabulate(200) { i =>
      (i.toLong * 13 + (i % 5), Seq.fill(i % 23 + 1)("t").mkString(" "))
    }.toDF("doc_id", "text")
    val want = Packing.packSequences(docs, capacity = 32, nBuckets = 1)
      .orderBy("doc_id").collect().toSeq
    for (nb <- Seq(3, 17, 64, 1000)) {
      val got = Packing.packSequences(docs, capacity = 32, nBuckets = nb)
        .orderBy("doc_id").collect().toSeq
      assert(got == want, s"nBuckets=$nb diverged from single-bucket reference")
    }
  }

  test("a document straddling a boundary starts in the sequence holding its first token") {
    val docs = Seq((1L, Seq.fill(60)("a").mkString(" ")), (2L, Seq.fill(10)("b").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Packing.packSequences(docs, capacity = 64, nBuckets = 4)
      .orderBy("doc_id").select("seq_id", "seq_offset").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 0L), (0L, 60L))) // doc 2 starts at offset 60, spills into seq 1
  }

  test("empty input returns empty") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Packing.packSequences(docs, capacity = 8).count() == 0)
  }
}
