package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("trainDriver reproduces the classic Sennrich merge order with deterministic ties") {
    // low×5, lower×2, newest×6, widest×3: (e,s) and (s,t) tie at 9 —
    // lexicographic tie-break picks (e,s); then (es,t); then (l,o) over
    // (o,w) at 7; then (lo,w).
    val wf = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainDriver(wf, 4)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) === Seq(1, 2, 3, 4))
  }

  test("applyMerges is a single left-to-right greedy pass per rank") {
    import spark.implicits._
    val df = Seq("aaa", "aaaa", "ababab", "ba").toDF("word")
    val enc = df.select(col("word"),
      Bpe.encodeWord(col("word"), Seq(Bpe.Merge(1, "a", "a"), Bpe.Merge(2, "a", "b"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(enc("aaa") === Seq("aa", "a"))      // greedy pass: no re-scan overlap
    assert(enc("aaaa") === Seq("aa", "aa"))
    assert(enc("ababab") === Seq("ab", "ab", "ab"))
    assert(enc("ba") === Seq("b", "a"))
  }

  test("encode round-trips: concatenated subtokens equal the word") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs, 20)
    val bad = Bpe.wordCounts(docs)
      .select(col("word"), array_join(Bpe.encodeWord(col("word"), merges), "").as("glued"))
      .where(col("word") =!= col("glued"))
    assert(bad.count() === 0L)
  }

  test("distributed trainer equals the driver trainer (strategy switch parity)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = Bpe.wordCounts(docs)
    val driver = Bpe.trainDriver(
      wc.collect().map(r => (r.getString(0), r.getLong(1))), 12)
    val dist = Bpe.trainDistributed(wc, 12)
    assert(dist === driver)
  }
}
