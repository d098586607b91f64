package graft.ops

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  test("flags docs sharing an 8-gram with the benchmark, with exact shared counts") {
    val docs = Seq(
      // contains benchmark tokens 1..9 => shares 8-grams [1..8], [2..9] = 2
      (1L, "prefix alpha bravo charlie delta echo foxtrot golf hotel india suffix words here"),
      // contains all 10 benchmark tokens => shares all 3 8-grams
      (2L, s"intro $benchText outro"),
      // shares only 7 consecutive tokens => no 8-gram overlap
      (3L, "alpha bravo charlie delta echo foxtrot golf different tail tokens entirely now"),
      // unrelated
      (4L, "completely unrelated document text with many distinct tokens in it today")
    ).toDF("doc_id", "text")
    val bench = Seq(benchText).toDF("text")

    val got = Decontaminate.sharedNgrams(docs, bench)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 3L))
  }

  test("clean drops exactly the contaminated docs") {
    val docs = Seq(
      (1L, s"$benchText and more"),
      (2L, "nothing in common with the benchmark at all in this one")
    ).toDF("doc_id", "text")
    val bench = Seq(benchText).toDF("text")
    val kept = Decontaminate.clean(docs, bench).select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }

  test("short docs fall back to token-level overlap") {
    val docs = Seq((1L, "alpha zulu"), (2L, "yankee zulu xray")).toDF("doc_id", "text")
    val bench = Seq("alpha").toDF("text")
    val got = Decontaminate.sharedNgrams(docs, bench)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L))
  }
}
