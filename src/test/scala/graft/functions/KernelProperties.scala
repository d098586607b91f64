package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-pinned bit-identity of the native codegen kernels against
  * their UDF twins over ARBITRARY inputs (the fixed-fixture twin tests
  * in OpsSpec cover known edges; these cover the unicode/odd-shape
  * space ScalaCheck explores — surrogate pairs, exotic casing,
  * pathological token runs). */
object KernelProperties extends Properties("NativeKernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session

  private val texts: Gen[List[String]] =
    Gen.resize(12, Gen.nonEmptyListOf(Gen.oneOf(
      Arbitrary.arbitrary[String],
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('İ'),
        Gen.const('ß'), Gen.const('中'))).map(_.mkString))))

  private def df(ss: List[String]) = {
    val spark0 = spark
    import spark0.implicits._
    ss.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def seqs(frame: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): Seq[Seq[Long]] =
    frame.select(col("doc_id"), c.as("v")).orderBy("doc_id")
      .collect().map(_.getAs[scala.collection.Seq[Long]]("v").toSeq).toSeq

  property("hashed shingles: native === UDF twin on arbitrary text") =
    forAll(texts, Gen.choose(1, 6)) { (ss, w) =>
      val d = df(ss)
      seqs(d, Dedup.hashedShinglesCol(col("text"), w)) ===
        seqs(d, Dedup.hashedShinglesUdf(w)(col("text")))
    }

  property("positional grams: native === UDF twin (exploded)") =
    forAll(texts, Gen.choose(1, 6)) { (ss, k) =>
      val d = df(ss)
      def rows(c: org.apache.spark.sql.Column) = d.select(col("doc_id"), explode(c).as("pg"))
        .select(col("doc_id"), col("pg._1"), col("pg._2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      rows(graft.functions.PositionalGrams.positional_grams(col("text"), k)) ===
        rows(Dedup.positionalGramsUdf(k)(col("text")))
    }

  property("minhash oph: native === UDF twin on arbitrary hash sets") =
    forAll(Gen.resize(10, Gen.nonEmptyListOf(Gen.resize(30, Gen.listOf(Arbitrary.arbitrary[Long])))),
        Gen.oneOf(4, 16, 64)) { (sets, perms) =>
      val spark0 = spark
      import spark0.implicits._
      val d = sets.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }.toDF("doc_id", "hs")
      seqs(d, graft.functions.MinhashOph.minhash_oph(col("hs"), perms)) ===
        seqs(d, Dedup.minhashOphUdf(perms)(col("hs")))
    }

  property("simhash64: native over raw text === UDF twin over tokens()") =
    forAll(texts) { ss =>
      val d = df(ss)
      def sigs(c: org.apache.spark.sql.Column) =
        d.select(col("doc_id"), c.as("v")).orderBy("doc_id").collect().map(_.getLong(1)).toSeq
      sigs(graft.functions.SimHash64.simhash64(col("text"))) ===
        sigs(Dedup.simhash64Udf(TextAnalysis.tokens(col("text"))))
    }

  property("lang id: native === UDF twin") =
    forAll(texts) { ss =>
      val d = df(ss)
      def preds(c: org.apache.spark.sql.Column) =
        d.select(col("doc_id"), c.as("v")).orderBy("doc_id")
          .collect().map(_.getAs[String]("v")).toSeq
      preds(graft.functions.LangId.lang_id(col("text"))) ===
        preds(TextAnalysis.langIdUdf(col("text")))
    }

  private implicit class EqOps[A](private val a: A) {
    def ===(b: A): Boolean = a == b
  }
}
