package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-permutation MinHash (Li et al. 2012, "One Permutation Hashing")
  * of a pre-hashed shingle set (`array<long>`): bucket by `h mod perms`
  * with a re-mixed min per bucket, then rotation densification for empty
  * buckets. O(K + perms) per document versus O(K × perms) for classic
  * MinHash.
  *
  * Native form of the dedup family's signature pass — runs on every
  * document of every MinHash query (LSH, verified, incremental, curate),
  * immediately downstream of [[HashedShingles]], so the two stages now
  * fuse into one codegen'd projection with no ScalaUDF conversion wall
  * between them (the UDF form re-boxed the shingle array to Seq[Long]
  * and the signature back again). Bit-identical to the retained UDF
  * twin (`Dedup.minhashOphUdf`), pinned by OpsSpec.
  */
case class MinhashOph(child: Expression, perms: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_oph requires array<long> input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    MinhashOph.compute(a.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashOph.compute($a, $perms);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashOph {

  /** Column wrapper: native codegen'd one-permutation MinHash. */
  def minhash_oph(hashedShingles: Column, perms: Int): Column =
    ColumnBridge.column(MinhashOph(ColumnBridge.expression(hashedShingles), perms))

  /** Shared kernel for interpreted eval and generated code. */
  def compute(hs: ArrayData, perms: Int): ArrayData = {
    val sig = new Array[Long](perms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      val b = (((h % perms) + perms) % perms).toInt
      // re-mix so the bucket min is independent of the bucketing bits
      val m = java.lang.Long.rotateLeft(h, 21) * 0x9e3779b97f4a7c15L
      if (m < sig(b)) sig(b) = m
      i += 1
    }
    var p = 0
    while (p < perms) { // densify: borrow circularly from the next filled bucket
      if (sig(p) == Long.MaxValue) {
        var j = (p + 1) % perms
        var hops = 1
        while (sig(j) == Long.MaxValue && hops < perms) { j = (j + 1) % perms; hops += 1 }
        sig(p) = if (sig(j) == Long.MaxValue) 0L else sig(j) + hops
      }
      p += 1
    }
    new GenericArrayData(sig)
  }
}
