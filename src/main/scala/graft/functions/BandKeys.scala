package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** LSH band keys of a MinHash signature (`array<long>`, length `perms`):
  * each of the `bands` keys mixes its `perms / bands` signature rows into
  * one 64-bit value (seeded per band so identical row values in different
  * bands cannot collide into one bucket).
  *
  * Completes the native dedup chain: [[HashedShingles]] →
  * [[MinhashOph]] → BandKeys → `explode` now plan as one codegen'd
  * projection with no ScalaUDF conversion anywhere before the band-key
  * shuffle — the only data that leaves the stage is (id, 8-byte key).
  * Bit-identical to the retained UDF twin (`Dedup.bandKeysUdf`).
  */
case class BandKeys(child: Expression, perms: Int, bands: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_keys requires array<long> input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    BandKeys.compute(a.asInstanceOf[ArrayData], perms, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BandKeys.compute($a, $perms, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandKeys {

  /** Column wrapper: native codegen'd LSH band keys. */
  def band_keys(sig: Column, perms: Int, bands: Int): Column =
    ColumnBridge.column(BandKeys(ColumnBridge.expression(sig), perms, bands))

  /** Shared kernel for interpreted eval and generated code. */
  def compute(sig: ArrayData, perms: Int, bands: Int): ArrayData = {
    val rows = perms / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L ^ (b.toLong * 0x9e3779b97f4a7c15L)
      var r = 0
      while (r < rows) {
        h = java.lang.Long.rotateLeft(h * 0x87c37b91114253d5L, 31) ^ sig.getLong(b * rows + r)
        r += 1
      }
      out(b) = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
      b += 1
    }
    new GenericArrayData(out)
  }
}
