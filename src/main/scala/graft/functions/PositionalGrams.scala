package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional k-gram fingerprints of a text column in ONE pass — the
  * positional sibling of [[HashedShingles]] (same tokenizer, same mixing
  * constants): emits `(pos, hash)` per gram start, 1-based token
  * positions, no token or gram strings materialized. This is the
  * substring-dedup gram pass (`Dedup.substringSpans`), which scans every
  * corpus byte — the same ScalaUDF conversion-wall argument that moved
  * [[HashedShingles]] into codegen applies verbatim, with the struct
  * array output (`array<struct<_1, _2>>`, the tuple encoding the UDF twin
  * produced) built directly as InternalRows.
  */
case class PositionalGrams(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = PositionalGrams.outType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"positional_grams requires string input, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    PositionalGrams.compute(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PositionalGrams.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PositionalGrams {

  private[functions] val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("_1", LongType, nullable = false),
      StructField("_2", LongType, nullable = false))),
    containsNull = false)

  /** Column wrapper: native codegen'd positional k-grams. */
  def positional_grams(text: Column, k: Int): Column =
    ColumnBridge.column(PositionalGrams(ColumnBridge.expression(text), k))

  /** Shared kernel for interpreted eval and generated code (static call,
    * same rationale as [[HashedShingles.compute]]). */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val t = text.toString
    var tokens = new Array[Long](16)
    var m = 0
    var h = 0L; var inTok = false
    var i = 0; val n = t.length
    while (i <= n) {
      val c = if (i < n) Character.toLowerCase(t.charAt(i)) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { h = h * 31 + c; inTok = true }
      else if (inTok) {
        if (m == tokens.length) tokens = java.util.Arrays.copyOf(tokens, m * 2)
        tokens(m) = (h ^ (h >>> 17)) * 0x9e3779b97f4a7c15L
        m += 1
        h = 0L; inTok = false
      }
      i += 1
    }
    if (m < k) new GenericArrayData(new Array[Any](0))
    else {
      val out = new Array[Any](m - k + 1)
      var j = 0
      while (j + k <= m) {
        var s = tokens(j)
        var x = 1
        while (x < k) { s = s * 0xc2b2ae3d27d4eb4fL + tokens(j + x); x += 1 }
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        row.setLong(0, (j + 1).toLong)
        row.setLong(1, (s ^ (s >>> 29)) * 0xff51afd7ed558ccdL)
        out(j) = (row: InternalRow)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
