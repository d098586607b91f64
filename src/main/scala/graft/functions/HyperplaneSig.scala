package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature of an `array<float>` vector as a
  * 64-bit bitfield: bit p = sign(v · h_p), planes drawn deterministically
  * from a mix of (plane, dim) — reproducible with no stored model, and
  * scale-invariant.
  *
  * This was the project's last hot-path Scala UDF: signatures are
  * (re)computed over the whole corpus when building a stored signature
  * table, and the UDF form pays per-row Seq boxing plus the
  * serialization wall around whole-stage codegen — the same measured
  * ≥5 µs/row cost that justified [[CosineSimilarity]] and
  * [[SigAgreement]]. This expression runs the nBits × dim fused
  * multiply-add loop over the unsafe float buffer inside codegen.
  * Arithmetic is bit-identical to the UDF form it replaces
  * (left-to-right double accumulation, same (plane, dim) mix).
  */
case class HyperplaneSig(child: Expression, nBits: Int = 16) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig requires array<float> input, got $other")
    }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    var sig = 0L
    var p = 0
    while (p < nBits) {
      var acc = 0.0
      var j = 0
      while (j < xs.length) {
        var h = (p.toLong * 0x9E3779B97F4A7C15L) ^ (j.toLong * 0xC2B2AE3D27D4EB4FL)
        h = (h ^ (h >>> 31)) * 0x7FB5D329728EA185L
        h ^= h >>> 27
        acc += xs(j) * ((java.lang.Math.floorMod(h, 1000000L).toDouble / 500000.0) - 1.0)
        j += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs"); val sig = ctx.freshName("sig")
      val p = ctx.freshName("p"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val h = ctx.freshName("h")
      s"""
         |float[] $xs = $a.toFloatArray();
         |long $sig = 0L;
         |for (int $p = 0; $p < $nBits; $p++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $xs.length; $j++) {
         |    long $h = (((long) $p) * 0x9E3779B97F4A7C15L) ^ (((long) $j) * 0xC2B2AE3D27D4EB4FL);
         |    $h = ($h ^ ($h >>> 31)) * 0x7FB5D329728EA185L;
         |    $h ^= $h >>> 27;
         |    $acc += $xs[$j] * ((((double) java.lang.Math.floorMod($h, 1000000L)) / 500000.0) - 1.0);
         |  }
         |  if ($acc >= 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Column wrapper: native codegen'd hyperplane LSH signature. */
  def hyperplane_sig(vec: Column, nBits: Int = 16): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(vec.cast("array<float>")), nBits))
}
