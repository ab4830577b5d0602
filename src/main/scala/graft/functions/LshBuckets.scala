package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Multi-table sign-LSH bucket assignment as ONE native expression: all
  * nPlanes·nTables hyperplane dot products and the per-table sign
  * patterns in a single pass over the vector.
  *
  * Bucket assignment is row-local, but the posexplode → groupBy
  * formulation this replaces shuffled one row per embedding DIMENSION —
  * for billion-vector corpora another per-element exchange moved only to
  * reassemble values the scan already held together. Hyperplane weights
  * reproduce `Llm.hyperplanes` (splitmix64 of j·4096+k) exactly, so the
  * buckets are bit-identical to the composed pipeline (asserted in
  * LlmSpec).
  */
case class LshBuckets(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<double>, got $dt")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    LshSign.buckets(v.asInstanceOf[ArrayData], nPlanes, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshSign.buckets($c, $nPlanes, $nTables)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSign {
  import org.apache.spark.sql.graftbridge.Bridge

  def lsh_buckets(emb: Column, nPlanes: Int, nTables: Int): Column =
    Bridge.column(LshBuckets(Bridge.expression(emb), nPlanes, nTables))

  private def splitmix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** ±1 weight of hyperplane j at dimension k — same derivation as the
    * driver-folded literal planes. */
  private def weight(j: Int, k: Int): Double =
    if ((splitmix(j.toLong * 4096 + k) & 1L) == 1L) 1.0 else -1.0

  /** One bucket per table from the vector's sign pattern; null elements
    * are skipped like the composed pipeline's not-null filter. */
  def buckets(emb: ArrayData, nPlanes: Int, nTables: Int): ArrayData = {
    val nBits = nPlanes * nTables
    val dots = new Array[Double](nBits)
    val d = emb.numElements()
    var k = 0
    while (k < d) {
      if (!emb.isNullAt(k)) {
        val x = emb.getDouble(k)
        var j = 0
        while (j < nBits) { dots(j) += x * weight(j, k); j += 1 }
      }
      k += 1
    }
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0
      var i = 0
      while (i < nPlanes) {
        if (dots(t * nPlanes + i) >= 0) b |= (1 << i)
        i += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}
