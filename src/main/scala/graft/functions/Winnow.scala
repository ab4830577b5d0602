package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (k=8 char shingles, window w=4) as ONE
  * native expression: per row, hash every k-substring, take each
  * w-window's minimum, and return (distinct-minima count, global min).
  *
  * The composed formulation (sequence → explode → xxhash64 → min over a
  * doc-partitioned sliding window → groupBy) is semantically identical
  * but shuffles one row PER CHARACTER POSITION — ~10M rows at sf0.1 —
  * only to bring each document's positions back together, even though
  * the generator emitted them co-located. Winnowing is per-document
  * work; this expression does the whole pass in-task with zero shuffle.
  * Hashes reproduce `xxhash64(substring(text, i, 8))` (seed 42) exactly,
  * so the output is bit-identical to the composed pipeline (asserted in
  * LlmSpec).
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string column, got $dt")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_fingerprints", LongType, nullable = false),
    StructField("min_fp", LongType, nullable = false)))

  // null for strings too short to hold one full window
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Winnow.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Winnow.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  val K = 8
  val W = 4
  private val Seed = 42L // Spark's xxhash64 function seed

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column wrapper: `winnow_fingerprints(text)`. */
  def winnow_fingerprints(text: Column): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text)))

  /** One-pass winnowing over a document; null if no full window fits.
    * Static so generated code can call it directly. */
  def compute(t: UTF8String): InternalRow = {
    val nChars = t.numChars()
    val n = nChars - (K - 1) // k-shingle starting positions
    val m = n - (W - 1) // full windows
    if (m <= 0) return null
    val hs = new Array[Long](n)
    if (t.numBytes() == nChars) {
      // ASCII fast path: char windows are byte windows
      val base = t.getBaseObject
      val off = t.getBaseOffset
      var i = 0
      while (i < n) {
        hs(i) = XXH64.hashUnsafeBytes(base, off + i, K, Seed)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val sub = t.substringSQL(i + 1, K)
        hs(i) = XXH64.hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset,
          sub.numBytes(), Seed)
        i += 1
      }
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    var minFp = Long.MaxValue
    var j = 0
    while (j < m) {
      var mn = hs(j)
      var q = 1
      while (q < W) { if (hs(j + q) < mn) mn = hs(j + q); q += 1 }
      seen.add(mn)
      if (mn < minFp) minFp = mn
      j += 1
    }
    new GenericInternalRow(Array[Any](seen.size.toLong, minFp))
  }
}
