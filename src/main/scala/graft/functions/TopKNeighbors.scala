package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scored candidate for top-k selection. */
case class Scored(id: Long, sim: Double)

/** Typed top-k Aggregator over a bounded worst-first priority queue.
  *
  * The window formulation (`row_number` over sim desc → filter ≤ k)
  * sorts EVERY candidate per group; this keeps only k entries per
  * partial-aggregation buffer, merging map-side — O(n log k) and no
  * per-group full sort, the shape that survives a billion-candidate
  * group. Order contract matches the window version exactly:
  * better = higher sim, ties broken by lower id. */
class TopKNeighbors(k: Int)
    extends Aggregator[Scored, mutable.ArrayBuffer[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  override def zero: mutable.ArrayBuffer[Scored] = mutable.ArrayBuffer.empty

  override def reduce(buf: mutable.ArrayBuffer[Scored], e: Scored): mutable.ArrayBuffer[Scored] = {
    buf += e
    if (buf.length > 4 * k) trim(buf) else buf
  }

  override def merge(a: mutable.ArrayBuffer[Scored], b: mutable.ArrayBuffer[Scored]): mutable.ArrayBuffer[Scored] =
    trim(a ++= b)

  private def trim(buf: mutable.ArrayBuffer[Scored]): mutable.ArrayBuffer[Scored] = {
    val kept = buf.sortWith(better).take(k)
    buf.clear()
    buf ++= kept
  }

  override def finish(buf: mutable.ArrayBuffer[Scored]): Seq[Scored] =
    buf.sortWith(better).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Scored]] =
    Encoders.kryo[mutable.ArrayBuffer[Scored]]

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
