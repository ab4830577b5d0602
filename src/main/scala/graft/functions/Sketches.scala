package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Document sketches (MinHash signature, SimHash fingerprint) as native
  * one-pass expressions.
  *
  * A sketch is row-local work, but the explode → hash → groupBy
  * formulation shuffles one (doc_id, hash) row PER TOKEN of the corpus —
  * at 100 TB that exchange is the single largest shuffle in the whole
  * dedup pipeline, moved only to bring each document's tokens back to a
  * reducer that could have been the mapper. These expressions fold the
  * token stream inside the row scan instead: zero shuffle, and the
  * band/bucket join that follows still operates on compact 64-bit keys.
  * Token/shingle semantics and every hash reproduce the composed
  * pipeline bit-for-bit (asserted in LlmSpec): lower-case, Java-regex
  * `\s+` split keeping empty tokens, distinct 3-word shingles with the
  * whole-text fallback. MinHash hashes with xxhash64 seed 42 using
  * Spark's multi-argument fold order; SimHash hashes with the
  * cross-engine [[Sketches.tokenHash]] (poly31 over code points +
  * splitmix64), which is what lets the DuckDB oracle recompute the
  * fingerprints from raw text.
  */
object Sketches {

  /** Tokens exactly as `split(lower(text), "\\s+")`: Spark's split keeps
    * empty tokens (leading separator or empty input). */
  private[functions] def tokens(t: UTF8String): Array[String] =
    t.toLowerCase.toString.split("\\s+", -1)

  /** splitmix64 finalizer (Steele/Lea/Flood, the SplittableRandom mix —
    * public-domain constants). Wrapping Long arithmetic ≡ mod 2^64. */
  def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Cross-engine token hash: 31-ary polynomial over Unicode CODE POINTS
    * (wrapping 64-bit) finalized by [[splitmix64]]. The SimHash
    * fingerprint uses this instead of xxhash64 so the ENTIRE signature
    * arithmetic is restatable in any engine with 64-bit integers — the
    * DuckDB oracle recomputes fingerprints from the raw parquet text
    * (xxhash64's byte-stripe state machine is not reasonably
    * SQL-expressible), which is also the property a production corpus
    * wants: signatures recomputed by a different engine must agree
    * bit-for-bit or incremental dedup silently degrades. Code points
    * (not UTF-16 units or UTF-8 bytes) keep the definition
    * encoding-neutral. The polynomial accumulates order-sensitive
    * structure; the finalizer supplies the per-bit avalanche SimHash's
    * bit votes rely on. */
  def tokenHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = h * 31L + cp
      i += Character.charCount(cp)
    }
    splitmix64(h)
  }

  /** 64-bit SimHash over the token stream (duplicates included, like the
    * exploded formulation), per-token [[tokenHash]]. */
  def simhash(t: UTF8String): Long = {
    val toks = tokens(t)
    val sums = new Array[Long](64)
    var i = 0
    while (i < toks.length) {
      val h = tokenHash(toks(i))
      var k = 0
      while (k < 64) {
        sums(k) += (if (((h >>> k) & 1L) == 1L) 1L else -1L)
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (sums(k) >= 0) fp |= (1L << k); k += 1 }
    fp
  }

  /** The splitmix64 stream increment (golden-ratio constant) — the
    * per-index salt for the MinHash hash family and band folds. */
  val Golden = 0x9E3779B97F4A7C15L

  /** MinHash signature row: (n_shingles, sig[nHashes], bands[nBands]).
    *
    * All three hash stages run on the cross-engine splitmix64
    * arithmetic ([[tokenHash]] for shingles; `splitmix64(h + i·Golden)`
    * as the i-th hash-family member; a position-salted splitmix fold
    * for the band keys) so the WHOLE signature — not just the
    * fingerprint — is restatable in DuckDB SQL: the dedup_minhash
    * oracle recomputes sig and bands from the raw parquet text and the
    * candidate/estimate arithmetic downstream of them. Signed-Long
    * `min` on both engines keeps the signature comparison exact. */
  def minhash(t: UTF8String, nHashes: Int, nBands: Int): InternalRow = {
    val toks = tokens(t)
    val shingles = new java.util.HashSet[String]()
    if (toks.length >= 3) {
      var i = 0
      while (i <= toks.length - 3) {
        shingles.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
    } else {
      shingles.add(toks.mkString(" ")) // whole-text fallback for short docs
    }
    val sig = Array.fill(nHashes)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val h = tokenHash(it.next())
      var i = 0
      while (i < nHashes) {
        val v = splitmix64(h + i * Golden)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    val rows = nHashes / nBands
    val bands = new Array[Long](nBands)
    var j = 0
    while (j < nBands) {
      // order-sensitive via the position salt, wrap-commutative sum —
      // flat enough to restate as a grouped SQL aggregate
      var acc = j * Golden
      var q = 0
      while (q < rows) {
        acc += splitmix64(sig(j * rows + q) + (q + 1) * Golden)
        q += 1
      }
      bands(j) = splitmix64(acc)
      j += 1
    }
    new GenericInternalRow(Array[Any](shingles.size.toLong,
      new GenericArrayData(sig), new GenericArrayData(bands)))
  }

  /** [[tokenHash]] over a UTF8String (the codegen entry point). */
  def tokenHashU(s: UTF8String): Long = tokenHash(s.toString)

  import org.apache.spark.sql.graftbridge.Bridge
  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))
  def token_hash64(s: Column): Column =
    Bridge.column(TokenHash64(Bridge.expression(s)))
  def minhash_signature(text: Column, nHashes: Int = 16, nBands: Int = 4): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), nHashes, nBands))
}

/** Scalar [[Sketches.tokenHash]] as a codegen'd expression — the
  * cross-engine 64-bit string hash (poly31 over code points +
  * splitmix64) for paths whose hash values must be re-derivable by a
  * different engine: the decontamination family keys its bench/corpus
  * shingle match on it so the DuckDB oracle can recompute the hashes
  * (and the bloom tier's bit positions) from the raw parquet text,
  * which xxhash64's byte-stripe state machine would not allow. */
case class TokenHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"token_hash64 expects a string, got $dt")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Sketches.tokenHashU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.tokenHashU($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash64 expects a string, got $dt")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Sketches.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSignature(child: Expression, nHashes: Int, nBands: Int)
    extends UnaryExpression {
  require(nHashes % nBands == 0, "nHashes must divide into nBands bands")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects a string, got $dt")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any =
    Sketches.minhash(v.asInstanceOf[UTF8String], nHashes, nBands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.minhash($c, $nHashes, $nBands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
