package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables (SURVEY §2.10): deduplication (exact, MinHash+LSH,
  * SimHash, exact n-gram Jaccard), similarity search (brute-force cosine
  * top-k + random-hyperplane LSH), and text analysis (stats, quality,
  * language-ID, winnowing fingerprints).
  *
  * Everything is built from codegen'd Spark SQL primitives (higher-order
  * array functions + xxhash64) — no Scala UDFs, no driver-side loops, so
  * every operator distributes: per-document work is embarrassingly
  * parallel, near-dup candidate generation shuffles on compact 64-bit
  * band keys (never raw text), and verification joins touch only
  * hash-bucketed candidates.
  */
object Llm {

  // --------------------------------------------------------------- helpers

  /** Lower-cased whitespace words. */
  private def words(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct 3-word shingles; docs shorter than 3 words yield none. */
  private def shingles(ws: Column): Column =
    when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", slice(ws, i + 1, lit(3))))))
      .otherwise(array().cast("array<string>"))

  // ---------------------------------------------------------- exact dedup

  /** Exact dedup: group on sha2(text) (shuffles a 32-byte key, not the
    * document body), keep the smallest doc_id per group. */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")
      .orderBy("doc_id")

  // --------------------------------------------------------- MinHash + LSH

  val MinhashHashes = 16
  val MinhashBands = 4 // 4 bands x 4 rows

  /** doc_id + minhash signature (array of 16 longs) + LSH band keys.
    * Seeded hashes come from xxhash64(shingle, i) — the extra int column
    * acts as the per-function seed. */
  def minhashSignatures(documents: DataFrame): DataFrame =
    documents
      .withColumn("ws", words(col("text")))
      .withColumn("sh", shingles(col("ws")))
      .withColumn("sh", when(size(col("sh")) > 0, col("sh"))
        .otherwise(array(concat_ws(" ", col("ws"))))) // short docs: whole text
      .withColumn("sig", transform(sequence(lit(0), lit(MinhashHashes - 1)),
        i => array_min(transform(col("sh"), s => xxhash64(s, i)))))
      .withColumn("bands", transform(sequence(lit(0), lit(MinhashBands - 1)),
        j => xxhash64(
          element_at(col("sig"), j * 4 + 1), element_at(col("sig"), j * 4 + 2),
          element_at(col("sig"), j * 4 + 3), element_at(col("sig"), j * 4 + 4), j)))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"), col("sig"), col("bands"))

  /** Candidate near-dup pairs: docs sharing ≥1 LSH band bucket, with the
    * signature-estimated Jaccard. The self-join shuffles on the 64-bit
    * band key only. */
  def minhashCandidates(documents: DataFrame): DataFrame = {
    val sigs = minhashSignatures(documents)
    val ex = sigs.select(col("doc_id"), col("sig"), explode(col("bands")).as("band"))
    val a = ex.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("band"))
    val b = ex.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("band"))
    a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v) / lit(MinhashHashes.toDouble))
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** Per-document near-dup summary (total rows == #documents, so the
    * result is non-degenerate even with zero near-dups). */
  def dedupMinhash(documents: DataFrame): DataFrame = {
    val cand = minhashCandidates(documents)
    val perDoc = cand.select(col("doc_a").as("doc_id"), col("est_jaccard"))
      .union(cand.select(col("doc_b").as("doc_id"), col("est_jaccard")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_candidates"),
        round(max("est_jaccard"), 4).as("max_est_jaccard"))
    minhashSignatures(documents).select("doc_id", "n_shingles")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_candidates"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document + near-dup count via 16-bit band
    * blocking and hamming-distance verification (bit_count(xor)). */
  def simhashDocs(documents: DataFrame): DataFrame =
    documents
      .withColumn("thashes", expr("transform(split(lower(text), '\\\\s+'), w -> xxhash64(w))"))
      .withColumn("bits", expr(
        """transform(sequence(0, 63), k ->
          |  CASE WHEN aggregate(thashes, 0L, (a, h) ->
          |    a + CASE WHEN (shiftright(h, k) & 1) = 1 THEN 1 ELSE -1 END) >= 0
          |  THEN 1L ELSE 0L END)""".stripMargin))
      .withColumn("simhash", expr(
        "aggregate(sequence(0, 63), 0L, (acc, k) -> acc + shiftleft(element_at(bits, k + 1), k))"))
      .select("doc_id", "simhash")

  def dedupSimhash(documents: DataFrame, maxHamming: Int = 12): DataFrame = {
    val sh = simhashDocs(documents)
    // block on 4 x 16-bit bands: any pair within hamming<=12 of 64 bits
    // shares at least one exact band far more often than random pairs
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), j -> " +
        "concat(CAST(j AS STRING), ':', CAST(shiftright(simhash, j * 16) & 65535 AS STRING)))")).as("band"))
    val a = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"), col("band"))
    val b = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"), col("band"))
    val pairs = a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
    val perDoc = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
    sh.join(perDoc, Seq("doc_id"), "left").na.fill(0L, Seq("n_near"))
      .select("doc_id", "simhash", "n_near")
      .orderBy("doc_id")
  }

  // ------------------------------------------------- exact n-gram Jaccard

  /** Exact 3-gram Jaccard best-match per document: explode distinct
    * shingles, self-join, intersection/union arithmetic. The DuckDB twin
    * reproduces this exactly (string shingle join). At scale the join key
    * would be xxhash64(shingle) — kept as the raw string here so the
    * oracle can reproduce it byte-for-byte. */
  def dedupNgram(documents: DataFrame): DataFrame = {
    val sh = documents
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(shingles(col("ws"))).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val jac = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 6))
    jac.withColumn("rn", row_number().over(
        Window.partitionBy("doc_a").orderBy(desc("jaccard"), col("doc_b"))))
      .filter(col("rn") === 1)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("best_match"), col("jaccard"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ text stats

  /** Per-document stats: counts via regexp_count (identical regexes run in
    * the DuckDB oracle), ratios, and a deterministic quality score. */
  def textStats(documents: DataFrame): DataFrame = {
    val t = col("text")
    documents.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      regexp_count(t, lit("\\S+")).cast("long").as("n_words"),
      regexp_count(t, lit("[A-Za-z]")).cast("long").as("n_letters"),
      regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast("long").as("n_punct"),
      regexp_count(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long").as("n_tokens"),
      regexp_count(lower(t), lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"))
        .cast("long").as("n_stopwords"))
      .withColumn("punct_ratio",
        round(col("n_punct") * 1.0 / greatest(col("n_chars"), lit(1L)), 6))
      .withColumn("stopword_ratio",
        round(col("n_stopwords") * 1.0 / greatest(col("n_words"), lit(1L)), 6))
      .withColumn("avg_word_len",
        round(col("n_letters") * 1.0 / greatest(col("n_words"), lit(1L)), 6))
      // quality in exact integer micro-units (pure long arithmetic with
      // truncating `div`) — a float formula of weighted ratios lands on
      // .0000005 rounding boundaries that flip between engines
      .withColumn("quality_score", expr(
        """(4000 * least(n_words, 100)
          | + least((1500000 * n_stopwords) div greatest(n_words, 1), 300000)
          | + (300000 - least((3000000 * n_punct) div greatest(n_chars, 1), 300000))
          |) / CAST(1000000 AS DOUBLE)""".stripMargin))
      .orderBy("doc_id")
  }

  /** Heuristic language ID from per-language stopword regex hits + a CJK
    * class check; deterministic tie-break order. */
  def langId(documents: DataFrame): DataFrame = {
    val lt = lower(col("text"))
    documents.select(
      col("doc_id"), col("lang"),
      regexp_count(lt, lit("\\b(the|and|of|is|in|to)\\b")).cast("long").as("en_hits"),
      regexp_count(lt, lit("\\b(le|la|les|et|des|une)\\b")).cast("long").as("fr_hits"),
      regexp_count(lt, lit("\\b(der|die|und|das|ist|ein)\\b")).cast("long").as("de_hits"),
      regexp_count(lt, lit("\\b(el|los|que|una|es)\\b")).cast("long").as("es_hits"),
      regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")).cast("long").as("zh_hits"))
      .withColumn("lang_pred",
        when(col("zh_hits") > 0, "zh")
          .when(col("fr_hits") > col("en_hits") && col("fr_hits") >= col("de_hits")
            && col("fr_hits") >= col("es_hits"), "fr")
          .when(col("de_hits") > col("en_hits") && col("de_hits") >= col("es_hits"), "de")
          .when(col("es_hits") > col("en_hits"), "es")
          .otherwise("en"))
      .withColumn("is_correct", (col("lang_pred") === col("lang")).cast("boolean"))
      .orderBy("doc_id")
  }

  /** Winnowing document fingerprints: 8-char shingle rolling hashes,
    * window-4 minima, distinct. */
  def docFingerprint(documents: DataFrame): DataFrame =
    documents
      .filter(length(col("text")) >= 11) // k=8 + w=4 - 1
      .withColumn("hs", expr(
        "transform(sequence(1, length(text) - 7), i -> xxhash64(substring(text, i, 8)))"))
      .withColumn("fps", expr(
        "array_distinct(transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4))))"))
      .select(col("doc_id"), size(col("fps")).as("n_fingerprints"),
        array_min(col("fps")).as("min_fp"))
      .orderBy("doc_id")

  // ----------------------------------------------------- similarity search

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k: every probe scored against every vector.
    * Correctness baseline — O(P·N); the scale path is [[knnLsh]].
    * Ranking uses the 6dp-rounded similarity (bit-stable across engines)
    * with vec_id tie-break. */
  def knnBruteforce(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"))
    probes.crossJoin(e).filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", round(cosine(col("pemb"), col("emb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(desc("sim"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"), col("sim"))
      .orderBy("probe_id", "rank")
  }

  /** Random-hyperplane LSH bucketed ANN (the 100 TB path): 8 deterministic
    * ±1 hyperplanes (xxhash64-seeded), vectors bucketed by their 8-bit
    * sign pattern, probes scored only within their bucket. */
  def knnLsh(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5): DataFrame = {
    val bucketExpr = expr(
      """aggregate(sequence(0, 7), 0, (acc, j) ->
        |  acc + CASE WHEN aggregate(sequence(0, size(emb) - 1), CAST(0.0 AS DOUBLE),
        |      (s, kk) -> s + element_at(emb, kk + 1) *
        |        (CASE WHEN (xxhash64(j, kk) & 1) = 1 THEN 1.0 ELSE -1.0 END)) >= 0
        |    THEN CAST(shiftleft(1, j) AS INT) ELSE 0 END)""".stripMargin)
    val e = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket", bucketExpr)
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"), col("bucket"))
    probes.join(e, Seq("bucket")).filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", round(cosine(col("pemb"), col("emb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(desc("sim"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"), col("sim"))
      .orderBy("probe_id", "rank")
  }
}
