package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-ranking operators over the `documents` table: TF-IDF term
  * extraction and BM25 retrieval. The reference stops at raw token
  * counts (its text path is dedup-oriented); these are the two classic
  * relevance primitives a training-data pipeline layers on top — TF-IDF
  * for keyword/topic extraction per document, BM25 for corpus search —
  * and both reduce to the same scale shape as [[Llm.vocabTop]]: one
  * explode → token-keyed aggregation pass, everything after it grain-
  * bounded by (doc, matched term), never by corpus size.
  *
  * Tokenization is the suite-wide convention (lowercase, split on runs
  * of whitespace, drop empties) so the DuckDB oracles share one
  * `string_split_regex` shape with vocab_top.
  *
  * Determinism: scores are transcendental (ln), so both engines round
  * to 9dp and rank on the ROUNDED value with a lexical tie-break —
  * the same convention product_rank uses for its double ranks.
  */
object Search {

  private def tokens(documents: DataFrame): DataFrame =
    Llm.spread(documents)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")

  /** The (doc_id, word, tf) term-frequency frame — the one corpus-sized
    * pass every text-ranking operator starts from ([[tfidfTopTerms]],
    * [[bm25]]'s exact shape, [[Llm.unigramLogProbFrom]]); SparkEntry
    * memoizes it so the explode + aggregate runs once per session. */
  def docTermFreq(documents: DataFrame): DataFrame =
    tokens(documents).groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document. idf = ln(N / df) over raw df
    * (every word occurs somewhere, so df ≥ 1 and the ratio is finite).
    *
    * Scale shape: the only corpus-sized shuffle is the (doc_id, word)
    * term-frequency aggregation (map-side partial combine applies — the
    * explode never crosses the wire raw). df re-aggregates THAT frame by
    * word (vocab-sized), and the per-document top-k window partitions on
    * doc_id, so no stage concentrates more than one document's vocabulary
    * in a task. The df join is vocab-grain; left to AQE rather than a
    * broadcast hint because a 100 TB corpus's vocabulary is itself large
    * while the Zipf head that actually matters still fits a shuffle.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame =
    tfidfTopTermsFrom(docTermFreq(documents), documents.count(), k)

  /** [[tfidfTopTerms]] over a prebuilt [[docTermFreq]] frame. */
  def tfidfTopTermsFrom(tf: DataFrame, n: Long, k: Int = 3): DataFrame = {
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id").orderBy(desc("score"), col("word"))
    tf.join(df, "word")
      .withColumn("score", round(col("tf") * log(lit(n.toDouble) / col("df")), 9))
      .withColumn("rk", row_number().over(byDoc).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("word"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rk")
  }

  /** BM25 top-k retrieval for a fixed bag of query terms (Robertson/
    * Sparck Jones idf with the standard +1 floor; k1 = 1.2, b = 0.75).
    *
    * Scale shape: the term filter lands BEFORE the tf aggregation, so
    * every shuffle after the doc-length pass is proportional to the
    * POSTINGS of the query terms, not the corpus — the DataFrame
    * equivalent of walking an inverted index. Doc lengths are a separate
    * corpus-grain aggregate (unavoidable: BM25 normalizes by |d|); at
    * production scale that frame is precomputed once per corpus snapshot
    * (it is [[Llm.textStats]]' n_words column), not per query. The df
    * frame has ≤ |query| rows and is broadcast explicitly.
    */
  def bm25(documents: DataFrame,
      query: Seq[String] = Seq("spark", "shuffle", "join"),
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(documents)
    val docLen = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = docLen.agg(count(lit(1)).as("n"), avg("len").as("avglen")).head()
    val n = stats.getLong(0)
    val avglen = stats.getDouble(1)
    val tf = toks.filter(col("word").isin(query: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "word")
      .join(docLen, "doc_id")
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avglen)))
      .groupBy("doc_id").agg(round(sum("contrib"), 9).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }
}
