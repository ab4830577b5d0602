package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** spark.ml port of the reference's sklearn advisor pipeline
  * (reference scripts/train_advisor.py:106-126): standard-scale the RFM
  * features, KMeans k=5, fixed seed. The reference also imputes medians —
  * our features are already null-free (coalesced in Gold.clientFeatures),
  * so the imputer stage is unnecessary.
  *
  * Clustering is inherently partition-sensitive in its initialization, so
  * this is gated rows-only + by ScalaTest determinism checks (same
  * session ⇒ same assignment), not by the DuckDB oracle. */
object Ml {
  import org.apache.spark.sql.expressions.Window

  /** IVF-style approximate nearest neighbor (the third ANN tier next to
    * Llm.knnBruteforce / Llm.knnLsh): KMeans coarse quantizer → vectors
    * bucketed by nearest centroid → probes scored only inside their
    * `nprobe` nearest cells. The centroid list is a driver-folded literal
    * (same two-phase shape as the scoring thresholds); cell assignment
    * and probing are fully distributed.
    *
    * Default nprobe=8 of nlist=16 cells clears the 0.8 recall@5 floor on
    * the synthetic near-uniform test vectors (neighbors at cos≈0.3, the
    * adversarial case for a coarse quantizer); a real corpus with
    * clustered neighbors runs nprobe≪nlist (e.g. 8 of 1024) for the
    * same recall. */
  def knnIvf(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 8, seed: Long = 42): DataFrame = {
    import org.apache.spark.ml.clustering.{KMeans => MlKMeans}
    import org.apache.spark.ml.functions.array_to_vector
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
      .withColumn("fv", array_to_vector(col("emb")))
    val model = new MlKMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(e)
    val assigned = model.transform(e).select(col("vec_id"), col("emb"), col("cell"))

    val centroids = typedlit(model.clusterCenters.toSeq.map(_.toArray.toSeq))
    // nprobe nearest cells per probe: squared-L2 to each centroid, sort
    val cellDists = transform(sequence(lit(0), lit(nlist - 1)), ci =>
      struct(
        aggregate(zip_with(col("emb"), element_at(centroids, ci + 1),
          (x, c) => (x - c) * (x - c)), lit(0.0), (a, v) => a + v).as("d"),
        ci.as("idx")))
    val probeCells = transform(slice(array_sort(cellDists), 1, nprobe), s => s("idx"))
    val probes = assigned.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"),
        explode(probeCells).as("cell"))

    probes.join(assigned, Seq("cell")).filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", round(
        graft.functions.CosineSimilarity.cosine_sim(col("pemb"), col("emb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(desc("sim"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"), col("sim"))
      .orderBy("probe_id", "rank")
  }

  /** Supervised twin of the reference's heuristic repurchase score
    * (reference scripts/train_predictor.py:133-146 hard-codes the blend
    * 0.45·freq + 0.30·recency + 0.15·monetary + 0.10·diversity): learn
    * the weights instead with spark.ml LogisticRegression on a temporally
    * honest label. Features are the existing Gold.clientFeatures computed
    * AS OF a cutoff (reference date minus the horizon, so the feature
    * window never sees the label period); label = the customer placed at
    * least one valid order after the cutoff. This is the backtest the
    * reference never runs — same feature surface, measurable AUC.
    *
    * Scale shape: the feature build is the audited one-pass conditional
    * agg; LR training is d=9 — each LBFGS iteration is one treeAggregate
    * of 9-element gradients, the model is a 10-double broadcast, scoring
    * is map-side. Nothing here is quadratic in customers.
    *
    * Like kmeans_segments this is gated rows-only + ScalaTest
    * (same-session determinism, AUC floor) — training is iterative
    * float math, not SQL-expressible. */
  def propensityModel(orders: DataFrame, lineitem: DataFrame,
      horizonDays: Int = Gold.HorizonDays, regParam: Double = 0.01,
      maxIter: Int = 64): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.vector_to_array
    val valid = Gold.validOrders(orders)
    // driver scalar, same idiom as Gold.referenceDate — typed Any for the
    // same TIMESTAMP/TIMESTAMP_NTZ reason
    val cutoff = valid
      .agg(max(col("o_orderdate")) - expr(s"INTERVAL $horizonDays DAYS"))
      .first().get(0)
    val feats = Gold.clientFeatures(
      orders.filter(col("o_orderdate") <= lit(cutoff)), lineitem, cutoff)
    val repurchased = valid.filter(col("o_orderdate") > lit(cutoff))
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("label", lit(1.0))
    val data = feats.join(repurchased, Seq("c_custkey"), "left")
      .na.fill(0.0, Seq("label"))

    val assembler = new VectorAssembler()
      .setInputCols(Array("freq_12m", "monetary_12m", "monetary_avg_12m",
        "product_diversity_12m", "recency_days", "tenure_days",
        "total_orders_all", "total_spend_all", "avg_order_value_all"))
      .setOutputCol("raw_features")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("label").setFeaturesCol("features")
      .setProbabilityCol("prob")
    val model = new Pipeline().setStages(Array(assembler, scaler, lr)).fit(data)
    model.transform(data)
      .select(col("c_custkey"), col("label").cast("long").as("label"),
        round(element_at(vector_to_array(col("prob")), 2), 6).as("propensity"),
        col("prediction").cast("long").as("prediction"))
      .orderBy("c_custkey")
  }

  def kmeansSegments(features: DataFrame, k: Int = 5, seed: Long = 42): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("freq_12m", "monetary_12m", "recency_days"))
      .setOutputCol("raw_features")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val km = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cluster")
    val model = new Pipeline().setStages(Array(assembler, scaler, km))
      .fit(features)
    model.transform(features)
      .select(col("c_custkey"), col("freq_12m"), col("monetary_12m"),
        col("recency_days"), col("cluster").cast("long").as("cluster"))
      .orderBy("c_custkey")
  }
}
