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
