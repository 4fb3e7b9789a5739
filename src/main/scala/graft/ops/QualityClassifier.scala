package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the trained-classifier gate of the
  * classic LLM data pipeline (GPT-3 / LLaMA style: fit a linear
  * classifier that separates a trusted corpus from raw crawl, keep raw
  * docs the model scores target-like). The heuristic gates
  * ([[LineFilter]], quality_gate) are rule-based; this is the learned
  * complement: fastText-shaped logistic regression over hashed
  * bag-of-words features, trained INSIDE the engine by full-batch
  * gradient descent.
  *
  * Scale shape (the reason this trains at 100 TB):
  *  - features are [[FeatureHash.hashedTf]] buckets collected to ONE
  *    array row per doc and persisted once — epochs re-scan a compact
  *    columnar cache, never the raw text;
  *  - the per-doc margin is an in-plan `aggregate()` over the feature
  *    array against a dense weight-ARRAY literal (O(1) bucket index per
  *    feature) — no shuffle at all;
  *  - the gradient is one explode + partial-agg groupBy(bucket): the
  *    shuffle carries at most `dim` rows per partition, independent of
  *    corpus size; the driver holds only the dim-sized weight vector.
  *
  * Engine-exactness (the DSIR/harmonicFit house rule): weights live on
  * the integer MICRO grid; per-doc residuals are micro-snapped before
  * the gradient sum, so every gradient component is an exact integer
  * sum in any accumulation order and retraining reproduces the weight
  * trajectory bit-for-bit.
  */
object QualityClassifier {

  /** A trained model: micro-grid weights (index = feature bucket). */
  final case class Model(dim: Int, biasMicro: Long,
                         weightsMicro: Array[Long]) {
    require(weightsMicro.length == dim, "weights/dim mismatch")
  }

  /** Per-doc feature arrays: (id, y, features array<struct<bucket,
    * weight>>) — zero-token docs keep an empty array (they still carry
    * a label and train the bias). */
  private def featureFrame(docs: DataFrame, idCol: String, textCol: String,
                           labelCol: String, dim: Int): DataFrame = {
    val sparse = FeatureHash.hashedTf(docs, idCol, textCol, dim)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("bucket"), col("weight"))).as("features"))
    docs.select(col(idCol).as("id"), col(labelCol).cast("double").as("y"))
      .join(sparse, Seq("id"), "left")
      .select(col("id"), col("y"),
        coalesce(col("features"),
          array().cast("array<struct<bucket:int,weight:bigint>>"))
          .as("features"))
  }

  /** Margin of one feature-array row against a weight-vector column, in
    * micro units (exact integer: micro weight x integer count).
    *
    * The weights ship as a DENSE dim-sized ARRAY literal indexed by
    * bucket (buckets are 0..dim-1 by construction — FeatureHash pmods
    * into the dim range), so the lookup is an O(1) array index. The
    * r14 form was a non-zero-entries MAP literal: Catalyst map lookup
    * is a LINEAR scan of the key array (ArrayBasedMapData has no hash
    * index), so every feature element paid O(non-zero dim) comparisons
    * — at dim 1024 and a trained (dense) weight vector, ~1000x the
    * work per feature of an array index, a constant that scales
    * straight into the 100 TB score pass. Arithmetic is unchanged
    * (same integer micro products, zero weights contribute zero), so
    * training trajectories and scores stay bit-identical. */
  private def dotMicro(wArr: Column): Column =
    aggregate(col("features"), lit(0L),
      (acc, f) => acc +
        element_at(wArr, f.getField("bucket") + 1) * f.getField("weight"))

  private def weightArrayLit(w: Array[Long]): Column =
    typedLit(w.toIndexedSeq)

  /** Train by full-batch gradient descent: epochs scans of the cached
    * feature frame, each producing an exact dim-sized integer gradient.
    * `labelCol` must be 0/1. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int = 1024, epochs: Int = 10,
            lr: Double = 0.5): Model = {
    require(epochs >= 1 && lr > 0.0, s"epochs $epochs / lr $lr")
    val feats = featureFrame(docs, idCol, textCol, labelCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count()
      require(n > 0, "empty training frame")
      val w = new Array[Long](dim)
      var bias = 0L
      var epoch = 0
      while (epoch < epochs) {
        val p = lit(1.0) /
          (lit(1.0) + exp(-(dotMicro(weightArrayLit(w)) / lit(1e6) +
            lit(bias) / lit(1e6))))
        // micro-snap the residual BEFORE the gradient sum: every
        // gradient component becomes an exact integer sum, order-free
        val resid = feats.select(col("features"),
          round((p - col("y")) * lit(1e6)).cast("long").as("r"))
        // ONE job per epoch: the bias gradient rides the same
        // explode + partial-agg as the per-bucket gradients through a
        // synthetic bias bucket (-1, weight 1) appended to every doc's
        // features — sum(r * 1) == sum(r) exactly (integer micro
        // units), and empty-feature docs still contribute their bias
        // row. Folding the two actions halves the per-epoch driver
        // round-trips and removes the residual persist/unpersist pair
        // (the epoch loop is wall-bound on job latency, not cpu).
        val gradRows = resid
          .select(col("r"), explode(concat(col("features"),
            array(struct(lit(-1).cast("int").as("bucket"),
              lit(1L).as("weight"))))).as("f"))
          .groupBy(col("f.bucket").as("bucket"))
          .agg(sum(col("r") * col("f.weight")).as("g"))
          .collect()
        var gBias = 0L
        gradRows.foreach { row =>
          val b = row.getInt(0)
          if (b < 0) gBias = row.getLong(1)
          else w(b) -= math.rint(lr * row.getLong(1) / n).toLong
        }
        bias -= math.rint(lr * gBias / n).toLong
        epoch += 1
      }
      Model(dim, bias, w)
    } finally {
      feats.unpersist()
    }
  }

  /** Score docs under a trained model: adds `score` (the probability
    * the doc is target-class, rounded) and `keep` (score >= threshold
    * as 0/1). Stateless column arithmetic over one pass of the corpus —
    * the gate composes with any downstream filter. */
  def score(docs: DataFrame, model: Model, idCol: String, textCol: String,
            threshold: Double = 0.5, roundTo: Int = 4): DataFrame = {
    val feats = FeatureHash.hashedTf(docs, idCol, textCol, model.dim)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("bucket"), col("weight"))).as("features"))
    val margin = dotMicro(weightArrayLit(model.weightsMicro)) / lit(1e6) +
      lit(model.biasMicro) / lit(1e6)
    docs.join(feats.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("features",
        coalesce(col("features"),
          array().cast("array<struct<bucket:int,weight:bigint>>")))
      .withColumn("score",
        round(lit(1.0) / (lit(1.0) + exp(-margin)), roundTo))
      .withColumn("keep", (col("score") >= threshold).cast("int"))
      .drop("features")
  }
}
