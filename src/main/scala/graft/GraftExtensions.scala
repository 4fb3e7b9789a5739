package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.{QaDecode, TextFunctions}
import graft.grid.GeoTransform
import graft.ops.Dedup

/** SQL surface for the engine's scalar kernels: registers them as named
  * functions so `spark.sql("SELECT modis_qa_conf(qa) ...")` works — via
  * `SparkSessionExtensions` (config `spark.sql.extensions=
  * graft.GraftExtensions`) or imperatively with
  * [[GraftFunctions.register]].
  *
  * Each function lowers to the same codegen'd Column chains the Scala
  * API uses — the registry entry just adapts Seq[Expression] => Expression.
  */
object GraftFunctions {

  private def lift1(f: Column => Column): Seq[Expression] => Expression =
    exprs => expression(f(column(exprs.head)))
  private def lift2(f: (Column, Column) => Column): Seq[Expression] => Expression =
    exprs => expression(f(column(exprs(0)), column(exprs(1))))

  val all: Map[String, Seq[Expression] => Expression] = Map(
    "modis_qa_conf" -> lift1(QaDecode.modisQaConf),
    "landsat8_qa_conf" -> lift1(QaDecode.landsat8QaConf),
    "glcf_class_name" -> lift1(graft.functions.GlcfClasses.className),
    "sinusoidal_x" -> lift2(GeoTransform.latLngToSinuX),
    "sinusoidal_y" -> lift1(GeoTransform.latLngToSinuY),
    "sinusoidal_lat" -> lift1(GeoTransform.sinuToLat),
    "sinusoidal_lng" -> lift2(GeoTransform.sinuToLng),
    "lang_id" -> lift1(TextFunctions.langId),
    "quality_score" -> lift1(TextFunctions.qualityScore),
    "text_fingerprint" -> lift1(TextFunctions.fingerprint),
    "token_count" -> lift1(TextFunctions.tokenCount),
    "repetition_ratio" -> lift1(TextFunctions.repetitionRatio(_)),
    "bpe_token_count" -> lift1(TextFunctions.approxBpeTokenCount),
    "nfc_normalize" -> lift1(graft.functions.NfcNormalizeExpr(_)),
    "normalize_text" -> lift1(TextFunctions.normalizeText),
    "simhash64" -> lift1(Dedup.simhash64))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // SURVEY §4's optional rule: lat/lng range predicates -> chunk-column
    // predicates the parquet scan can prune. Post-hoc resolution (not
    // optimizer) so it sees the lat/lng attributes before predicate
    // pushdown substitutes them away.
    e.injectPostHocResolutionRule(_ => graft.plans.LatLngPruning.Rule)
  }
}
