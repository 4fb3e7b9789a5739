package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Denoising-objective preprocessing: T5/UL2-style span corruption.
  *
  * Tokens are grouped into fixed-length spans; each (doc, span) makes an
  * independent deterministic keep/mask draw (the same md5 machinery as
  * [[Sampling]] — reproducible across runs, partitionings, and engines,
  * and re-drawable with a new salt per training epoch). A masked span
  * collapses to ONE sentinel token, unmasked tokens pass through — the
  * standard span-corruption input; the expected masked-token fraction is
  * `maskFraction`.
  *
  * Scale shape: a pure per-row Column transform — no shuffle, no state;
  * the higher-order lambdas are interpreted, which is fine for the
  * once-per-corpus (or once-per-epoch) materialization pass this is.
  */
object Denoise {

  /** (idCol, text_masked, n_masked) per input row. `spanLen` tokens per
    * span; `maskFraction` of tokens masked in expectation. */
  def maskSpans(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", maskFraction: Double = 0.2,
                spanLen: Int = 3, sentinel: String = "<mask>",
                salt: String = "graft"): DataFrame = {
    require(spanLen > 0, s"spanLen $spanLen")
    val thr = lit(Sampling.thresholdHex(maskFraction))
    val ts = graft.functions.TextFunctions.tokens(col(textCol))
    // per-token masked flag, decided once per (doc, span-block)
    val mk = transform(ts, (_, i) =>
      when(Sampling.hashDraw(
        concat(col(idCol).cast("string"), lit("#"),
          (i / lit(spanLen)).cast("int").cast("string")), salt) < thr,
        lit(1)).otherwise(lit(0)))
    df.select(col(idCol),
        col(textCol), mk.as("mk"), ts.as("ts"))
      .select(col(idCol),
        array_join(filter(transform(col("ts"), (t, i) =>
          when(element_at(col("mk"), i + 1) === 1,
            when(i % spanLen === 0, lit(sentinel)).otherwise(lit("")))
            .otherwise(t)), x => x =!= ""), " ").as("text_masked"),
        aggregate(col("mk"), lit(0L), (a, v) => a + v.cast("long"))
          .as("n_masked"))
  }
}
