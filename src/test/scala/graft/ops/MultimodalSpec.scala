package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "abcdefgh " * 20, "en", "src0", 180L),
    (1L, "media payload " * 10, "en", "src1", 140L),
    (2L, "video bytes " * 30, "en", "src2", 360L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("synthetic media table has the production schema") {
    val m = Multimodal.syntheticMedia(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    assert(m.count() == 3)
    val kinds = m.select("kind").as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("feature extraction: deterministic, normalized histogram") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.syntheticMedia(docs)).collect()
    assert(feats.length == 3)
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0f) < 1e-4)
      assert(f.n_bytes > 0)
    }
    // deterministic re-run
    val again = Multimodal.extractFeatures(spark,
      Multimodal.syntheticMedia(docs)).collect()
    assert(feats.map(_.features.toSeq).toSeq ==
      again.map(_.features.toSeq).toSeq)
  }

  test("frame sampling explodes video rows only") {
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.syntheticMedia(docs)).collect()
    assert(frames.nonEmpty)
    val vids = Multimodal.syntheticMedia(docs)
      .filter(col("kind") === "video").count()
    assert(frames.map(_.media_id).distinct.length == vids)
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }
}
