package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic media schema + batch image feature extraction") {
    val media = Multimodal.syntheticMedia(spark, 100).toDF().repartition(4)
    assert(media.schema.fieldNames.toSet ==
      Set("media_id", "kind", "data", "width", "height", "duration_ms"))
    val feats = Multimodal.decodeImageFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 100)
    rows.foreach { f =>
      assert(f.channels == 3)
      assert(f.feature.length == 8)
      assert(f.width >= 32 && f.height >= 32)
    }
    // deterministic: re-run produces identical features
    val again = Multimodal.decodeImageFeatures(media).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("video frame sampling emits 1->N rows at the requested fps") {
    val media = Multimodal.syntheticMedia(spark, 20, kind = "video").toDF()
    val frames = Multimodal.sampleFrames(media, fps = 2.0).cache()
    val perVideo = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // duration 1000 + (i%10)*500 ms at 2 fps (every 500 ms)
    (0 until 20).foreach { i =>
      val dur = 1000 + (i % 10) * 500
      assert(perVideo(i.toLong) == math.ceil(dur / 500.0).toLong)
    }
    assert(frames.filter(col("frame_idx") === 0).count() == 20)
    frames.unpersist()
  }

  test("mediaStats aggregates header metadata without shuffling blobs") {
    val media = Multimodal.syntheticMedia(spark, 50).toDF()
    val r = Multimodal.mediaStats(media).head()
    assert(r.getAs[String]("kind") == "image")
    assert(r.getAs[Long]("n") == 50)
    assert(r.getAs[Long]("total_bytes") == 50L * 80)
  }

  test("merge strategies: TakeBest / Average / Weighted") {
    import spark.implicits._
    val results = Seq(
      (1L, "hnsw", 0.9, 0.1), (1L, "ivf", 0.7, 0.3),
      (2L, "hnsw", 0.5, 0.5), (2L, "ivf", 0.8, 0.2)
    ).toDF("id", "source", "score", "distance")
    val best = ResultMerger.merge(results, ResultMerger.TakeBest)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(best(1L) == (0.9, 0.1) && best(2L) == (0.8, 0.2))
    val avgd = ResultMerger.merge(results, ResultMerger.Average)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(avgd(1L) - 0.8) < 1e-9)
    val w = ResultMerger.merge(results,
        ResultMerger.Weighted(Map("hnsw" -> 3.0, "ivf" -> 1.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(w(1L) - (0.9 * 3 + 0.7) / 4) < 1e-9)
  }
}
