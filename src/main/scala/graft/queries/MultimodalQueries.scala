package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries. The binary media columns themselves aren't
  * DuckDB-replayable, so the oracle surface is built from DETERMINISTIC
  * formula-pixel images ([[Multimodal.syntheticPixelMedia]]): the blobs are
  * really encoded (JDK PNG/BMP writers) and really decoded
  * ([[Multimodal.decodePixelStats]] reads actual pixels through ImageIO),
  * and because both codecs are lossless the decoded integer pixel sums
  * equal the generator's closed form — which IS SQL-expressible, so DuckDB
  * replays the whole pipeline without any codec. A decoder that returned
  * stub dimensions, swapped channels, dropped rows, or mis-walked stride
  * would hash-mismatch.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // real encode -> real decode -> exact per-image stats; 24 images
    // cover every (w, h) combination of the generator and both formats
    "image_decode" -> ((s, _) => {
      Multimodal.decodePixelStats(
          Multimodal.syntheticPixelMedia(s, 24).toDF())
        .toDF()
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("channels"), col("n_pixels"), col("sum_r"), col("sum_g"),
          col("sum_b"))
        .orderBy("media_id")
    }),
    // real WAV encode -> real byte-level PCM16 decode -> exact per-clip
    // sums; 20 clips cover every (n_samples, channels) combination
    "audio_decode" -> ((s, _) => {
      Multimodal.decodePcmStats(
          Multimodal.syntheticPcmMedia(s, 20).toDF())
        .toDF()
        .select(col("media_id"), col("format"), col("channels"),
          col("sample_rate"), col("n_samples"), col("sum_ch0"),
          col("sum_ch1"), col("sum_abs"))
        .orderBy("media_id")
    }),
    // real uncompressed-AVI encode -> real RIFF+DIB frame decode -> exact
    // per-video sums; 18 videos cover every (w, h, n_frames) combination
    // (3x of each), two of the three widths exercise row padding, and
    // sum_luma_row0 pins the bottom-up row convention
    "video_decode" -> ((s, _) => {
      Multimodal.decodeVideoFrameStats(
          Multimodal.syntheticAviMedia(s, 18).toDF())
        .toDF()
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("n_frames"), col("duration_ms"), col("sum_r"), col("sum_g"),
          col("sum_b"), col("sum_luma_row0"))
        .orderBy("media_id")
    }))

  val oracles: Map[String, String] = Map(
    // the generator formula, replayed: pixel (x, y) of image i has
    // r = (7i+3x+5y) % 256, g = (11i+x+2y) % 256, b = (13i+3x+y) % 256
    // over w = 8+(i%5)*4, h = 8+(i%3)*4; range bounds are the max dims
    "image_decode" ->
      """WITH m AS (SELECT i AS media_id, (8 + (i % 5) * 4) AS w,
        |    (8 + (i % 3) * 4) AS h FROM range(0, 24) t(i)),
        |px AS (SELECT media_id, w, h, x, y
        |  FROM m, range(0, 24) xs(x), range(0, 16) ys(y)
        |  WHERE x < w AND y < h)
        |SELECT media_id,
        |  CASE WHEN media_id % 4 = 3 THEN 'bmp' ELSE 'png' END AS format,
        |  w::INT AS width, h::INT AS height, 3 AS channels,
        |  (w * h)::BIGINT AS n_pixels,
        |  sum((media_id * 7 + x * 3 + y * 5) % 256)::BIGINT AS sum_r,
        |  sum((media_id * 11 + x + y * 2) % 256)::BIGINT AS sum_g,
        |  sum((media_id * 13 + x * 3 + y) % 256)::BIGINT AS sum_b
        |FROM px GROUP BY media_id, w, h ORDER BY media_id""".stripMargin,
    // the generator formula, replayed: sample t of channel c in audio i is
    // v = ((7i + 3t + 11c) % 2003) - 1001 over n = 64 + (i%5)*32 samples,
    // 1 + (i%2) channels; range bounds are the max dims
    "audio_decode" ->
      """WITH m AS (SELECT i AS media_id, (64 + (i % 5) * 32) AS ns,
        |    (1 + (i % 2)) AS ch FROM range(0, 20) t(i)),
        |sm AS (SELECT media_id, ns, ch, t, c,
        |    ((media_id * 7 + t * 3 + c * 11) % 2003) - 1001 AS v
        |  FROM m, range(0, 192) ts(t), range(0, 2) cs(c)
        |  WHERE t < ns AND c < ch)
        |SELECT media_id, 'wav' AS format, ch::INT AS channels,
        |  8000 AS sample_rate, ns::BIGINT AS n_samples,
        |  sum(CASE WHEN c = 0 THEN v ELSE 0 END)::BIGINT AS sum_ch0,
        |  sum(CASE WHEN c = 1 THEN v ELSE 0 END)::BIGINT AS sum_ch1,
        |  sum(abs(v))::BIGINT AS sum_abs
        |FROM sm GROUP BY media_id, ns, ch ORDER BY media_id""".stripMargin,
    // the generator formula, replayed: pixel (x, y) of frame f in video i
    // has r = (7i+3x+5y+f) % 256, g = (11i+x+2y+3f) % 256,
    // b = (13i+3x+y+7f) % 256 over w = 6+(i%3)*5, h = 4+(i%2)*4,
    // nf = 2+(i%3) frames at 25 fps; integer luma matches the decoder's
    // (r*299+g*587+b*114)/1000 on image row y=0 only
    "video_decode" ->
      """WITH m AS (SELECT i AS media_id, (6 + (i % 3) * 5) AS w,
        |    (4 + (i % 2) * 4) AS h, (2 + (i % 3)) AS nf FROM range(0, 18) t(i)),
        |px AS (SELECT media_id, w, h, nf, y,
        |    (media_id * 7 + x * 3 + y * 5 + f) % 256 AS r,
        |    (media_id * 11 + x + y * 2 + f * 3) % 256 AS g,
        |    (media_id * 13 + x * 3 + y + f * 7) % 256 AS b
        |  FROM m, range(0, 4) fs(f), range(0, 16) xs(x), range(0, 8) ys(y)
        |  WHERE f < nf AND x < w AND y < h)
        |SELECT media_id, 'avi/dib' AS format, w::INT AS width,
        |  h::INT AS height, nf::BIGINT AS n_frames,
        |  (nf * 40)::BIGINT AS duration_ms,
        |  sum(r)::BIGINT AS sum_r, sum(g)::BIGINT AS sum_g,
        |  sum(b)::BIGINT AS sum_b,
        |  sum(CASE WHEN y = 0 THEN (r * 299 + g * 587 + b * 114) // 1000
        |      ELSE 0 END)::BIGINT AS sum_luma_row0
        |FROM px GROUP BY media_id, w, h, nf ORDER BY media_id""".stripMargin)
}
