package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MediaPipeline

/** Correctness query over the multimodal pipeline: the DuckDB oracle
  * recomputes the stub-decoder's byte arithmetic directly on the source
  * text (payload bytes == ASCII codes), independently of the Scala
  * implementation. */
object Multimodal {

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    MediaPipeline.extractFeatures(MediaPipeline.mediaTable(spark, dir))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(col("checksum")).as("sum_checksum"),
        min(col("first_byte")).as("min_first_byte"),
        max(col("frame_avg")).as("max_frame_avg"))

  val mediaFeaturesSql: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    text, len(text) AS n FROM documents),
      |p AS (SELECT *, list_filter(list_transform(range(0, 8),
      |        k -> 1 + k * greatest(n // 8, 1)), x -> x <= n) AS pos FROM m),
      |f AS (SELECT media_id, media_type, CAST(n AS BIGINT) AS n_bytes,
      |    CAST(list_sum(list_transform(range(1, n+1), i -> ascii(substr(text, CAST(i AS INT), 1)))) AS BIGINT) AS checksum,
      |    CASE WHEN n > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS first_byte,
      |    CAST(list_sum(list_transform(pos, x -> ascii(substr(text, CAST(x AS INT), 1)))) AS DOUBLE)
      |      / len(pos) AS frame_avg
      |  FROM p)
      |SELECT media_type, COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
      |  CAST(SUM(checksum) AS BIGINT) AS sum_checksum,
      |  MIN(first_byte) AS min_first_byte,
      |  MAX(frame_avg) AS max_frame_avg
      |FROM f GROUP BY media_type""".stripMargin

  /** The resize stage verified THROUGH the binary boundary: the
    * downsampled payload is re-read as bytes and folded to per-type
    * sample counts and checksums, so the oracle (which recomputes the
    * same nearest-neighbor positions on the source text) catches any
    * loss, reorder, or off-by-one in the byte plumbing — not just in
    * the summary arithmetic. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    MediaPipeline.resize(MediaPipeline.mediaTable(spark, dir))
      .map { r =>
        var checksum = 0L
        r.resized.foreach(b => checksum += (b & 0xff))
        (r.media_type, r.orig_bytes, r.resized.length.toLong, checksum)
      }
      .toDF("media_type", "orig_bytes", "new_bytes", "checksum")
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("orig_bytes")).as("sum_orig_bytes"),
        sum(col("new_bytes")).as("sum_new_bytes"),
        sum(col("checksum")).as("sum_checksum"))
  }

  val mediaResizeSql: String = {
    val cap = MediaPipeline.ResizeCap
    s"""WITH m AS (SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    text, len(text) AS n FROM documents),
      |p AS (SELECT *, list_filter(list_transform(range(0, $cap),
      |        k -> 1 + k * greatest(n // $cap, 1)), x -> x <= n) AS pos FROM m),
      |f AS (SELECT media_type, CAST(n AS BIGINT) AS orig_bytes,
      |    CAST(len(pos) AS BIGINT) AS new_bytes,
      |    CAST(coalesce(list_sum(list_transform(pos,
      |      x -> ascii(substr(text, CAST(x AS INT), 1)))), 0) AS BIGINT) AS checksum
      |  FROM p)
      |SELECT media_type, COUNT(*) AS n_media,
      |  CAST(SUM(orig_bytes) AS BIGINT) AS sum_orig_bytes,
      |  CAST(SUM(new_bytes) AS BIGINT) AS sum_new_bytes,
      |  CAST(SUM(checksum) AS BIGINT) AS sum_checksum
      |FROM f GROUP BY media_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_features" -> (mediaFeatures _),
    "mm_media_resize" -> (mediaResize _))

  val oracles: Map[String, String] = Map(
    "mm_media_features" -> mediaFeaturesSql,
    "mm_media_resize" -> mediaResizeSql)
}
