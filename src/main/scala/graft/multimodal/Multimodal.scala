package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One multimodal asset: opaque binary payload + typed metadata. The
  * payload is NEVER interpreted by the engine — it flows as
  * `BinaryType` through scans/shuffles; only the decode boundary (see
  * [[Multimodal.extractFeatures]]) touches bytes.
  */
case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int,
                      n_frames: Int, mime: String)

case class MediaFeature(asset_id: Long, kind: String, feature: Array[Float])

/** Multimodal-column operators (SURVEY.md §2c): image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample implemented as batched partition-local
  * transforms.
  *
  * STUB BOUNDARY: this container has no image/audio codecs, so
  * `decodeStub` is a deterministic fake (hash-derived floats) standing in
  * for a real decoder — clearly marked below. Everything AROUND the stub
  * is the real engine surface: binary-safe schema, partition-batched
  * execution (the JVM analog of a vectorized/Arrow-batched UDF), typed
  * metadata projections, and deterministic frame sampling.
  *
  * Scale posture: payloads never enter a shuffle wider than their
  * partition (mapPartitions only); metadata-only plans (resizePlan,
  * sampleFrames) prune the binary column at the parquet scan, so a
  * 100 TB asset table pays bytes only at the decode stage.
  */
object Multimodal {

  val Schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  /** Deterministic synthetic asset table (no media files ship with the
    * testdata): payload bytes derived from sha-256 of the id — stable
    * across runs, unique per asset.
    */
  def syntheticAssets(spark: SparkSession, n: Int,
                      payloadBytes: Int = 4096): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kinds = Seq("image", "audio", "video")
      val kind = kinds((i % 3).toInt)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val seed = md.digest(s"asset-$i".getBytes("UTF-8"))
      val payload = Array.tabulate[Byte](payloadBytes)(j => seed((j % 32)))
      MediaAsset(i, kind, payload,
        width = if (kind != "audio") 640 + (i % 4).toInt * 160 else 0,
        height = if (kind != "audio") 480 + (i % 4).toInt * 120 else 0,
        sample_rate = if (kind == "audio") 16000 else 0,
        n_frames = if (kind == "video") 240 + (i % 60).toInt else 1,
        mime = kind match {
          case "image" => "image/png"
          case "audio" => "audio/wav"
          case _ => "video/mp4"
        })
    }
  }

  /** ======== STUB: deterministic fake decoder ========
    * Stands in for codec + model inference (e.g. JPEG decode → CNN
    * embedding). Real deployments swap ONLY this function; the batched
    * partition plumbing around it is production-shaped. Output: `dim`
    * floats in [-1, 1], a pure function of the payload bytes.
    */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
      j += 1
    }
    out
  }

  /** Feature extraction over the binary column, batched per partition
    * (the JVM analog of `mapInPandas`: decode amortized over
    * `batchSize`-row groups, never row-at-a-time through a boxed UDF,
    * payload bytes never shuffled).
    */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 64,
                      batchSize: Int = 128): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real impl would hand an Arrow batch
        // to the codec/model runtime
        batch.iterator.map(a =>
          MediaFeature(a.asset_id, a.kind, decodeStub(a.payload, dim)))
      }
    }
  }

  /** Metadata-only resize plan: target dims preserving aspect ratio,
    * capped at `maxSide`. Pure column arithmetic — the binary column is
    * pruned from the scan entirely (check ReadSchema in .explain).
    */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide).cast(DoubleType) / col("width"),
      lit(maxSide).cast(DoubleType) / col("height"),
      lit(1.0))
    assets
      .filter(col("kind") =!= "audio")
      .select(col("asset_id"), col("kind"), col("width"), col("height"),
        floor(col("width") * scale).cast(IntegerType).as("target_width"),
        floor(col("height") * scale).cast(IntegerType).as("target_height"))
  }

  /** Deterministic frame sampling for video assets: every `stride`-th
    * frame index up to `maxFrames` — one output row per sampled frame
    * (metadata only; a decoder would seek these indices).
    */
  def sampleFrames(assets: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    assets
      .filter(col("kind") === "video")
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0), least(col("n_frames") - 1,
          lit((maxFrames - 1) * stride)), lit(stride))).as("frame_idx"))
}
