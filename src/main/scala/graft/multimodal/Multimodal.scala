package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (task brief: image/audio/video as opaque
  * binary columns + typed metadata, decode/feature-extract/resize/
  * frame-sample stages).
  *
  * The Spark-side contract here is REAL and tested: schema, partition
  * iteration, batch shape, and the per-partition decode loop are exactly
  * what a production media pipeline runs. The codec itself is a STUB —
  * this container has no image/audio libraries — marked by
  * `decodeStub`, which derives deterministic fake pixels/samples from
  * the payload bytes so tests have stable expectations. Swap
  * `decodeStub` for a real codec (e.g. javax.imageio / ffmpeg binding)
  * and nothing else changes.
  *
  * Scale notes: media work is embarrassingly parallel per row —
  * mapPartitions keeps the codec call off the driver, one codec init
  * per partition (not per row), and the output schema is columnar
  * (fixed-length feature vectors) so downstream aggregation stays in
  * Tungsten. Repartition by a size-balanced key before decode when
  * payload sizes are skewed.
  */
object Multimodal {

  /** media row schema: opaque payload + typed metadata */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = false),   // opaque bytes
    StructField("meta", StructType(Seq(                     // typed metadata
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** STUB codec ??? replacement point: deterministic fake "decode" that
    * folds payload bytes into an 8-dim feature vector. A real codec
    * returns pixels/samples here; everything around it is production
    * plumbing. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** build a media table from documents (text bytes stand in for real
    * payloads; metadata derived deterministically) */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // pmod, not %: Spark's % keeps the dividend's sign, so a negative
      // doc_id would index 0 (runtime error) or -1/-2 (element_at
      // resolves those from the array END — silently wrong kind)
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 100 + 1).cast(IntegerType).as("n_frames"))
        .as("meta"))

  /** decode + feature-extract: one codec init per partition, batch
    * iteration inside — the mapPartitions shape a real decoder needs */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        // real codec: initialize decoder context HERE, once per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = decodeStub(payload)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            payload.length, feats)
        }
      }(enc)
  }

  /** frame-sample: keep every k-th frame index up to meta.n_frames —
    * pure column math on metadata, no decode needed. A zero-frame or
    * NULL-frame-count asset yields ZERO rows (greatest(n_frames, 0)
    * keeps sequence() from throwing on an empty range; explode drops
    * empty arrays) — corrupt metadata must not kill the whole job. */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, s"sampleFrames: everyK must be >= 1, got $everyK")
    media.select(col("media_id"), col("kind"),
      explode(when(col("meta.n_frames") > 0,
        sequence(lit(0), col("meta.n_frames") - 1, lit(everyK)))
        .otherwise(array().cast(ArrayType(IntegerType))))
        .as("frame_idx"))
  }

  /** resize stub: recompute metadata, mark payload for re-decode */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames")))
}
