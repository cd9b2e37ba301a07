package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing contract: schema, batch shape, partition-count
  * invariance, deterministic stub decode (task brief: Spark-side
  * plumbing real and tested; codec stubbed). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.multimodal.Multimodal

  private def media = Multimodal.mediaFromDocuments(
    Tables.documents(spark, TestSpark.sf0001))

  test("media table carries opaque payload + typed metadata") {
    val m = media
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "meta"))
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction yields fixed-width vectors, schema stable") {
    val f = Multimodal.extractFeatures(media)
    assert(f.schema == Multimodal.featureSchema)
    val rows = f.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.getSeq[Float](3).length == 8))
    // n_bytes must equal the payload byte length
    val joined = f.join(media, "media_id")
      .select(col("n_bytes"), length(col("payload")).as("pl"))
      .collect()
    assert(joined.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("decode is partition-count invariant (codec init per partition)") {
    def run(parts: Int) =
      Multimodal.extractFeatures(media.repartition(parts))
        .orderBy("media_id").collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }

  test("frame sampling keeps every k-th index within n_frames") {
    val s = Multimodal.sampleFrames(media, everyK = 7)
      .groupBy("media_id").agg(max("frame_idx").as("mx"),
        count(lit(1)).as("n"))
      .join(media.select(col("media_id"), col("meta.n_frames").as("nf")),
        "media_id")
      .collect()
    assert(s.forall(r => r.getAs[Int]("mx") < r.getAs[Int]("nf")))
    assert(s.forall(r =>
      r.getAs[Long]("n") == (r.getAs[Int]("nf") + 6) / 7))
  }

  test("resize rewrites metadata without touching payload") {
    val r = Multimodal.resizeMeta(media, 32, 32)
    val row = r.select(col("meta.width"), col("meta.height"),
      length(col("payload"))).head()
    assert(row.getInt(0) == 32 && row.getInt(1) == 32)
    assert(r.count() == media.count())
  }
}
