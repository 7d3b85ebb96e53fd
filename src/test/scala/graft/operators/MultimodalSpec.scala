package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq((1L, "tiny"), (2L, "a longer payload body here"), (3L, ""))
    .toDF("doc_id", "text")

  test("withBlob produces a BinaryType payload of utf-8 length") {
    val df = Multimodal.withBlob(media, "doc_id", "text")
    assert(df.schema("payload").dataType == BinaryType)
    assert(df.select(length($"payload")).as[Int].collect().sorted.toSeq == Seq(0, 4, 26))
  }

  test("extractMeta yields typed metadata with deterministic stub dims") {
    val m1 = Multimodal.extractMeta(media, "doc_id", "text").collect()
    val m2 = Multimodal.extractMeta(media, "doc_id", "text").collect()
    assert(m1.sortBy(_.id).toSeq == m2.sortBy(_.id).toSeq, "stub decode must be deterministic")
    assert(m1.forall(m => m.width >= 1 && m.width <= 1280))
    assert(m1.forall(m => m.height >= 1 && m.height <= 720))
    assert(m1.map(m => m.id -> m.byteLen).toMap == Map(1L -> 4L, 2L -> 26L, 3L -> 0L))
  }

  test("sampleFrames emits at most maxFrames evenly spaced indices per row") {
    val meta = Multimodal.extractMeta(media, "doc_id", "text")
    val frames = Multimodal.sampleFrames(meta, 10)
    val counts = frames.groupBy("id").count().as[(Long, Long)].collect().toMap
    val nFrames = meta.collect().map(m => m.id -> m.nFrames).toMap
    counts.foreach { case (id, n) =>
      assert(n <= 11, s"row $id sampled $n frames") // ceil division can give maxFrames+1
      assert(n >= math.min(nFrames(id), 1))
    }
    // frame indices in range (frames carries its own nFrames column)
    val bad = frames.filter($"frame_idx" >= $"nFrames" || $"frame_idx" < 0).count()
    assert(bad == 0)
  }

  test("sampleFrames honors the cap when nFrames is between maxFrames and 2*maxFrames") {
    import org.apache.spark.sql.functions._
    // nFrames=19, maxFrames=10: floor stride would emit all 19 frames
    val meta = Seq(Multimodal.MediaMeta(1L, 10L, "x", 1, 1, 19)).toDS()
    val n = Multimodal.sampleFrames(meta, 10).count()
    assert(n <= 10, s"sampled $n frames for nFrames=19, cap 10")
  }

  test("batchedFeatures computes per-row byte stats through partition batches") {
    val out = Multimodal.batchedFeatures(media, "doc_id", "text", batchSize = 2)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(4L, 26L, 0L))
    assert(out.head._3 == "tiny".getBytes("UTF-8").map(_.toLong & 0xFF).sum)
  }
}
