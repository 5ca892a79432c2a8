package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** Multimodal plumbing: schema, batch shape, null handling, determinism.
  * The codec is a stub by design (no native image/audio libs in the
  * build); what's under test is the Spark-side contract. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image/jpeg", "fake-jpeg-bytes-1".getBytes("UTF-8"),
      MediaMeta("cam0", Some(640), Some(480), None)),
    MediaRow(2L, "image/jpeg", "fake-jpeg-bytes-two".getBytes("UTF-8"),
      MediaMeta("cam1", Some(640), Some(480), None)),
    MediaRow(3L, "video/mp4", "fake-mp4".getBytes("UTF-8"),
      MediaMeta("cam2", None, None, Some(2500L))),
    MediaRow(4L, "image/jpeg", Array.emptyByteArray,
      MediaMeta("cam3", None, None, None))).toDS()

  test("image features: deterministic stub decode, empty payload safe") {
    val f1 = Multimodal.imageFeatures(media).collect().map(f => f.media_id -> f).toMap
    val f2 = Multimodal.imageFeatures(media, batchSize = 1).collect()
      .map(f => f.media_id -> f).toMap
    assert(f1.keySet == Set(1L, 2L, 3L, 4L))
    // batch size must not change results (batch shape is an optimization)
    f1.foreach { case (id, f) =>
      assert(f2(id).width == f.width && f2(id).brightness == f.brightness &&
        f2(id).histogram.toSeq == f.histogram.toSeq)
    }
    assert(f1(4L).n_bytes == 0L && f1(4L).brightness == 0.0)
    assert(f1(1L).histogram.sum > 0.999 && f1(1L).histogram.sum < 1.001)
  }

  test("resize: payload rewritten deterministically, identity and meta updated") {
    val out = Multimodal.resizeImages(media, 32, 32).collect()
      .map(m => m.media_id -> m).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    out.values.foreach { m =>
      assert(m.meta.width.contains(32) && m.meta.height.contains(32))
      assert(m.content.length == 16) // stub codec: md5-sized payload
    }
    // pure function of (payload, dims): same input -> same bytes; distinct
    // payloads -> distinct outputs
    val again = Multimodal.resizeImages(media, 32, 32).collect()
      .map(m => m.media_id -> m).toMap
    out.foreach { case (id, m) =>
      assert(again(id).content.toSeq == m.content.toSeq)
    }
    assert(out(1L).content.toSeq != out(2L).content.toSeq)
    // mime and source pass through untouched
    assert(out(3L).mime == "video/mp4" && out(3L).meta.source == "cam2")
  }

  test("frame sampling: one row per sampled frame, duration-driven") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(3L).length == 3) // 0ms, 1000ms, 2000ms of 2500ms
    assert(byId(3L).map(_.frame_ms).sorted.toSeq == Seq(0L, 1000L, 2000L))
    assert(byId(3L).forall(_.frame.length == 16)) // md5-stub frame payload
    assert(!byId.contains(1L) || byId(1L).length == 1) // images: duration 0 -> 1 frame
  }

  test("payload stats stay pure-SQL (no decode)") {
    val stats = Multimodal.payloadStats(media.toDF()).collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(stats(1L) == "fake-jpeg-bytes-1".length.toLong)
    assert(stats(4L) == 0L)
  }
}
