package graft.multimodal

import graft.SparkSuite
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSuite {

  test("stub decode is deterministic and length-preserving") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val px1 = decodeImageStub(bytes)
    val px2 = decodeImageStub(bytes)
    assert(px1.toSeq == px2.toSeq)
    assert(px1.length == bytes.length)
    assert(px1.forall(p => p >= 0 && p < 256))
  }

  test("feature histogram is normalized") {
    val feats = extractFeatures(decodeImageStub("some image bytes".getBytes))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-5)
    assert(extractFeatures(Array.empty[Int]).forall(_ == 0f))
  }

  test("frame sampling takes every k-th block") {
    val data = Array.tabulate[Byte](100)(_.toByte)
    val frames = sampleFrames(data, frameSize = 10, everyK = 3)
    assert(frames.size == 4) // blocks 0, 3, 6, 9
    assert(frames.head.toSeq == data.slice(0, 10).toSeq)
    assert(frames(1).toSeq == data.slice(30, 40).toSeq)
  }

  test("nearest-neighbor resize is total, deterministic, and hits target dims") {
    val px = decodeImageStub("a raster made of text bytes, long enough to resample".getBytes)
    val small = resizeNearest(px, 4, 4)
    assert(small.length == 16)
    assert(small.toSeq == resizeNearest(px, 4, 4).toSeq)
    // upscale beyond source size replicates pixels, never crashes
    val up = resizeNearest(Array(7), 3, 3)
    assert(up.toSeq == Seq.fill(9)(7))
    assert(resizeNearest(Array.empty[Int], 2, 2).toSeq == Seq(0, 0, 0, 0))
    // resized pixels are a subset of the source values (nearest = no blending)
    assert(small.forall(px.contains))
  }

  test("frame featurize fans out every k-th frame with normalized features") {
    import spark.implicits._
    val data = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val items = Seq(MediaItem(1L, "video", data, 0, 0)).toDS()
    val frames = frameFeaturize(items, frameSize = 100, everyK = 3).collect()
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3)) // blocks 0,3,6,9
    frames.foreach { f =>
      assert(f.feature_dim == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-5)
    }
  }

  test("thumbnail featurize = decode -> resize -> histogram, deterministic") {
    import spark.implicits._
    val items = documentsAsMedia(spark, "/root/testdata/sf0.001").limit(20)
    val a = thumbnailFeaturize(items, side = 8).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val b = thumbnailFeaturize(items, side = 8).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b && a.nonEmpty)
    // 64 thumbnail pixels -> histogram still sums to 1
    a.values.foreach(f => assert(math.abs(f.sum - 1.0f) < 1e-5))
  }

  test("distributed featurize pipeline preserves schema and determinism") {
    val items = documentsAsMedia(spark, "/root/testdata/sf0.001")
    val out1 = featurize(items).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val out2 = featurize(items).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(out1 == out2)
    assert(out1.nonEmpty)
    assert(out1.values.forall(_.length == 16))
  }
}
