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

  test("distributed featurize pipeline preserves schema and determinism") {
    val items = documentsAsMedia(spark, "/root/testdata/sf0.001")
    val out1 = featurize(items).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val out2 = featurize(items).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(out1 == out2)
    assert(out1.nonEmpty)
    assert(out1.values.forall(_.length == 16))
  }
}
