package graft.multimodal

import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSuite {

  test("BMP codec round-trips pixels exactly, including non-multiple-of-4 widths") {
    for (w <- Seq(1, 3, 4, 7, 32); h <- Seq(1, 2, 5)) {
      val px = Array.tabulate(w * h)(i => (i * 37 + w) % 256)
      val bmp = encodeBmp(px, w, h)
      assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
      val Some((dw, dh, dpx)) = decodeBmp(bmp)
      assert((dw, dh) == ((w, h)), s"dims lost at ${w}x$h")
      assert(dpx.toSeq == px.toSeq, s"pixels corrupted at ${w}x$h")
    }
  }

  test("BMP decode handles 24-bit and top-down rasters, rejects malformed bytes") {
    // hand-build a 2x2 top-down 24-bit BMP: gray = mean(BGR)
    val buf = java.nio.ByteBuffer.allocate(14 + 40 + 2 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(buf.capacity())
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(2).putInt(-2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    // row 0 (top): pixels BGR (10,20,30) -> 20, (60,60,60) -> 60, pad 2
    buf.put(10.toByte).put(20.toByte).put(30.toByte)
      .put(60.toByte).put(60.toByte).put(60.toByte).putShort(0)
    // row 1: (90,90,90) -> 90, (0,0,3) -> 1, pad 2
    buf.put(90.toByte).put(90.toByte).put(90.toByte)
      .put(0.toByte).put(0.toByte).put(3.toByte).putShort(0)
    val Some((w, h, px)) = decodeBmp(buf.array())
    assert((w, h) == ((2, 2)))
    assert(px.toSeq == Seq(20, 60, 90, 1)) // top-down preserved as row 0 first
    // malformed inputs fall through to None, never throw
    assert(decodeBmp(Array[Byte]('B', 'M', 1, 2, 3)).isEmpty)
    assert(decodeBmp("not a bitmap at all, just text".getBytes).isEmpty)
    assert(decodeBmp(Array.empty[Byte]).isEmpty)
    // truncated pixel data: header claims more rows than the buffer holds
    val truncated = encodeBmp(Array.tabulate(64)(identity), 8, 8).take(1100)
    assert(decodeBmp(truncated).isEmpty)
    // int-overflow-crafted headers: width*bpp or width*height overflowing Int
    // must return None, not throw through the never-throws contract
    def crafted(width: Int, height: Int, hdrSize: Int = 40, bpp: Short = 8) = {
      val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(64).putShort(0).putShort(0).putInt(54)
      b.putInt(hdrSize).putInt(width).putInt(height).putShort(1).putShort(bpp)
        .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    assert(decodeBmp(crafted(0x10000000, 8)).isEmpty)          // stride overflow
    assert(decodeBmp(crafted(0x7fffffff, 0x7fffffff)).isEmpty) // pixel-count overflow
    assert(decodeBmp(crafted(4, Int.MinValue)).isEmpty)        // abs(MinValue) < 0
    assert(decodeBmp(crafted(4, 4, hdrSize = Int.MaxValue)).isEmpty) // paletteOff overflow
  }

  test("PNG codec round-trips pixels exactly through javax.imageio (lossless)") {
    for (w <- Seq(1, 3, 7, 32); h <- Seq(1, 2, 5)) {
      val px = Array.tabulate(w * h)(i => (i * 37 + w) % 256)
      val png = encodePng(px, w, h)
      assert((png(1), png(2), png(3)) == (('P'.toByte, 'N'.toByte, 'G'.toByte)))
      // bypassing the BMP leg: the generic router must hit decodeImageIO
      assert(decodeBmp(png).isEmpty, "PNG must not decode as BMP")
      val Some((dw, dh, dpx)) = decodeRaster(png)
      assert((dw, dh) == ((w, h)), s"dims lost at ${w}x$h")
      assert(dpx.toSeq == px.toSeq, s"pixels corrupted at ${w}x$h")
    }
  }

  test("JPEG decode: dims exact, deterministic, pixels near the source raster") {
    // a smooth gradient compresses well — keeps the lossy error tight and
    // the assertion honest (JPEG of pure noise would need a huge tolerance)
    val (w, h) = (48, 32)
    val px = Array.tabulate(w * h)(i => ((i % w) * 4 + (i / w) * 2) % 256)
    val jpg = encodeJpeg(px, w, h)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    val Some((dw, dh, dpx)) = decodeRaster(jpg)
    assert((dw, dh) == ((w, h)))
    val Some((_, _, dpx2)) = decodeRaster(jpg)
    assert(dpx.toSeq == dpx2.toSeq, "JPEG decode must be deterministic")
    val mae = px.zip(dpx).map { case (a, b) => math.abs(a - b) }.sum.toDouble / px.length
    assert(mae < 8.0, s"JPEG mean abs error too high: $mae")
  }

  test("undecodable payloads still fall to the stub; GIF magic is gated not decoded blindly") {
    assert(decodeRaster("just some text bytes".getBytes).isEmpty)
    assert(decodeRaster(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty) // truncated magic
    // a magic prefix with garbage body must return None, never throw
    assert(decodeRaster(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0, 1, 2)).isEmpty)
    assert(decodeRaster("GIF89a-but-not-really".getBytes).isEmpty)
    // decodeImage then yields the stub stream
    val garbage = "payload".getBytes
    assert(decodeImage(garbage).toSeq == decodeImageStub(garbage).toSeq)
  }

  test("aHash and thumbnails agree across BMP and PNG encodings of the same raster") {
    val (w, h) = (23, 17)
    val px = Array.tabulate(w * h)(i => (i * 131 + 7) % 256)
    val bmp = encodeBmp(px, w, h)
    val png = encodePng(px, w, h)
    assert(averageHash(bmp) == averageHash(png),
      "lossless formats must produce identical perceptual hashes")
    val tb = resizeNearest(decodeRaster(bmp).get._3, w, h, 8, 8)
    val tp = resizeNearest(decodeRaster(png).get._3, w, h, 8, 8)
    assert(tb.toSeq == tp.toSeq)
  }

  test("documentsAsMedia payloads are real BMPs that decode back to the text bytes") {
    val items = documentsAsMedia(spark, "/root/testdata/sf0.001").limit(10).collect()
    assert(items.nonEmpty)
    items.foreach { item =>
      val Some((w, h, px)) = decodeBmp(item.data)
      assert(w == item.width && h == item.height, s"doc ${item.doc_id} dims")
      // decoded pixels = text bytes + zero padding to the raster
      assert(px.length >= 1 && px.length == w * h)
      val expectedPrefix = px.takeWhile(_ != 0) // text bytes are non-zero ASCII
      assert(expectedPrefix.nonEmpty)
    }
  }

  test("encode -> decode -> resize is deterministic end to end") {
    val px = Array.tabulate(300)(i => (i * 7) % 256)
    val bmp = encodeBmp(px, 20, 15)
    val Some((w, h, dpx)) = decodeBmp(bmp)
    val a = resizeNearest(dpx, w, h, 8, 8)
    val b = resizeNearest(decodeBmp(encodeBmp(px, 20, 15)).get._3, 20, 15, 8, 8)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64 && a.forall(v => v >= 0 && v < 256))
    // real-dims resize samples from the true raster: row 0 of the thumb
    // comes from row 0 of the source
    assert(a(0) == px(0))
  }

  test("colorhist diversity: flat raster scores 0, even two-tone scores 500000") {
    // recompute the mm_image_colorhist kernel math on planted rasters
    def stats(px: Array[Int]): (Long, Long, Long) = {
      val c = new Array[Long](16)
      px.foreach(v => c(v / 16) += 1)
      val n = px.length.toLong
      val sumSq = c.map(x => x * x).sum
      (c.count(_ > 0).toLong, c.indexOf(c.max).toLong,
        1000000L - sumSq * 1000000L / (n * n))
    }
    val flat = Array.fill(64)(200)
    assert(stats(flat) == ((1L, 12L, 0L)))
    val twoTone = Array.tabulate(64)(i => if (i < 32) 10 else 250)
    val (used2, dom2, div2) = stats(twoTone)
    assert(used2 == 2L && dom2 == 0L && div2 == 500000L)
    // uniform over all 16 buckets maximizes diversity at 1 - 1/16
    val uniform = Array.tabulate(64)(i => (i % 16) * 16)
    assert(stats(uniform)._3 == 937500L)
  }

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

  test("WAV codec round-trips PCM16 samples exactly, including empty and negative") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = Multimodal.encodeWavPcm16(samples, 8000)
    val Some((rate, back)) = Multimodal.decodeWavPcm16(bytes)
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
    val Some((_, empty)) = Multimodal.decodeWavPcm16(
      Multimodal.encodeWavPcm16(Array.empty[Short], 44100))
    assert(empty.isEmpty)
  }

  test("WAV decode walks extra chunks and rejects malformed payloads without throwing") {
    val good = Multimodal.encodeWavPcm16(Array[Short](5, -5, 7), 8000)
    // splice an unknown chunk between WAVE and fmt: decoder must skip it
    val extra = java.nio.ByteBuffer.allocate(good.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(good, 0, 12)
    extra.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    extra.put(good, 12, good.length - 12)
    assert(Multimodal.decodeWavPcm16(extra.array()).map(_._2.toSeq)
      .contains(Seq[Short](5, -5, 7)))
    // malformed inputs: truncated, wrong magic, stereo, odd data length,
    // chunk length past the buffer — all None, never a throw
    assert(Multimodal.decodeWavPcm16(good.take(30)).isEmpty)
    assert(Multimodal.decodeWavPcm16("RIFFxxxxNOPE".getBytes ++ good.drop(12)).isEmpty)
    val stereo = good.clone(); stereo(22) = 2 // channels field
    assert(Multimodal.decodeWavPcm16(stereo).isEmpty)
    val oddLen = good.clone(); oddLen(40) = 5 // data length = 5 (odd)
    assert(Multimodal.decodeWavPcm16(oddLen).isEmpty)
    val overLen = good.clone(); overLen(43) = 0x7f.toByte // huge data length
    assert(Multimodal.decodeWavPcm16(overLen).isEmpty)
  }

  test("AVI container round-trips frames exactly, including padded strides") {
    val w = 5; val h = 3 // stride 8 > width: padding exercised
    val frames = Seq(
      Array.tabulate(w * h)(i => i * 7 % 256),
      Array.tabulate(w * h)(i => 255 - i),
      Array.fill(w * h)(0))
    val avi = Multimodal.encodeAviRawFrames(frames, w, h)
    val Some((dw, dh, back)) = Multimodal.decodeAviFrames(avi)
    assert(dw == w && dh == h && back.length == 3)
    back.zip(frames).foreach { case (got, want) => assert(got.toSeq == want.toSeq) }
  }

  test("AVI demux skips unknown chunks and rejects malformed containers without throwing") {
    val avi = Multimodal.encodeAviRawFrames(Seq(Array.tabulate(4)(_ * 9)), 2, 2)
    // junk chunk spliced right after the RIFF type: must be skipped
    val extra = java.nio.ByteBuffer.allocate(avi.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(avi, 0, 12)
    extra.put("JUNK".getBytes).putInt(4).putInt(0xdeadbeef)
    extra.put(avi, 12, avi.length - 12)
    assert(Multimodal.decodeAviFrames(extra.array()).exists(_._3.length == 1))
    // malformed: truncated, wrong magic, frame chunk shorter than a frame
    assert(Multimodal.decodeAviFrames(avi.take(40)).isEmpty)
    assert(Multimodal.decodeAviFrames("RIFF0000NOPE".getBytes ++ avi.drop(12)).isEmpty)
    val short = avi.clone()
    // find the 00db chunk and shrink its declared length below one frame
    val idx = short.sliding(4).indexWhere(_.sameElements("00db".getBytes))
    short(idx + 4) = 1; short(idx + 5) = 0; short(idx + 6) = 0; short(idx + 7) = 0
    assert(Multimodal.decodeAviFrames(short).isEmpty)
  }

  test("documentsAsVideo payloads demux to the text's byte slices") {
    val items = Multimodal.documentsAsVideo(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 5).collect()
    assert(items.nonEmpty)
    items.foreach { item =>
      val Some((w, h, frames)) = Multimodal.decodeAviFrames(item.data)
      assert(w == item.width && h == item.height)
      assert(frames.length == item.n_frames)
      assert(frames.length == (2 + item.doc_id % 4).toInt)
    }
  }

  test("audio features match the closed form on a known waveform") {
    // square-ish alternation: +10, -10, ... -> every step is a crossing
    val s = Array.tabulate(8)(i => if (i % 2 == 0) 10 else -10).map(_.toShort)
    val bytes = Multimodal.encodeWavPcm16(s, 1000)
    val Some((rate, back)) = Multimodal.decodeWavPcm16(bytes)
    assert(rate == 1000 && back.length == 8)
    var sumSq = 0L; var crossings = 0
    back.indices.foreach { i =>
      sumSq += back(i).toLong * back(i)
      if (i > 0 && back(i) * back(i - 1) < 0) crossings += 1
    }
    assert(sumSq == 800L)     // 8 * 100
    assert(crossings == 7)    // strict alternation
  }

  test("aHash: stable on identity, near on a 1-px nudge, far on unrelated rasters") {
    val w = 20
    val base = Array.tabulate(w * w)(i => (i * 7) % 256)
    val bmp = Multimodal.encodeBmp(base, w, w)
    assert(Multimodal.averageHash(bmp) == Multimodal.averageHash(bmp.clone()))
    val nudged = base.clone(); nudged(0) = math.min(255, nudged(0) + 1)
    val dNear = java.lang.Long.bitCount(
      Multimodal.averageHash(bmp) ^
        Multimodal.averageHash(Multimodal.encodeBmp(nudged, w, w)))
    assert(dNear <= 3, s"1-px nudge moved $dNear bits")
    val other = Array.tabulate(w * w)(i => ((i / w) * 37 + i * 13) % 256)
    val dFar = java.lang.Long.bitCount(
      Multimodal.averageHash(bmp) ^
        Multimodal.averageHash(Multimodal.encodeBmp(other, w, w)))
    assert(dFar > 3, s"unrelated rasters landed $dFar bits apart")
  }

  test("audio fingerprint: stable, near on a 1-sample nudge, far on a different waveform") {
    val rate = 8000
    val saw = Array.tabulate(800)(i => ((i % 50) * 40 - 1000).toShort)
    val wav = Multimodal.encodeWavPcm16(saw, rate)
    assert(Multimodal.audioFingerprint(wav) == Multimodal.audioFingerprint(wav.clone()))
    val nudged = saw.clone(); nudged(0) = (nudged(0) + 1).toShort
    val dNear = java.lang.Long.bitCount(
      Multimodal.audioFingerprint(wav) ^
        Multimodal.audioFingerprint(Multimodal.encodeWavPcm16(nudged, rate)))
    assert(dNear <= 3, s"1-sample nudge moved $dNear bits")
    // rising ramp vs periodic sawtooth: opposite energy profile
    val ramp = Array.tabulate(800)(i => (i * 2 - 800).toShort)
    val dFar = java.lang.Long.bitCount(
      Multimodal.audioFingerprint(wav) ^
        Multimodal.audioFingerprint(Multimodal.encodeWavPcm16(ramp, rate)))
    assert(dFar > 3, s"unrelated waveforms landed $dFar bits apart")
  }

  test("banded audio near-dup recovers planted nudged twins") {
    import spark.implicits._
    val rate = 8000
    val items = (1L to 40L).map { id =>
      val n = 400 + (id % 7).toInt * 60
      val p = 30 + (id % 11).toInt * 4
      val samples = Array.tabulate(n)(i => (((i % p) * (20 + id % 9) - 500)).toShort)
      Multimodal.AudioItem(id, "audio",
        Multimodal.encodeWavPcm16(samples, rate), rate, n)
    }
    val probes = items.filter(_.doc_id % 4 == 0).map { a =>
      val (r, s) = Multimodal.decodeWavPcm16(a.data).get
      val s2 = s.clone(); s2(0) = (s2(0) + 1).toShort
      a.copy(doc_id = a.doc_id + 1000L, data = Multimodal.encodeWavPcm16(s2, r))
    }
    val got = Multimodal.audioNearDupPairs(
        spark.createDataset(items ++ probes), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probes.foreach { p =>
      assert(got.contains((p.doc_id - 1000L, p.doc_id)),
        s"planted pair for ${p.doc_id - 1000L} missed")
    }
  }

  test("banded image near-dup recovers every planted probe pair, no all-pairs join") {
    import spark.implicits._
    val items = (1L to 60L).map { id =>
      val px = Array.tabulate(144)(i => ((id * 31 + i * 17) % 256).toInt)
      Multimodal.MediaItem(id, "image", Multimodal.encodeBmp(px, 12, 12), 12, 12)
    }
    val probes = items.filter(_.doc_id % 5 == 0).map { m =>
      val px = Multimodal.decodeBmp(m.data).get._3
      val px2 = px.clone(); px2(1) = math.min(255, px2(1) + 1)
      m.copy(doc_id = m.doc_id + 1000L,
        data = Multimodal.encodeBmp(px2, 12, 12))
    }
    val ds = spark.createDataset(items ++ probes)
    val pairs = Multimodal.imageNearDupPairs(ds, maxHamming = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probes.foreach { p =>
      assert(got.contains((p.doc_id - 1000L, p.doc_id)),
        s"planted pair for ${p.doc_id - 1000L} missed")
    }
    // the plan generates candidates via the band join, not a cross product
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("pHash: DC exclusion makes a uniform brightness shift a zero-bit event") {
    val px = Array.tabulate(400)(i => 60 + ((i * 13) % 120))
    val bright = px.map(p => math.min(255, p + 20)) // no clipping: max 199
    val a = perceptualHash(encodeBmp(px, 20, 20))
    val b = perceptualHash(encodeBmp(bright, 20, 20))
    assert(a == b, "uniform brightness shift must land entirely in DC")
    assert((a & 1L) == 0L, "the DC bit is always clear")
  }

  test("pHash: contrast scaling flips (almost) no bits; unrelated rasters are far") {
    val px = Array.tabulate(400)(i => 40 + ((i * 29) % 150))
    val scaled = px.map(p => math.min(255, (p * 6) / 5)) // x1.2, max 227: no clip
    val a = perceptualHash(encodeBmp(px, 20, 20))
    val b = perceptualHash(encodeBmp(scaled, 20, 20))
    // integer scaling is not EXACTLY linear (floor), so allow a few bits
    assert(java.lang.Long.bitCount(a ^ b) <= 3,
      s"contrast scale moved ${java.lang.Long.bitCount(a ^ b)} bits")
    val other = Array.tabulate(400)(i => ((i * 97 + 31) % 256))
    val c = perceptualHash(encodeBmp(other, 20, 20))
    assert(java.lang.Long.bitCount(a ^ c) > 10, "unrelated rasters must differ")
  }

  test("pHash agrees across BMP and PNG encodings; dctLowband is deterministic") {
    val px = Array.tabulate(256)(i => (i * 53 + 7) % 256)
    val viaBmp = perceptualHash(encodeBmp(px, 16, 16))
    val viaPng = perceptualHash(encodePng(px, 16, 16))
    assert(viaBmp == viaPng, "lossless codecs must produce one hash")
    val c1 = dctLowband(encodePng(px, 16, 16)).toSeq
    val c2 = dctLowband(encodePng(px, 16, 16)).toSeq
    assert(c1 == c2)
    assert(c1.length == 64)
  }

  test("banded pHash near-dup recovers brightness-shifted probes, no all-pairs join") {
    import spark.implicits._
    val items = (1L to 40L).map { id =>
      val px = Array.tabulate(144)(i => (20 + (id * 31 + i * 17) % 200).toInt)
      Multimodal.MediaItem(id, "image", Multimodal.encodeBmp(px, 12, 12), 12, 12)
    }
    val probes = items.filter(_.doc_id % 5 == 0).map { m =>
      val px = Multimodal.decodeBmp(m.data).get._3
      m.copy(doc_id = m.doc_id + 1000L,
        data = Multimodal.encodeBmp(px.map(p => math.min(255, p + 20)), 12, 12))
    }
    val ds = spark.createDataset(items ++ probes)
    val pairs = Multimodal.imageNearDupPairsPhash(ds, maxHamming = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probes.foreach { p =>
      assert(got.contains((p.doc_id - 1000L, p.doc_id)),
        s"planted pHash pair for ${p.doc_id - 1000L} missed")
    }
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("video near-dup: reversed re-cuts match, disjoint content does not") {
    import spark.implicits._
    def vid(id: Long, seed: Int, frames: Int): Multimodal.VideoItem = {
      val fs = (0 until frames).map(f =>
        Array.tabulate(64)(i => (seed * 31 + f * 101 + i * 7) % 256))
      Multimodal.VideoItem(id, "video",
        encodeAviRawFrames(fs, 8, 8), 8, 8, frames)
    }
    val a = vid(1L, 5, 4)
    val reversed = {
      val (w, h, fs) = decodeAviFrames(a.data).get
      a.copy(doc_id = 2L, data = encodeAviRawFrames(fs.reverse, w, h))
    }
    val other = vid(3L, 77, 4)
    val pairs = Multimodal.videoNearDupPairs(
        spark.createDataset(Seq(a, reversed, other)), minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("SSIM factors: identity scores 1000, brightness dips luminance only, inversion flunks") {
    // driver-side recompute of the query's exact-integer factor formula
    def ssim(a: Array[Int], b: Array[Int]): Long = {
      val (sa, sb) = (a.map(_.toLong).sum, b.map(_.toLong).sum)
      val saa = a.map(x => x.toLong * x).sum
      val sbb = b.map(x => x.toLong * x).sum
      val sab = a.zip(b).map { case (x, y) => x.toLong * y }.sum
      val num1 = 200L * sa * sb + 2663424L
      val den1 = 100L * (sa * sa + sb * sb) + 2663424L
      val num2 = 100L * (128L * sab - 2L * sa * sb) + 23970816L
      val den2 = 100L * (64L * (saa + sbb) - sa * sa - sb * sb) + 23970816L
      math.floor(1000.0 * ((num1.toDouble / den1.toDouble) *
        (num2.toDouble / den2.toDouble))).toLong
    }
    val base = Array.tabulate(64)(i => 40 + (i * 37) % 160)
    assert(ssim(base, base) === 1000L)
    val bright = base.map(p => math.min(255, p + 10))
    val sBright = ssim(base, bright)
    assert(sBright >= 950L && sBright < 1000L, s"brightness twin: $sBright")
    val inverted = base.map(255 - _)
    assert(ssim(base, inverted) < 900L, s"inversion: ${ssim(base, inverted)}")
  }

  test("audio segments: a silence gap splits the clip; pure silence yields none") {
    import spark.implicits._
    // 6400 samples -> 64 frames of 100; frames 16..47 silenced
    val samples = Array.tabulate(6400) { i =>
      if (i >= 1600 && i < 4800) 0.toShort else ((i % 50) * 100 - 2500).toShort
    }
    val item = Multimodal.AudioItem(5L, "audio",
      Multimodal.encodeWavPcm16(samples, 8000), 8000, 6400)
    val silent = Multimodal.AudioItem(6L, "audio",
      Multimodal.encodeWavPcm16(Array.fill(6400)(0.toShort), 8000), 8000, 6400)
    val segs = Multimodal.audioSegments(
        Multimodal.audioEnergyRows(spark.createDataset(Seq(item, silent))))
      .orderBy("doc_id", "seg_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(segs === Seq((5L, 0L, 15L, 16L), (5L, 48L, 63L, 16L)),
      segs.toString)
  }

  test("shot boundaries: a hard cut is detected, a held shot is not") {
    import spark.implicits._
    // 3 frames of a left-bright pattern, then 3 of its inverse: the only
    // >= 16-bit hash jump is at the splice (frame 3). Constant shots
    // contribute zero boundaries.
    val left = Array.tabulate(64)(i => if (i % 8 < 4) 255 else 0)
    val right = left.map(255 - _)
    val fs = Seq.fill(3)(left) ++ Seq.fill(3)(right)
    val item = Multimodal.VideoItem(9L, "video",
      encodeAviRawFrames(fs, 8, 8), 8, 8, 6)
    val hashes = Multimodal.videoFrameHashes(spark.createDataset(Seq(item)))
    val cuts = Multimodal.shotBoundaries(hashes, minHamming = 16)
      .select("boundary_idx", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cuts.map(_._1) === Seq(3L), cuts.toString)
    assert(cuts.head._2 === 64L) // full inversion flips every aHash bit
  }

  test("video frame df cap drops ubiquitous frames (the all-black-frame guard)") {
    import spark.implicits._
    // every video shares one constant frame; content frames are unique
    val items = (1L to 10L).map { id =>
      val shared = Array.fill(64)(128)
      val unique = Array.tabulate(64)(i => ((id * 37 + i * 11) % 256).toInt)
      Multimodal.VideoItem(id, "video",
        encodeAviRawFrames(Seq(shared, unique), 8, 8), 8, 8, 2)
    }
    val hashes = Multimodal.videoFrameHashes(spark.createDataset(items))
    // with the cap below 10, the shared frame drops and nothing pairs
    assert(Multimodal.videoNearDupFromHashes(hashes, 1, maxDf = 4).count() == 0L)
    // with a generous cap, every pair shares exactly the one frame
    assert(Multimodal.videoNearDupFromHashes(hashes, 1, maxDf = 64).count() == 45L)
  }

  test("rasterAHash refactor preserves averageHash values") {
    val px = Array.tabulate(144)(i => (i * 37) % 256)
    assert(averageHash(encodeBmp(px, 12, 12)) == rasterAHash(px, 12, 12))
  }

  test("spectral peaks: exact bins for pure tones, amplitude-invariant") {
    val fs = 256
    def tone(bin: Int, amp: Double): Array[Short] =
      Array.tabulate(fs)(i =>
        (amp * StrictMath.sin(2.0 * StrictMath.PI * bin * i / fs)).toShort)
    val samples = tone(12, 9000) ++ tone(40, 9000) ++ tone(7, 9000)
    val wav = encodeWavPcm16(samples, 8000)
    val peaks = spectralPeaks(wav, frameSize = fs, hop = fs).toSeq
    assert(peaks == Seq((0, 12), (1, 40), (2, 7)))
    val half = encodeWavPcm16(samples.map(v => (v / 2).toShort), 8000)
    assert(spectralPeaks(half, frameSize = fs, hop = fs).toSeq == peaks,
      "peak bins must not move under amplitude scaling")
  }

  test("FFT peaks agree with the direct-DFT reference on random PCM") {
    val rnd = new scala.util.Random(42)
    val fs = 256
    val samples = Array.fill(4 * fs)((rnd.nextInt(16000) - 8000).toShort)
    val wav = encodeWavPcm16(samples, 8000)
    val viaFft = spectralPeaks(wav, frameSize = fs, hop = fs).toSeq
    val direct = (0 until 4).map(t => (t, directDftPeak(samples, t * fs, fs)))
    assert(viaFft == direct,
      "the radix-2 FFT must select the same argmax bins as the O(n^2) DFT")
  }

  test("landmark matching: aligned copies match, shifted copies still align, unrelated do not") {
    import spark.implicits._
    val fs = 256
    def melody(bins: Seq[Int]): Array[Byte] =
      encodeWavPcm16(bins.toArray.flatMap(b => Array.tabulate(fs)(i =>
        (9000.0 * StrictMath.sin(2.0 * StrictMath.PI * b * i / fs)).toShort)), 8000)
    val items = Seq(
      Multimodal.AudioItem(1L, "audio", melody(Seq(10, 20, 30, 40, 50, 60)), 8000, 6 * fs),
      // same melody at half volume
      Multimodal.AudioItem(2L, "audio",
        encodeWavPcm16(decodeWavPcm16(melody(Seq(10, 20, 30, 40, 50, 60))).get._2
          .map(v => (v / 2).toShort), 8000), 8000, 6 * fs),
      // the same melody delayed by one frame: offsets align at 1
      Multimodal.AudioItem(3L, "audio", melody(Seq(99, 10, 20, 30, 40, 50)), 8000, 6 * fs),
      // unrelated melody
      Multimodal.AudioItem(4L, "audio", melody(Seq(71, 83, 95, 107, 119, 13)), 8000, 6 * fs))
    val pairs = Multimodal.audioSpectralMatches(
      spark.createDataset(items), minVotes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "half-volume copy must match")
    assert(pairs.contains((1L, 3L)), "one-frame delay must still align votes")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated melody must not accumulate aligned votes")
  }

  test("incremental spectral matching replayed in id order equals the batch operator") {
    import spark.implicits._
    val fs = 256
    def melody(bins: Seq[Int]): Array[Byte] =
      encodeWavPcm16(bins.toArray.flatMap(b => Array.tabulate(fs)(i =>
        (9000.0 * StrictMath.sin(2.0 * StrictMath.PI * b * i / fs)).toShort)), 8000)
    def item(id: Long, bins: Seq[Int]) =
      Multimodal.AudioItem(id, "audio", melody(bins), 8000, bins.size * fs)
    val m1 = Seq(10, 20, 30, 40, 50, 60)
    val m2 = Seq(15, 25, 35, 45, 55, 65)
    // history: docs 1, 2; batch A: 11 (copy of 1), 12; batch B: 21 (copy
    // of 12 — only found if the index ACCUMULATES), 22
    val history = Seq(item(1L, m1), item(2L, m2))
    val batchA = Seq(item(11L, m1), item(12L, Seq(70, 80, 90, 100, 110, 120)))
    val batchB = Seq(item(21L, Seq(70, 80, 90, 100, 110, 120)), item(22L, Seq(9, 19, 29, 39, 49, 59)))
    def peaks(items: Seq[Multimodal.AudioItem]) =
      Multimodal.audioPeakTable(spark.createDataset(items), frameSize = fs, hop = fs)

    val idxDir = tempDir("audio-lm-idx")
    Multimodal.audioLandmarks(peaks(history))
      .write.mode("overwrite").parquet(idxDir)
    val streamed = Seq(batchA, batchB).flatMap { b =>
      val out = Multimodal.incrementalAudioMatches(
          peaks(b), spark.read.parquet(idxDir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      Multimodal.audioLandmarks(peaks(b))
        .write.mode("append").parquet(idxDir)
      out
    }
    val batchPairs = Multimodal.audioSpectralMatches(
        spark.createDataset(history ++ batchA ++ batchB))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 >= 11L).toSet
    assert(batchPairs == Set((1L, 11L), (12L, 21L)), s"batch found $batchPairs")
    assert(streamed.toSet == batchPairs,
      s"stream flagged ${streamed.toSet}, batch found $batchPairs")
  }

  test("landmark df cap drops ubiquitous landmarks instead of joining them") {
    import spark.implicits._
    // 12 docs all sharing one melody: with maxDf below 12 every landmark
    // is over-shared and the candidate join is EMPTY — the quadratic
    // blowup a df-capped posting list refuses to pay
    val fs = 256
    def melody(bins: Seq[Int]): Array[Byte] =
      encodeWavPcm16(bins.toArray.flatMap(b => Array.tabulate(fs)(i =>
        (9000.0 * StrictMath.sin(2.0 * StrictMath.PI * b * i / fs)).toShort)), 8000)
    val items = (1L to 12L).map(id =>
      Multimodal.AudioItem(id, "audio", melody(Seq(10, 20, 30, 40)), 8000, 4 * fs))
    val peaks = Multimodal.audioPeakTable(
      spark.createDataset(items), frameSize = fs, hop = fs)
    assert(Multimodal.audioLandmarkPairs(peaks, minVotes = 3, maxDf = 4).count() == 0L)
    assert(Multimodal.audioLandmarkPairs(peaks, minVotes = 3, maxDf = 64).count() == 66L)
  }
}
