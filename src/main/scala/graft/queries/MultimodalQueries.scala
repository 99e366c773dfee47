package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/**
 * Multimodal-column queries: binary payload metadata (oracle-checked — byte
 * lengths are engine-independent) and the decode feature pipeline over REAL
 * encoded images (documents wrapped as grayscale BMPs, decoded by the
 * pure-JVM codec in [[Multimodal]]; deterministic but not SQL-expressible
 * -> rows-only check + spec).
 */
object MultimodalQueries {

  /** Fixture exports for the `mm_*_neardup_verified` twins (SemDeDup
    * protocol: the perceptual-hash kernels — the non-SQL step — land in
    * parquet; both engines recompute the band join + hamming verify). */
  private[graft] val ImageHashFixturePath = graft.Fixtures.path("image_ahash")
  private[graft] val AudioHashFixturePath = graft.Fixtures.path("audio_fp")
  private[graft] val ThumbFixturePath = graft.Fixtures.path("thumbs")
  private[graft] val PhashFixturePath = graft.Fixtures.path("image_phash")
  private[graft] val AudioPeaksFixturePath = graft.Fixtures.path("audio_peaks")
  private[graft] val VideoHashFixturePath = graft.Fixtures.path("video_hashes")
  private[graft] val VideoShotsFixturePath = graft.Fixtures.path("video_shots")
  private[graft] val SsimThumbFixturePath = graft.Fixtures.path("ssim_thumbs")
  private[graft] val AudioEnergyFixturePath = graft.Fixtures.path("audio_energy")
  private[graft] val FrameFeatFixturePath = graft.Fixtures.path("frame_feats")

  /** The 16-term energy sum written out as a LEFT-ASSOCIATIVE chain —
    * SQL `+` associates left, so DuckDB adds in exactly graft_dot's loop
    * order; with each operand an exact float32 cast to double, the double
    * accumulation is bit-identical across engines (the playbook's
    * mirrored-associativity rule, applied to the featurize histogram). */
  private def energyChain(fv: String): String =
    (1 to 16).map(i => s"$fv[$i]*$fv[$i]").mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary-column metadata over the opaque payload
    "mm_meta" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
          pmod(octet_length(encode(col("text"), "UTF-8")), lit(251)).as("shard_bucket"))
        .orderBy("doc_id")
    }),

    // real BMP decode -> featurize pipeline; emits per-doc feature norms
    // (feature energy = graft_dot(f, f) — same fp sequence as the lambda
    // aggregate it replaces, one codegen node instead of a HOF chain).
    // FULLY oracle-checked since round 8: the oracle recomputes the 16-bin
    // histogram from the source text (byte == pixel, the mm_pixel_stats
    // bridge), the float32 normalization (correctly-rounded REAL division
    // in both engines), and the energy dot in graft_dot's exact
    // accumulation order (the left-associative 16-term chain).
    "mm_decode_features" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      val feats = Multimodal.featurize(Multimodal.documentsAsMedia(s, d))
      feats.toDF()
        .withColumn("f", col("features").cast("array<double>"))
        .select(col("doc_id"), col("feature_dim"),
          (floor(expr("graft_dot(f, f)") * 10000) / 10000).as("feature_energy"))
        .orderBy("doc_id")
    }),

    // video-shaped pipeline: sample every 4th 256-byte "frame", per-frame
    // decode (stub path — frames are byte blocks, not standalone BMPs) +
    // featurize, then per-doc frame stats — the fan-out happens inside the
    // task (flatMap), aggregation is the only shuffle
    "mm_frame_features" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      val frames = Multimodal.frameFeaturize(
        Multimodal.documentsAsMedia(s, d), frameSize = 256, everyK = 4)
      frames.toDF()
        .withColumn("f", col("features").cast("array<double>"))
        .select(col("doc_id"), col("frame_idx"),
          (floor(expr("graft_dot(f, f)") * 10000) / 10000).as("frame_energy"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          (floor(avg(col("frame_energy")) * 10000) / 10000).as("avg_frame_energy"))
        .orderBy("doc_id")
    }),

    // the ORACLE-CHECKED half of the frame pipeline: the sampled frames'
    // featurize outputs (the kernel) export as a fixture; energy scoring
    // (fixed-point, the 16-term ordered chain) and the per-doc aggregate
    // recompute in BOTH engines — integer outputs end to end, so the
    // aggregation layer is engine-independently proven while frame
    // sampling/decode stay on MultimodalSpec's bars.
    "mm_frame_features_verified" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      Multimodal.frameFeaturize(
          Multimodal.documentsAsMedia(s, d), frameSize = 256, everyK = 4)
        .toDF().select("doc_id", "frame_idx", "features")
        .write.mode("overwrite").parquet(FrameFeatFixturePath)
      s.read.parquet(FrameFeatFixturePath)
        .withColumn("f", col("features").cast("array<double>"))
        .select(col("doc_id"),
          floor(expr("graft_dot(f, f)") * 10000).cast("long").as("energy_fp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          sum("energy_fp").cast("long").as("energy_fp_sum"))
        .orderBy("doc_id")
    }),

    // ORACLE-CHECKED decode loop: per-doc stats over the REAL BMP-decoded
    // pixels (dims, count, sum, zeros, max). DuckDB computes the same stats
    // straight from the source text (ASCII corpus: byte == code point), so
    // the hash compare proves encode -> BMP -> decode reproduces the bytes
    // exactly — the decode step is no longer spec-only.
    "mm_pixel_stats" -> ((s, d) => {
      import s.implicits._
      Multimodal.documentsAsMedia(s, d)
        .map { item =>
          val (w, h, px) = Multimodal.decodeBmp(item.data).getOrElse(
            throw new IllegalStateException(s"doc ${item.doc_id}: payload is not a BMP"))
          var sum = 0L; var mx = 0; var zeros = 0L
          px.foreach { v => sum += v; if (v > mx) mx = v; if (v == 0) zeros += 1 }
          (item.doc_id, w, h, w.toLong * h, sum, zeros, mx)
        }
        .toDF("doc_id", "width", "height", "n_pixels", "sum_px", "n_zero", "max_px")
        .orderBy("doc_id")
    }),

    // color/tonal-distribution audit over the REAL decoded pixels: 16
    // intensity buckets per doc -> dominant bucket + share, distinct
    // buckets used, and the collision-diversity index 1 - Σ(c/n)² (the
    // log-free Simpson/Gini form of entropy — flat images score 0, the
    // image-quality gate's screen for blank/synthetic frames). ALL
    // integer: counts are exact, shares are floor-ppm, diversity is
    // 1e6 - Σc²·1e6 div n² — no transcendental whose last ulp could
    // differ between JVM and DuckDB. The oracle recomputes from the
    // source text (ASCII corpus: byte == code point), so the hash match
    // again proves the encode->BMP->decode loop bit-exact.
    "mm_image_colorhist" -> ((s, d) => {
      import s.implicits._
      Multimodal.documentsAsMedia(s, d)
        .map { item =>
          val (_, _, px) = Multimodal.decodeBmp(item.data).getOrElse(
            throw new IllegalStateException(s"doc ${item.doc_id}: payload is not a BMP"))
          val c = new Array[Long](16)
          px.foreach { v => c(v / 16) += 1 }
          val n = px.length.toLong
          val used = c.count(_ > 0).toLong
          val domIdx = c.indexOf(c.max).toLong // first max = lowest bucket
          val sumSq = c.map(x => x * x).sum
          // padded pixels (w*h - n bytes) are zeros in decodeBmp's raster;
          // count only real bytes: px here IS the padded raster, so the
          // zero bucket includes padding — stated, deterministic, and the
          // oracle models the same padded raster
          (item.doc_id, n, used, domIdx,
            c(domIdx.toInt) * 1000000L / n,
            1000000L - sumSq * 1000000L / (n * n))
        }
        .toDF("doc_id", "n_px", "buckets_used", "dom_bucket",
          "dom_share_ppm", "diversity_ppm")
        .orderBy("doc_id")
    }),

    // the COMPRESSED leg of the same oracle: documents wrapped as PNGs
    // (lossless), decoded through javax.imageio via the generic raster
    // router — the identical stats hash against the identical text-derived
    // oracle proves the compressed encode -> decode loop reproduces the
    // bytes exactly, so the web-crawl corpus shape (images arrive
    // JPEG/PNG, never BMP) runs on a REAL codec, not the stub
    "mm_pixel_stats_png" -> ((s, d) => {
      import s.implicits._
      Multimodal.documentsAsPngMedia(s, d)
        .map { item =>
          val (w, h, px) = Multimodal.decodeRaster(item.data).getOrElse(
            throw new IllegalStateException(s"doc ${item.doc_id}: payload is not decodable"))
          var sum = 0L; var mx = 0; var zeros = 0L
          px.foreach { v => sum += v; if (v > mx) mx = v; if (v == 0) zeros += 1 }
          (item.doc_id, w, h, w.toLong * h, sum, zeros, mx)
        }
        .toDF("doc_id", "width", "height", "n_pixels", "sum_px", "n_zero", "max_px")
        .orderBy("doc_id")
    }),

    // AUDIO modality end to end: each document becomes a REAL RIFF/WAVE
    // payload (deterministic integer-sawtooth PCM16 — integer math only, so
    // the oracle recomputes the exact samples), decoded and featurized per
    // partition. The DuckDB hash compare proves the encode → decode →
    // feature loop byte-exact: peak, zero crossings, integer duration, and
    // floor-scaled RMS all reconstruct from (doc_id, n_chars) alone.
    "mm_audio_features" -> ((s, d) => {
      Multimodal.audioFeaturize(Multimodal.documentsAsAudio(s, d))
        .toDF()
        .orderBy("doc_id")
    }),

    // VIDEO modality end to end: each document becomes a REAL multi-frame
    // RIFF/AVI (8-bpp raw-DIB frames), demuxed by the pure-JVM container
    // parser and featurized per frame. The DuckDB oracle recomputes every
    // frame's pixel sum from the text's byte slices, so the mux -> demux ->
    // per-frame-decode loop is hash-verified, not just spec'd.
    "mm_video_frames" -> ((s, d) => {
      import s.implicits._
      Multimodal.documentsAsVideo(s, d)
        .map { item =>
          val (w, h, frames) = Multimodal.decodeAviFrames(item.data).getOrElse(
            throw new IllegalStateException(s"doc ${item.doc_id}: payload is not AVI"))
          val sums = frames.map(px => px.map(_.toLong).sum)
          (item.doc_id, frames.length.toLong, w, h, sums.head, sums.max, sums.sum)
        }
        .toDF("doc_id", "n_frames", "width", "height",
          "first_frame_sum", "max_frame_sum", "total_sum")
        .orderBy("doc_id")
    }),

    // real BMP decode (true raster dims) -> nearest-neighbor resize to an
    // 8x8 thumbnail -> featurize; deterministic end to end. FULLY
    // oracle-checked since round 8: the resize is pure integer index
    // arithmetic (sy = y*h div 8, sx = x*w div 8, clamped), so the oracle
    // recomputes the 64 thumbnail pixels straight from the source text,
    // then the histogram/float32/ordered-chain recipe of
    // mm_decode_features (the /64 normalization is an exact float32).
    "mm_thumbnail_features" -> ((s, d) => {
      graft.expressions.GraftExtensions.register(s)
      val feats = Multimodal.thumbnailFeaturize(
        Multimodal.documentsAsMedia(s, d), side = 8)
      feats.toDF()
        .withColumn("f", col("features").cast("array<double>"))
        .select(col("doc_id"), col("feature_dim"),
          (floor(expr("graft_dot(f, f)") * 10000) / 10000).as("thumb_energy"))
        .orderBy("doc_id")
    }),

    // image near-dup by perceptual hash: every 10th doc's image gets a
    // lightly-perturbed probe twin (pixel 0 nudged +1), and the banded
    // aHash join must recover each (original, probe) pair within hamming
    // 3 — the visual dedup a crawl pipeline runs on figures/screenshots.
    // FULLY oracle-checked since round 8: aHash is integer end to end
    // (index-arithmetic resize, integer mean, threshold bits), so the
    // oracle recomputes hashes, 16-bit bands, the collision join, and
    // the bit_count hamming verify straight from the source text —
    // probes included. MultimodalSpec still pins hash stability and the
    // no-all-pairs plan shape.
    "mm_image_neardup" -> ((s, d) => {
      import s.implicits._
      // pin the synthesized corpus: `base.union(probes)` otherwise runs
      // the raster+encode map once for the base leg and AGAIN under the
      // probe derivation (no exchange to reuse across the union branches)
      val base = Multimodal.documentsAsMedia(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { m =>
        val px = Multimodal.decodeBmp(m.data).get._3
        // nudge one pixel: below-mean stays below (ascii letters ~97-122,
        // +1 keeps the 8x8 block means effectively unchanged)
        val px2 = px.clone(); px2(0) = math.min(255, px2(0) + 1)
        m.copy(doc_id = m.doc_id + 10000000L,
          data = Multimodal.encodeBmp(px2, m.width, m.height))
      }
      Multimodal.imageNearDupPairs(base.union(probes), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // audio near-dup by energy-profile fingerprint — same planted-probe
    // protocol and banded plan as mm_image_neardup, over the WAV corpus
    // (a one-sample amplitude nudge must stay within hamming 3; unrelated
    // waveforms must not band-collide their way in). FULLY oracle-checked
    // since round 8: the sawtooth samples, 64 frame energies, mean
    // threshold, bands, collision join, and hamming verify are integer
    // end to end, so the oracle recomputes the whole path from
    // (doc_id, n_chars) — the encode->WAV->decode loop is separately
    // hash-proven by mm_audio_features. Spec still covers stability,
    // recall, and the plan shape via the shared kernel.
    "mm_audio_neardup" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the synthesis otherwise
      val base = Multimodal.documentsAsAudio(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { a =>
        val (rate, samples) = Multimodal.decodeWavPcm16(a.data).get
        val s2 = samples.clone(); s2(0) = (s2(0) + 1).toShort
        a.copy(doc_id = a.doc_id + 10000000L,
          data = Multimodal.encodeWavPcm16(s2, rate))
      }
      Multimodal.audioNearDupPairs(base.union(probes), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // frequency-domain image near-dup (pHash): 32x32 DCT low band, AC
    // coefficients thresholded at their median, DC excluded — planted
    // probes carry a UNIFORM +20 brightness shift, which lands entirely
    // in the DC term and flips zero pHash bits (the invariance aHash
    // only gets because its mean shifts in lockstep). Same 4x16-band
    // pigeonhole join as mm_image_neardup; PNG corpus so the compressed
    // decode leg feeds the DCT. no_oracle; MultimodalSpec covers
    // invariance, recall, and the twin below hash-checks the downstream.
    "mm_image_phash" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the PNG encode otherwise
      val base = Multimodal.documentsAsPngMedia(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { m =>
        val (w, h, px) = Multimodal.decodeImageIO(m.data).get
        val px2 = px.map(p => math.min(255, p + 20))
        m.copy(doc_id = m.doc_id + 10000000L,
          data = Multimodal.encodePng(px2, w, h))
      }
      Multimodal.imageNearDupPairsPhash(base.union(probes), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // the ORACLE-CHECKED half of pHash: the DCT kernel (the non-SQL
    // step) exports its 1e4-fixed-point low-band coefficients, and BOTH
    // engines recompute the AC median, pack the EXACT perceptualHash bit
    // layout into one 64-bit value (bit i set iff c[i] > median, DC bit
    // clear), and run the production bandedHammingPairs downstream —
    // integer compares end to end. Packing to a LONG (instead of a
    // 64-char bit string) matters: a string-positional hamming HOF is
    // interpreted, and Catalyst pushes the <= 3 filter through the
    // distinct INTO the join residual, paying the HOF per band-collision
    // row (profiled 12.8 s at sf0.1); bit_count(xor) is codegen'd and
    // residual-safe (1.0 s).
    "mm_image_phash_verified" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the PNG encode otherwise
      val base = Multimodal.documentsAsPngMedia(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { m =>
        val (w, h, px) = Multimodal.decodeImageIO(m.data).get
        val px2 = px.map(p => math.min(255, p + 20))
        m.copy(doc_id = m.doc_id + 10000000L,
          data = Multimodal.encodePng(px2, w, h))
      }
      base.union(probes)
        .map(m => (m.doc_id, Multimodal.dctLowband(m.data)))
        .toDF("doc_id", "c")
        .write.mode("overwrite").parquet(PhashFixturePath)
      // localCheckpoint BEFORE the band fan-out: the pack aggregate is an
      // interpreted HOF, and CollapseProject would otherwise inline it
      // into the band keys, the join residual, and the distinct — profiled
      // 20.3 s of re-evaluation at sf0.1 vs 0.3 s materialized
      val hashes = s.read.parquet(PhashFixturePath)
        .withColumn("m", expr("element_at(array_sort(slice(c, 2, 63)), 32)"))
        .select(col("doc_id"), expr(
          "aggregate(sequence(1, 63), 0L, (acc, i) -> " +
            "acc + IF(element_at(c, i + 1) > m, shiftleft(1L, i), 0L))")
          .as("ahash"))
        .localCheckpoint(true)
      Multimodal.bandedHammingPairs(hashes, maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // video near-dup by shared frame content: per-frame aHash over the
    // real AVI demux, videos match on >= 2 coinciding DISTINCT frame
    // hashes — order-insensitive, so the planted probes are REVERSED
    // re-cuts (a sequence-keyed matcher would miss them). df-capped
    // hash join, id-only pair aggregate. no_oracle; the twin below
    // hash-checks the matching layer.
    "mm_video_neardup" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the AVI synthesis otherwise
      val base = Multimodal.documentsAsVideo(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { v =>
        val (w, h, frames) = Multimodal.decodeAviFrames(v.data).get
        v.copy(doc_id = v.doc_id + 10000000L,
          data = Multimodal.encodeAviRawFrames(frames.reverse, w, h))
      }
      Multimodal.videoNearDupPairs(base.union(probes), minShared = 2)
        .orderBy("doc_a", "doc_b")
    }),

    // the ORACLE-CHECKED half of video near-dup: the per-frame aHash
    // table (demux + hash, the non-SQL steps) exports, and BOTH engines
    // recompute the distinct, the df cap, the hash join, and the
    // shared-count threshold — 64-bit integer equality end to end.
    "mm_video_neardup_verified" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the AVI synthesis otherwise
      val base = Multimodal.documentsAsVideo(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { v =>
        val (w, h, frames) = Multimodal.decodeAviFrames(v.data).get
        v.copy(doc_id = v.doc_id + 10000000L,
          data = Multimodal.encodeAviRawFrames(frames.reverse, w, h))
      }
      Multimodal.videoFrameHashes(base.union(probes))
        .write.mode("overwrite").parquet(VideoHashFixturePath)
      Multimodal.videoNearDupFromHashes(
          s.read.parquet(VideoHashFixturePath), minShared = 2, maxDf = 64)
        .orderBy("doc_a", "doc_b")
    }),

    // activity segmentation on the per-frame energy table (the audio
    // twin of shot detection — the silence-trim/VAD-lite step): a frame
    // is active when 2*energy > the clip's integer mean, segments are
    // the maximal active runs via gaps-and-islands. Probes zero out the
    // middle third of every 10th clip, splitting its one natural segment
    // into two. Integer end to end after the decode kernel, so the
    // oracle recomputes every segment from the exported energies.
    "mm_audio_segments_verified" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the synthesis otherwise
      val base = Multimodal.documentsAsToneAudio(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { a =>
        val (rate, samples) = Multimodal.decodeWavPcm16(a.data).get
        val gapped = samples.zipWithIndex.map { case (v, i) =>
          if (i >= samples.length / 3 && i < 2 * samples.length / 3) 0.toShort
          else v
        }
        a.copy(doc_id = a.doc_id + 10000000L,
          data = Multimodal.encodeWavPcm16(gapped, rate))
      }
      Multimodal.audioEnergyRows(base.union(probes))
        .write.mode("overwrite").parquet(AudioEnergyFixturePath)
      Multimodal.audioSegments(s.read.parquet(AudioEnergyFixturePath))
        .orderBy("doc_id", "seg_start")
    }),

    // SSIM verify for image near-dup candidates (Wang et al., IEEE TIP
    // 2004, single-window form over the 8x8 thumbnail): candidates come
    // from 16-bit band collisions on the thumbnail's aHash bits, the
    // verify is the luminance x structure product. Everything after the
    // decode+resize kernel is arithmetic on the exported rasters: the
    // four SSIM factors are EXACT integers (the x100 scaling makes
    // C1 n^2 = 2663424 and C2 n^2 = 23970816 exact), each under 2^53 so
    // the int->double conversions are exact and the two divisions + one
    // multiply + floor are IEEE-identical in both engines. Probes are
    // +10-brightness twins: aHash bits don't move (every pixel and the
    // mean shift together) so candidates collide, and SSIM dips just
    // below 1000 through the luminance term — the graded-verdict readout
    // a binary hamming verify can't give.
    "mm_image_ssim_verified" -> ((s, d) => {
      import s.implicits._
      // pin the synthesized corpus: `base.union(probes)` otherwise runs
      // the raster+encode map once for the base leg and AGAIN under the
      // probe derivation (no exchange to reuse across the union branches)
      val base = Multimodal.documentsAsMedia(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { m =>
        val px = Multimodal.decodeBmp(m.data).get._3
        val px2 = px.map(p => math.min(255, p + 10))
        m.copy(doc_id = m.doc_id + 10000000L,
          data = Multimodal.encodeBmp(px2, m.width, m.height))
      }
      Multimodal.thumbnails(base.union(probes), side = 8)
        .write.mode("overwrite").parquet(SsimThumbFixturePath)
      val t = s.read.parquet(SsimThumbFixturePath)
        .withColumn("sa", expr("aggregate(thumb, 0L, (a, x) -> a + x)"))
        .withColumn("m", expr("sa div 64"))
        .withColumn("saa", expr("aggregate(thumb, 0L, (a, x) -> a + x * x)"))
        .localCheckpoint(true)
      val bands = t.select(col("doc_id"), explode(expr(
          "transform(sequence(0, 3), k -> struct(k AS band_idx, " +
            "aggregate(transform(slice(thumb, 16 * k + 1, 16), " +
            "(p, i) -> IF(p > m, shiftleft(1L, i), 0L)), 0L, (a, x) -> a + x) " +
            "AS band_val))")).as("b"))
        .select(col("doc_id"), col("b.band_idx"), col("b.band_val"))
      val rare = bands.groupBy("band_idx", "band_val")
        .agg(countDistinct("doc_id").as("df")).filter(col("df") <= 1000)
        .select("band_idx", "band_val")
      val capped = bands.join(rare, Seq("band_idx", "band_val"))
      val cand = capped.as("x").join(capped.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_val") === col("y.band_val") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(t.select(col("doc_id").as("doc_a"), col("thumb").as("tha"),
          col("sa").as("s_a"), col("saa").as("s_aa")), "doc_a")
        .join(t.select(col("doc_id").as("doc_b"), col("thumb").as("thb"),
          col("sa").as("s_b"), col("saa").as("s_bb")), "doc_b")
        .withColumn("sab",
          expr("aggregate(zip_with(tha, thb, (p, q) -> p * q), 0L, (a, x) -> a + x)"))
        .withColumn("num1", expr("200L * s_a * s_b + 2663424L"))
        .withColumn("den1", expr("100L * (s_a * s_a + s_b * s_b) + 2663424L"))
        .withColumn("num2", expr("100L * (128L * sab - 2L * s_a * s_b) + 23970816L"))
        .withColumn("den2",
          expr("100L * (64L * (s_aa + s_bb) - s_a * s_a - s_b * s_b) + 23970816L"))
        .withColumn("ssim_milli", floor(lit(1000.0) *
          ((col("num1").cast("double") / col("den1").cast("double")) *
            (col("num2").cast("double") / col("den2").cast("double")))).cast("long"))
        .filter(col("ssim_milli") >= 900)
        .select("doc_a", "doc_b", "ssim_milli")
        .orderBy("doc_a", "doc_b")
    }),

    // shot-boundary detection on the same per-frame hash fixture: a cut
    // is >= 16 changed aHash bits between consecutive frames — integer
    // xor/bit_count end to end, so BOTH engines recompute every boundary
    // from the exported hashes (demux + hash is the only non-SQL step)
    "mm_video_shots_verified" -> ((s, d) => {
      val base = Multimodal.documentsAsVideo(s, d)
      Multimodal.videoFrameHashes(base)
        .write.mode("overwrite").parquet(VideoShotsFixturePath)
      Multimodal.shotBoundaries(
          s.read.parquet(VideoShotsFixturePath), minHamming = 16)
        .orderBy("doc_id", "boundary_idx")
    }),

    // Shazam-style spectral matching (Wang, ISMIR 2003): per-frame DFT
    // peak -> (p1, p2, dt) landmark hashes -> aligned-offset voting; a
    // match needs >= 3 landmark hits agreeing on ONE time offset. Probes
    // are amplitude-HALVED copies — the argmax peak never moves under
    // scaling, the axis the energy-profile fingerprint is blind to.
    // no_oracle (the DFT is the non-SQL step); the twin below
    // hash-checks the entire landmark/vote downstream.
    "mm_audio_spectral" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the synthesis otherwise
      val base = Multimodal.documentsAsToneAudio(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { a =>
        val (rate, samples) = Multimodal.decodeWavPcm16(a.data).get
        val s2 = samples.map(v => (v / 2).toShort)
        a.copy(doc_id = a.doc_id + 10000000L,
          data = Multimodal.encodeWavPcm16(s2, rate))
      }
      Multimodal.audioLandmarkPairs(
          Multimodal.audioPeakTable(base.union(probes),
            frameSize = 256, hop = 256),
          minVotes = 3, maxDf = 64)
        .orderBy("doc_a", "doc_b")
    }),

    // the ORACLE-CHECKED half of the spectral matcher: the DFT peak
    // table (the non-SQL step) exports, and BOTH engines recompute
    // landmark hashing (pure integer arithmetic on (p1, p2, dt)), the
    // df cap, the hash join, and the aligned-offset vote — so the hash
    // match proves the entire matching layer engine-independently.
    "mm_audio_spectral_verified" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the synthesis otherwise
      val base = Multimodal.documentsAsToneAudio(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { a =>
        val (rate, samples) = Multimodal.decodeWavPcm16(a.data).get
        val s2 = samples.map(v => (v / 2).toShort)
        a.copy(doc_id = a.doc_id + 10000000L,
          data = Multimodal.encodeWavPcm16(s2, rate))
      }
      Multimodal.audioPeakTable(base.union(probes), frameSize = 256, hop = 256)
        .write.mode("overwrite").parquet(AudioPeaksFixturePath)
      Multimodal.audioLandmarkPairs(
          s.read.parquet(AudioPeaksFixturePath), minVotes = 3, maxDf = 64)
        .orderBy("doc_a", "doc_b")
    }),

    // the ORACLE-CHECKED half of the thumbnail pipeline: the resize
    // kernel's 8x8 integer rasters export, and BOTH engines recompute
    // integer pixel stats AND the aHash bit pattern (px > floor-mean,
    // emitted as a 64-char bit string — exact, no shift-overflow) from
    // the same pixels. This links the thumbnail family to the near-dup
    // family: the fixture is precisely averageHash's input.
    "mm_thumbnail_verified" -> ((s, d) => {
      Multimodal.thumbnails(Multimodal.documentsAsMedia(s, d), side = 8)
        .write.mode("overwrite").parquet(ThumbFixturePath)
      s.read.parquet(ThumbFixturePath)
        .withColumn("px_sum", expr("aggregate(thumb, 0L, (a, x) -> a + x)"))
        .withColumn("m", expr("px_sum div 64"))
        .select(col("doc_id"), col("px_sum"),
          expr("array_min(thumb)").as("px_min"),
          expr("array_max(thumb)").as("px_max"),
          expr("concat_ws('', transform(thumb, p -> IF(p > m, '1', '0')))")
            .as("bits"))
        .orderBy("doc_id")
    }),

    // the ORACLE-CHECKED half of image near-dup: the aHash kernel (the
    // non-SQL step — decode + 8x8 block means) exports as a fixture, and
    // BOTH engines recompute the 4x16-bit band candidate join + the
    // bit_count(xor) hamming verify from the same 64-bit values — integer
    // bit arithmetic end to end, same probe protocol as mm_image_neardup.
    "mm_image_neardup_verified" -> ((s, d) => {
      import s.implicits._
      // pin the synthesized corpus: `base.union(probes)` otherwise runs
      // the raster+encode map once for the base leg and AGAIN under the
      // probe derivation (no exchange to reuse across the union branches)
      val base = Multimodal.documentsAsMedia(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { m =>
        val px = Multimodal.decodeBmp(m.data).get._3
        val px2 = px.clone(); px2(0) = math.min(255, px2(0) + 1)
        m.copy(doc_id = m.doc_id + 10000000L,
          data = Multimodal.encodeBmp(px2, m.width, m.height))
      }
      Multimodal.imageHashes(base.union(probes)).toDF()
        .write.mode("overwrite").parquet(ImageHashFixturePath)
      Multimodal.bandedHammingPairs(s.read.parquet(ImageHashFixturePath), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // audio twin: the energy-profile fingerprint exports, the banded
    // hamming downstream recomputes in both engines
    "mm_audio_neardup_verified" -> ((s, d) => {
      import s.implicits._
      // pin: union(base, probes) double-executes the synthesis otherwise
      val base = Multimodal.documentsAsAudio(s, d).localCheckpoint(true)
      val probes = base.filter(_.doc_id % 10 == 0).map { a =>
        val (rate, samples) = Multimodal.decodeWavPcm16(a.data).get
        val s2 = samples.clone(); s2(0) = (s2(0) + 1).toShort
        a.copy(doc_id = a.doc_id + 10000000L,
          data = Multimodal.encodeWavPcm16(s2, rate))
      }
      Multimodal.audioHashes(base.union(probes)).toDF()
        .write.mode("overwrite").parquet(AudioHashFixturePath)
      Multimodal.bandedHammingPairs(s.read.parquet(AudioHashFixturePath), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }))

  /** Shared banded-hamming oracle over a (doc_id, ahash) fixture — the
    * DuckDB mirror of [[Multimodal.bandedHammingPairs]] (arithmetic >>
    * matches the JVM's; & 65535 masks the sign-fill either way). */
  private def hammingOracle(fixture: String): String =
    s"""WITH h AS (SELECT * FROM read_parquet('$fixture/*.parquet')),
      |b AS (
      |  SELECT doc_id, ahash, g.band_idx,
      |         (ahash >> (16 * g.band_idx)) & 65535 AS band_val
      |  FROM h, (SELECT unnest(generate_series(0, 3)) AS band_idx) g)
      |SELECT doc_a, doc_b, hamming FROM (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |    CAST(bit_count(xor(x.ahash, y.ahash)) AS INTEGER) AS hamming
      |  FROM b x JOIN b y ON x.band_idx = y.band_idx
      |    AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
      |WHERE hamming <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    // recompute integer pixel stats + the aHash bit pattern from the
    // exported thumbnails
    "mm_thumbnail_verified" ->
      s"""WITH t AS (SELECT * FROM read_parquet('$ThumbFixturePath/*.parquet')),
        |m AS (
        |  SELECT doc_id, thumb, CAST(list_sum(thumb) AS BIGINT) AS px_sum,
        |         CAST(list_sum(thumb) AS BIGINT) // 64 AS mean
        |  FROM t)
        |SELECT doc_id, px_sum,
        |  CAST(list_min(thumb) AS INTEGER) AS px_min,
        |  CAST(list_max(thumb) AS INTEGER) AS px_max,
        |  array_to_string([CASE WHEN p > mean THEN '1' ELSE '0' END FOR p IN thumb], '') AS bits
        |FROM m ORDER BY doc_id""".stripMargin,

    "mm_image_neardup_verified" -> hammingOracle(ImageHashFixturePath),
    "mm_audio_neardup_verified" -> hammingOracle(AudioHashFixturePath),

    // recompute distinct + df cap + hash join + shared-count threshold
    // from the exported per-frame aHash table
    "mm_video_neardup_verified" ->
      s"""WITH f AS (
        |  SELECT DISTINCT doc_id, ahash
        |  FROM read_parquet('$VideoHashFixturePath/*.parquet')),
        |rare AS (
        |  SELECT ahash FROM f GROUP BY ahash
        |  HAVING COUNT(DISTINCT doc_id) <= 64),
        |c AS (SELECT f.* FROM f JOIN rare USING (ahash))
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS shared
        |FROM c x JOIN c y ON x.ahash = y.ahash AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    // recompute mean, activity threshold, and gaps-and-islands segments
    // from the exported per-frame energies — integer end to end
    "mm_audio_segments_verified" ->
      s"""WITH e AS (
        |  SELECT doc_id, frame_idx, energy
        |  FROM read_parquet('$AudioEnergyFixturePath/*.parquet')),
        |m AS (
        |  SELECT doc_id, SUM(energy) // COUNT(*) AS mean FROM e GROUP BY 1),
        |act AS (
        |  SELECT e.doc_id, frame_idx,
        |    frame_idx - ROW_NUMBER() OVER (
        |      PARTITION BY e.doc_id ORDER BY frame_idx) AS island
        |  FROM e JOIN m ON m.doc_id = e.doc_id
        |  WHERE energy * 2 > mean)
        |SELECT doc_id, CAST(MIN(frame_idx) AS BIGINT) AS seg_start,
        |  CAST(MAX(frame_idx) AS BIGINT) AS seg_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames
        |FROM act GROUP BY doc_id, island
        |ORDER BY doc_id, seg_start""".stripMargin,

    // recompute bands, candidate collisions, and the four exact SSIM
    // factors from the exported rasters; the final two divisions + one
    // multiply + floor are IEEE-identical (every integer input < 2^53)
    "mm_image_ssim_verified" ->
      s"""WITH t AS MATERIALIZED (
        |  SELECT doc_id, thumb,
        |    CAST(list_sum(thumb) AS BIGINT) AS sa,
        |    CAST(list_sum(thumb) AS BIGINT) // 64 AS m,
        |    CAST(list_sum([p * p FOR p IN thumb]) AS BIGINT) AS saa
        |  FROM read_parquet('$SsimThumbFixturePath/*.parquet')
        |), bands AS MATERIALIZED (
        |  SELECT doc_id, k AS band_idx,
        |    CAST(list_sum([CASE WHEN thumb[16 * k + i + 1] > m
        |      THEN 1 << i ELSE 0 END
        |      FOR i IN generate_series(0, 15)]) AS BIGINT) AS band_val
        |  FROM t, generate_series(0, 3) AS g(k)
        |), rare AS (
        |  SELECT band_idx, band_val FROM bands
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT doc_id) <= 1000
        |), capped AS (
        |  SELECT b.* FROM bands b JOIN rare USING (band_idx, band_val)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM capped x JOIN capped y
        |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
        |   AND x.doc_id < y.doc_id
        |), scored AS (
        |  SELECT doc_a, doc_b,
        |    200 * a.sa * b.sa + 2663424 AS num1,
        |    100 * (a.sa * a.sa + b.sa * b.sa) + 2663424 AS den1,
        |    100 * (128 * CAST(list_sum([a.thumb[i] * b.thumb[i]
        |        FOR i IN generate_series(1, 64)]) AS BIGINT)
        |      - 2 * a.sa * b.sa) + 23970816 AS num2,
        |    100 * (64 * (a.saa + b.saa) - a.sa * a.sa - b.sa * b.sa)
        |      + 23970816 AS den2
        |  FROM cand JOIN t a ON a.doc_id = doc_a JOIN t b ON b.doc_id = doc_b
        |)
        |SELECT doc_a, doc_b,
        |  CAST(FLOOR(1000 * ((CAST(num1 AS DOUBLE) / CAST(den1 AS DOUBLE))
        |    * (CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE)))) AS BIGINT) AS ssim_milli
        |FROM scored
        |WHERE FLOOR(1000 * ((CAST(num1 AS DOUBLE) / CAST(den1 AS DOUBLE))
        |    * (CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE)))) >= 900
        |ORDER BY doc_a, doc_b""".stripMargin,

    // recompute every shot boundary from the exported frame hashes:
    // LAG over frame order, xor, bit_count, threshold
    "mm_video_shots_verified" ->
      s"""WITH f AS (
        |  SELECT doc_id, frame_idx, ahash
        |  FROM read_parquet('$VideoShotsFixturePath/*.parquet')),
        |lagged AS (
        |  SELECT doc_id, frame_idx, ahash,
        |    LAG(ahash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS boundary_idx,
        |  CAST(bit_count(xor(ahash, prev)) AS BIGINT) AS hamming
        |FROM lagged
        |WHERE prev IS NOT NULL AND bit_count(xor(ahash, prev)) >= 16
        |ORDER BY doc_id, boundary_idx""".stripMargin,

    // recompute landmark hashes, df cap, hash join, and aligned-offset
    // vote from the exported DFT peak table — integer end to end
    "mm_audio_spectral_verified" ->
      s"""WITH p AS (SELECT * FROM read_parquet('$AudioPeaksFixturePath/*.parquet')),
        |lm AS (
        |  SELECT a.doc_id, (a.p * 128 + b.p) * 4 + d.delta AS h, a.t
        |  FROM p a JOIN p b ON b.doc_id = a.doc_id
        |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS delta) d
        |  WHERE b.t = a.t + d.delta),
        |rare AS (SELECT h FROM lm GROUP BY h HAVING COUNT(DISTINCT doc_id) <= 64),
        |c AS (SELECT lm.* FROM lm JOIN rare USING (h)),
        |v AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.t - y.t AS toff,
        |         COUNT(*) AS votes
        |  FROM c x JOIN c y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2, 3)
        |SELECT doc_a, doc_b, MAX(votes) AS votes FROM v
        |GROUP BY 1, 2 HAVING MAX(votes) >= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // recompute AC median -> packed 64-bit perceptualHash layout -> the
    // shared banded bit_count(xor) downstream from the exported DCT
    // coefficients (list_sum runs in HUGEINT, so the bit-63 negative
    // term sums exactly; the final value fits BIGINT by construction)
    "mm_image_phash_verified" ->
      s"""WITH f AS (SELECT * FROM read_parquet('$PhashFixturePath/*.parquet')),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(
        |      [CASE WHEN c[i + 1] > list_sort(c[2:64])[32]
        |            THEN CASE WHEN i = 63 THEN (-9223372036854775807::BIGINT - 1)
        |                 ELSE (1::BIGINT << i) END
        |            ELSE 0::BIGINT END
        |       FOR i IN generate_series(1, 63)]) AS BIGINT) AS ahash
        |  FROM f),
        |b AS (
        |  SELECT doc_id, ahash, g.band_idx,
        |         (ahash >> (16 * g.band_idx)) & 65535 AS band_val
        |  FROM h, (SELECT unnest(generate_series(0, 3)) AS band_idx) g)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    CAST(bit_count(xor(x.ahash, y.ahash)) AS INTEGER) AS hamming
        |  FROM b x JOIN b y ON x.band_idx = y.band_idx
        |    AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
        |WHERE hamming <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       octet_length(encode(text)) % 251 AS shard_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mirrors the audio fixture: n = 400 + doc_id % 400 sawtooth samples of
    // period p = 50 + doc_id % 50 and even amplitude amp = 2*(500 + n_chars
    // % 4500); s_i = (amp * (i % p)) // p - amp // 2 — all non-negative
    // integer division, so DuckDB's floor `//` reproduces the engine's
    // samples bit-for-bit and the features hash-match
    "mm_audio_features" ->
      """WITH params AS (
        |  SELECT doc_id,
        |    400 + doc_id % 400 AS n,
        |    50 + doc_id % 50 AS p,
        |    2 * (500 + n_chars % 4500) AS amp
        |  FROM documents),
        |wave AS (
        |  SELECT doc_id, n,
        |    [ (amp * (i % p)) // p - amp // 2
        |      FOR i IN generate_series(0, CAST(n - 1 AS BIGINT)) ] AS vs
        |  FROM params)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
        |  CAST(list_max(list_transform(vs, x -> abs(x))) AS BIGINT) AS peak,
        |  CAST(COALESCE(list_sum(
        |    [ CASE WHEN vs[i] * vs[i + 1] < 0 THEN 1 ELSE 0 END
        |      FOR i IN generate_series(1, CAST(n - 1 AS BIGINT)) ]), 0) AS BIGINT)
        |    AS zero_crossings,
        |  FLOOR(SQRT(CAST(list_sum(list_transform(vs, x -> x * x)) AS DOUBLE) / n) * 100) / 100
        |    AS rms
        |FROM wave ORDER BY doc_id""".stripMargin,

    // mirrors the video fixture: F = 2 + doc_id % 4 frames over byte slices
    // of length L = ceil(n / F) (zero-padded) — each decoded frame's pixel
    // sum equals its byte-slice sum, recomputed here via list slicing
    "mm_video_frames" ->
      """WITH p AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    CAST(2 + doc_id % 4 AS INTEGER) AS f
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n, f, GREATEST((n + f - 1) // f, 1) AS l FROM p),
        |r AS (
        |  SELECT doc_id, n, f, l,
        |    GREATEST(CAST(ceil(sqrt(CAST(l AS DOUBLE))) AS INTEGER), 1) AS w
        |  FROM q),
        |s AS (
        |  SELECT doc_id, n, f, l, w,
        |    CAST(ceil(CAST(l AS DOUBLE) / w) AS INTEGER) AS h
        |  FROM r),
        |fs AS (
        |  SELECT s.doc_id, f, w, h,
        |    [ CAST(COALESCE(list_sum(bl[fi * l + 1 : least((fi + 1) * l, n)]), 0) AS BIGINT)
        |      FOR fi IN generate_series(0, CAST(f - 1 AS BIGINT)) ] AS sums
        |  FROM s JOIN (
        |    SELECT doc_id,
        |      [ unicode(text[i]) FOR i IN generate_series(1, octet_length(encode(text))) ] AS bl
        |    FROM documents) b USING (doc_id))
        |SELECT doc_id, CAST(f AS BIGINT) AS n_frames, w AS width, h AS height,
        |  sums[1] AS first_frame_sum,
        |  CAST(list_max(sums) AS BIGINT) AS max_frame_sum,
        |  CAST(list_sum(sums) AS BIGINT) AS total_sum
        |FROM fs ORDER BY doc_id""".stripMargin,

    // mirrors the fixture raster: w = ceil(sqrt(bytes)), h = ceil(bytes/w),
    // pixels = byte values + zero padding (corpus is ASCII, so bytes are
    // unicode code points; GREATEST/COALESCE guard the empty-text edge the
    // engine handles with a 1x1 zero raster)
    // the PNG leg recomputes the SAME stats from the SAME text bytes —
    // lossless compression means the oracle is literally the BMP one
    "mm_pixel_stats_png" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    GREATEST(CAST(ceil(sqrt(GREATEST(octet_length(encode(text)), 1))) AS INTEGER), 1) AS w
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, n, w,
        |    GREATEST(CAST(ceil(CAST(n AS DOUBLE) / w) AS INTEGER), 1) AS h
        |  FROM b)
        |SELECT d.doc_id, w AS width, h AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(COALESCE(list_sum([unicode(t.text[i]) FOR i IN generate_series(1, n)]), 0) AS BIGINT) AS sum_px,
        |  CAST(w * h - n AS BIGINT) AS n_zero,
        |  CAST(COALESCE(list_max([unicode(t.text[i]) FOR i IN generate_series(1, n)]), 0) AS INTEGER) AS max_px
        |FROM d JOIN documents t USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // same padded raster model as mm_pixel_stats (padding zeros land in
    // bucket 0), histogram recomputed from the source text bytes
    "mm_image_colorhist" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n0,
        |    GREATEST(CAST(ceil(sqrt(GREATEST(octet_length(encode(text)), 1))) AS INTEGER), 1) AS w
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, n0, w,
        |    GREATEST(CAST(ceil(CAST(n0 AS DOUBLE) / w) AS INTEGER), 1) AS h
        |  FROM b
        |), lst AS (
        |  SELECT d.doc_id,
        |    [unicode(t.text[i]) // 16 FOR i IN generate_series(1, n0)] ||
        |    [0 FOR i IN generate_series(1, w * h - n0)] AS bkts
        |  FROM d JOIN documents t USING (doc_id)
        |), px AS (
        |  SELECT doc_id, unnest(bkts) AS bkt FROM lst
        |), cnt AS (
        |  SELECT doc_id, bkt, CAST(COUNT(*) AS BIGINT) AS c FROM px GROUP BY 1, 2
        |), ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, bkt) AS rk
        |  FROM cnt
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS buckets_used,
        |    CAST(SUM(c * c) AS BIGINT) AS sumsq
        |  FROM cnt GROUP BY 1)
        |SELECT a.doc_id, a.n AS n_px, a.buckets_used,
        |  CAST(r.bkt AS BIGINT) AS dom_bucket,
        |  CAST(r.c * 1000000 // a.n AS BIGINT) AS dom_share_ppm,
        |  CAST(1000000 - a.sumsq * 1000000 // (a.n * a.n) AS BIGINT) AS diversity_ppm
        |FROM agg a JOIN ranked r ON r.doc_id = a.doc_id AND r.rk = 1
        |ORDER BY a.doc_id""".stripMargin,

    "mm_pixel_stats" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    GREATEST(CAST(ceil(sqrt(GREATEST(octet_length(encode(text)), 1))) AS INTEGER), 1) AS w
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, n, w,
        |    GREATEST(CAST(ceil(CAST(n AS DOUBLE) / w) AS INTEGER), 1) AS h
        |  FROM b)
        |SELECT d.doc_id, w AS width, h AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(COALESCE(list_sum([unicode(t.text[i]) FOR i IN generate_series(1, n)]), 0) AS BIGINT) AS sum_px,
        |  CAST(w * h - n AS BIGINT) AS n_zero,
        |  CAST(COALESCE(list_max([unicode(t.text[i]) FOR i IN generate_series(1, n)]), 0) AS INTEGER) AS max_px
        |FROM d JOIN documents t USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // full recompute of decode -> featurize -> energy from the source
    // text: pixel histogram (bytes + zero padding), float32-normalized
    // bins, the ordered 16-term double chain, 1e-4 floor
    "mm_decode_features" ->
      s"""WITH b AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS nb,
        |    GREATEST(CAST(ceil(sqrt(GREATEST(octet_length(encode(text)), 1))) AS INTEGER), 1) AS w
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, text, nb, w,
        |    GREATEST(CAST(ceil(CAST(nb AS DOUBLE) / w) AS INTEGER), 1) AS h
        |  FROM b
        |), hc AS (
        |  SELECT doc_id, w * h AS np,
        |    [len(list_filter([unicode(text[i]) FOR i IN generate_series(1, nb)],
        |                     p -> p // 16 = bin))
        |       + CASE WHEN bin = 0 THEN w * h - nb ELSE 0 END
        |     FOR bin IN generate_series(0, 15)] AS c
        |  FROM d
        |), f AS (
        |  SELECT doc_id,
        |    [CAST(CAST(c[i] AS REAL) / CAST(np AS REAL) AS DOUBLE)
        |     FOR i IN generate_series(1, 16)] AS fv
        |  FROM hc
        |)
        |SELECT doc_id, CAST(16 AS INTEGER) AS feature_dim,
        |  FLOOR((${energyChain("fv")}) * 10000) / 10000 AS feature_energy
        |FROM f ORDER BY doc_id""".stripMargin,

    // full recompute of the audio energy-fingerprint near-dup from
    // (doc_id, n_chars): sawtooth samples (probe rows nudge sample 0),
    // 64 integer frame energies, mean-threshold band values, collision
    // join, bit_count hamming
    "mm_audio_neardup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, doc_id AS orig_id, n_chars, FALSE AS is_probe FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, doc_id, n_chars, TRUE FROM documents WHERE doc_id % 10 = 0
        |), pr AS (
        |  SELECT doc_id,
        |    CAST(400 + orig_id % 400 AS BIGINT) AS n,
        |    CAST(50 + orig_id % 50 AS BIGINT) AS p,
        |    CAST(2 * (500 + n_chars % 4500) AS BIGINT) AS amp,
        |    is_probe
        |  FROM all_docs
        |), sm AS (
        |  SELECT doc_id, n,
        |    [(amp * (i % p)) // p - amp // 2
        |       + CASE WHEN i = 0 AND is_probe THEN 1 ELSE 0 END
        |     FOR i IN generate_series(0, CAST(n - 1 AS INTEGER))] AS sl
        |  FROM pr
        |), en AS (
        |  SELECT doc_id,
        |    [CASE WHEN (f + 1) * n // 64 <= f * n // 64 THEN CAST(0 AS BIGINT)
        |          ELSE CAST(list_sum([abs(x) FOR x IN
        |                 sl[CAST(f * n // 64 + 1 AS INTEGER):CAST((f + 1) * n // 64 AS INTEGER)]]) AS BIGINT)
        |               // ((f + 1) * n // 64 - f * n // 64) END
        |     FOR f IN generate_series(0, 63)] AS eg
        |  FROM sm
        |), hs AS (
        |  SELECT doc_id,
        |    [CAST(list_sum([CASE WHEN eg[16 * bi + j + 1] > CAST(list_sum(eg) AS BIGINT) // 64
        |                         THEN CAST(1 << j AS BIGINT) ELSE 0 END
        |                    FOR j IN generate_series(0, 15)]) AS BIGINT)
        |     FOR bi IN generate_series(0, 3)] AS bv
        |  FROM en
        |), bands AS (
        |  SELECT doc_id, bv, bi AS band_idx, bv[bi + 1] AS band_val
        |  FROM hs, generate_series(0, 3) AS g(bi)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.bv AS bva, y.bv AS bvb
        |  FROM bands x JOIN bands y
        |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc_id < y.doc_id
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(bit_count(xor(bva[1], bvb[1])) + bit_count(xor(bva[2], bvb[2]))
        |       + bit_count(xor(bva[3], bvb[3])) + bit_count(xor(bva[4], bvb[4])) AS BIGINT) AS hamming
        |  FROM cand)
        |WHERE hamming <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // full recompute of the banded aHash near-dup from the source text:
    // thumbnail pixels (probe rows nudge pixel 0 by +1, clamped), integer
    // mean threshold bits as four 16-bit band values, band-collision
    // join, bit_count hamming over the band xors
    "mm_image_neardup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, FALSE AS is_probe FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, TRUE FROM documents WHERE doc_id % 10 = 0
        |), b AS (
        |  SELECT doc_id, text, is_probe, octet_length(encode(text)) AS nb,
        |    GREATEST(CAST(ceil(sqrt(GREATEST(octet_length(encode(text)), 1))) AS INTEGER), 1) AS w
        |  FROM all_docs
        |), d AS (
        |  SELECT doc_id, text, is_probe, nb, w,
        |    GREATEST(CAST(ceil(CAST(nb AS DOUBLE) / w) AS INTEGER), 1) AS h
        |  FROM b
        |), th AS (
        |  SELECT doc_id,
        |    [CASE WHEN ix = 0 AND is_probe THEN
        |        LEAST(255, (CASE WHEN ix < nb THEN unicode(text[ix + 1]) ELSE 0 END) + 1)
        |      WHEN ix < nb THEN unicode(text[ix + 1]) ELSE 0 END
        |     FOR ix IN [LEAST(w * h - 1, ((t // 8) * h // 8) * w + ((t % 8) * w // 8))
        |                FOR t IN generate_series(0, 63)]] AS tp
        |  FROM d
        |), hs AS (
        |  SELECT doc_id,
        |    [CAST(list_sum([CASE WHEN tp[16 * bi + j + 1] > CAST(list_sum(tp) AS BIGINT) // 64
        |                         THEN CAST(1 << j AS BIGINT) ELSE 0 END
        |                    FOR j IN generate_series(0, 15)]) AS BIGINT)
        |     FOR bi IN generate_series(0, 3)] AS bv
        |  FROM th
        |), bands AS (
        |  SELECT doc_id, bv, bi AS band_idx, bv[bi + 1] AS band_val
        |  FROM hs, generate_series(0, 3) AS g(bi)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.bv AS bva, y.bv AS bvb
        |  FROM bands x JOIN bands y
        |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc_id < y.doc_id
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(bit_count(xor(bva[1], bvb[1])) + bit_count(xor(bva[2], bvb[2]))
        |       + bit_count(xor(bva[3], bvb[3])) + bit_count(xor(bva[4], bvb[4])) AS BIGINT) AS hamming
        |  FROM cand)
        |WHERE hamming <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // full recompute of decode -> 8x8 nearest-neighbor resize ->
    // featurize -> energy from the source text: the 64 thumb pixels are
    // integer index reads over the byte raster, then the
    // mm_decode_features recipe at a fixed n=64
    "mm_thumbnail_features" ->
      s"""WITH b AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS nb,
        |    GREATEST(CAST(ceil(sqrt(GREATEST(octet_length(encode(text)), 1))) AS INTEGER), 1) AS w
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, text, nb, w,
        |    GREATEST(CAST(ceil(CAST(nb AS DOUBLE) / w) AS INTEGER), 1) AS h
        |  FROM b
        |), th AS (
        |  SELECT doc_id,
        |    [CASE WHEN ix < nb THEN unicode(text[ix + 1]) ELSE 0 END
        |     FOR ix IN [LEAST(w * h - 1, ((t // 8) * h // 8) * w + ((t % 8) * w // 8))
        |                FOR t IN generate_series(0, 63)]] AS tp
        |  FROM d
        |), hc AS (
        |  SELECT doc_id,
        |    [len(list_filter(tp, p -> p // 16 = bin)) FOR bin IN generate_series(0, 15)] AS c
        |  FROM th
        |), f AS (
        |  SELECT doc_id,
        |    [CAST(CAST(c[i] AS REAL) / CAST(64 AS REAL) AS DOUBLE)
        |     FOR i IN generate_series(1, 16)] AS fv
        |  FROM hc
        |)
        |SELECT doc_id, CAST(16 AS INTEGER) AS feature_dim,
        |  FLOOR((${energyChain("fv")}) * 10000) / 10000 AS thumb_energy
        |FROM f ORDER BY doc_id""".stripMargin,

    // recompute energy + per-doc aggregate from the exported frame
    // features: same ordered chain, fixed-point BIGINT outputs
    "mm_frame_features_verified" ->
      s"""WITH ff AS (SELECT * FROM read_parquet('$FrameFeatFixturePath/*.parquet')),
        |e AS (
        |  SELECT doc_id,
        |    CAST(FLOOR((${energyChain("fv")}) * 10000) AS BIGINT) AS energy_fp
        |  FROM (
        |    SELECT doc_id,
        |      [CAST(features[i] AS DOUBLE) FOR i IN generate_series(1, 16)] AS fv
        |    FROM ff)
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(energy_fp) AS BIGINT) AS energy_fp_sum
        |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
