package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by
  * partition-batched transforms.
  *
  * Container METADATA is real: [[imageHeaderMeta]] parses PNG/JPEG/GIF/
  * BMP headers natively from the payload bytes
  * ([[graft.functions.ImageMetaExpr]] — codegen'd, no codec library).
  * PIXEL decode is real for PNG ([[PngCodec]] — 8-bit gray/RGB/palette
  * via java.util.zip, all five scanline filters), GIF ([[GifCodec]] —
  * LZW + palette expansion, interlaced or not), and baseline JPEG
  * ([[JpegCodec]] — Huffman + dequant + IDCT; grayscale, 4:4:4, 4:2:0,
  * restart markers). Audio decodes, resamples, and fingerprints for
  * real through [[PcmCodec]]; image downscaling ([[downscaleImages]])
  * and MJPEG video frame extraction ([[mjpegFrames]]) are real too.
  * What this build cannot do honestly (progressive JPEG, inter-frame
  * video codecs) remains a clearly-marked deterministic STUB
  * ([[StubCodec]]), the fallback when the real codecs decline a
  * payload.
  * Everything around the codec is real and tested: schema,
  * null/short-payload handling, batch shape (fixed-size record batches
  * per partition, the JVM analog of an Arrow-batched pandas UDF), and
  * the feature-extraction contract.
  *
  * Scale design: payload bytes never shuffle — transforms are narrow
  * mapPartitions; only extracted features (KB per row → bytes per row)
  * flow into joins/aggregations downstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class MediaMeta(source: String, width: Option[Int],
                             height: Option[Int], duration_ms: Option[Long])
  final case class MediaRow(media_id: Long, mime: String,
                            content: Array[Byte], meta: MediaMeta)
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 n_bytes: Long, brightness: Double,
                                 histogram: Array[Double])
  final case class FrameSample(media_id: Long, frame_idx: Int, frame_ms: Long,
                               frame: Array[Byte])
  final case class AudioFeatures(media_id: Long, format: String,
                                 channels: Int, sample_rate: Int,
                                 n_samples: Long, peak_abs: Int,
                                 sum_amp: Long, sum_sq: Long,
                                 mean_amp: Double, rms: Double)

  /** STUB CODEC — deterministic fakes standing in for native decoders.
    * Every output is a pure function of the payload bytes so tests are
    * exact and re-runs are idempotent. Swap for a real codec (e.g. via
    * JNI/ImageIO) without touching the pipeline plumbing. */
  object StubCodec {
    /** "Decode" an image: dimensions and pixels derived from the payload's
      * md5 digest — NOT a JVM-private hash — so any engine that can md5
      * reproduces the exact fake (the q50 oracle recomputes width/height/
      * brightness from `md5(text)` in SQL). Width = first 4 digest bytes
      * (big-endian, matching the hex prefix) mod 64; pixels = the 16
      * digest bytes. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val head = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      val w = 1 + (head % 64).toInt
      val h = 1 + (bytes.length % 64)
      (w, h, digest.map(_ & 0xff))
    }
    /** "Resize": re-hash payload to the target dims deterministically. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(bytes); md.update(s"${w}x$h".getBytes("UTF-8"))
      md.digest()
    }
    /** "Frame-sample" a video payload every `everyMs`. */
    def sampleFrames(bytes: Array[Byte], durationMs: Long, everyMs: Long): Seq[(Int, Long)] =
      (0L until math.max(durationMs, 1L) by math.max(everyMs, 1L))
        .zipWithIndex.map { case (ms, i) => (i, ms) }
  }

  /** Batched mapPartitions: the Arrow-record-batch shape without Arrow —
    * operators see fixed-size batches, enabling per-batch amortized setup
    * (codec init, buffer reuse) exactly like a pandas UDF would. */
  def mapBatches[T, U](ds: Dataset[T], batchSize: Int)(f: Seq[T] => Seq[U])
                      (implicit enc: org.apache.spark.sql.Encoder[U]): Dataset[U] =
    ds.mapPartitions(_.grouped(batchSize).flatMap(batch => f(batch)))(enc)

  /** Image feature extraction over the media frame: decode →
    * width/height/brightness/16-bin histogram. PNG payloads (8-bit
    * gray/RGB, non-interlaced) decode for REAL through [[PngCodec]],
    * GIF payloads (non-interlaced, palette-expanded to RGB) through
    * [[GifCodec]]; everything else falls back to the deterministic
    * [[StubCodec]] fake. NULL/empty payloads yield zeroed features
    * rather than failing the batch.
    *
    * Real-path brightness is the mean channel sample / 255, quantized
    * half-up to 6 decimals in INTEGER space (the q87 micro-unit rule:
    * micro = (2·sum·10^6 + d) DIV 2d over d = n·255, then ONE exact IEEE
    * divide) — so an engine that can reproduce the pixel synthesis can
    * reproduce the exact double without float-summation-order hazards. */
  def imageFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        if (bytes.isEmpty) ImageFeatures(m.media_id, 0, 0, 0L, 0.0, Array.fill(16)(0.0))
        else PngCodec.decode(bytes).orElse(GifCodec.decode(bytes))
          .orElse(JpegCodec.decode(bytes)) match {
          case Some((w, h, _, samples)) =>
            val hist = Array.fill(16)(0.0)
            var sum = 0L
            samples.foreach { s => hist(s / 16) += 1.0; sum += s }
            val d = samples.length.toLong * 255L
            val micro = (sum * 2000000L + d) / (2L * d)
            ImageFeatures(m.media_id, w, h, bytes.length.toLong,
              micro.toDouble / 1000000.0,
              hist.map(_ / samples.length.toDouble))
          case None =>
            val (w, h, px) = StubCodec.decodeImage(bytes)
            val hist = Array.fill(16)(0.0)
            px.foreach(p => hist(p / 16) += 1.0)
            val n = px.length.toDouble
            ImageFeatures(m.media_id, w, h, bytes.length.toLong,
              px.sum / math.max(n, 1.0) / 255.0, hist.map(_ / math.max(n, 1.0)))
        }
      }
    }
  }

  /** Audio feature extraction — [[imageFeatures]]'s PCM sibling: WAV and
    * AIFF integer PCM decode for REAL through [[PcmCodec]] (8/16/24-bit,
    * one signed amplitude convention); per-payload amplitude features
    * come out in two layers so the oracle can re-derive them exactly —
    * the integer layer (n_samples, peak_abs, sum_amp, sum_sq) is exact
    * arithmetic over decoded samples, and each float (mean_amp, rms) is
    * ONE fixed IEEE operation sequence over those integers
    * (sum/n; sqrt(sum_sq/n)) that any engine reproduces bit-for-bit.
    *
    * Payloads the codec declines — FLAC and anything else compressed,
    * float/32-bit PCM, truncated sample data — yield the HONEST stub
    * row: format "stub", zero features, n_samples = payload length, so
    * a downstream consumer can never mistake a declined decode for
    * digital silence. NULL/empty payloads yield the same with n 0. */
  def audioFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        PcmCodec.decode(bytes) match {
          case Some(p) if p.samples.nonEmpty =>
            var peak = 0; var sum = 0L; var sq = 0L
            p.samples.foreach { s =>
              val a = math.abs(s)
              if (a > peak) peak = a
              sum += s
              sq += s.toLong * s
            }
            val n = p.samples.length
            AudioFeatures(m.media_id, p.format, p.channels, p.sampleRate,
              n.toLong, peak, sum, sq,
              sum.toDouble / n, math.sqrt(sq.toDouble / n))
          case Some(p) =>
            AudioFeatures(m.media_id, p.format, p.channels, p.sampleRate,
              0L, 0, 0L, 0L, 0.0, 0.0)
          case None =>
            AudioFeatures(m.media_id, "stub", 0, 0, bytes.length.toLong,
              0, 0L, 0L, 0.0, 0.0)
        }
      }
    }
  }

  /** Perceptual image fingerprint (dHash) over REAL decoded pixels —
    * the multimodal member of the dedup family: PNG/GIF payloads decode
    * through [[PngCodec]]/[[GifCodec]], grayscale by integer channel
    * mean, area-average down to a 9×8 grid (cell boundaries
    * `floor(i·w/9)`, exact integer arithmetic end to end), and each of
    * the 8×8 left<right comparisons becomes one bit — a 64-bit hash
    * whose Hamming distance survives recompression, palette changes,
    * and mild brightness shifts, which exact byte hashes (q17) cannot.
    *
    * Output: (media_id, dhash). Payloads the codecs decline, and images
    * smaller than the 9×8 grid, yield NULL — a visible non-hash, never
    * a fabricated fingerprint from stub pixels.
    *
    * Scale shape: per-row kernel in narrow batches (payloads never
    * shuffle); downstream near-dup detection ([[imageNearDups]])
    * operates on the 8-byte hashes only. */
  def imageDHash(media: Dataset[MediaRow], batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        val decoded =
          if (bytes.isEmpty) None
          else PngCodec.decode(bytes).orElse(GifCodec.decode(bytes))
            .orElse(JpegCodec.decode(bytes))
        m.media_id -> decoded.flatMap { case (w, h, ch, s) =>
          if (w < 9 || h < 8) None else Some(dhash64(w, h, ch, s))
        }
      }
    }.toDF("media_id", "dhash")
  }

  /** The dHash kernel: integer-exact grayscale → 9×8 area means → 64
    * left<right bits (row-major, bit (row·8+col)). */
  private[multimodal] def dhash64(w: Int, h: Int, ch: Int, s: Array[Int]): Long = {
    val cell = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * w + x) * ch
            sum += (if (ch == 1) s(i) else (s(i) + s(i + 1) + s(i + 2)) / 3)
            x += 1
          }
          y += 1
        }
        cell(gy)(gx) = sum / ((y1 - y0).toLong * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var row = 0
    while (row < 8) {
      var colI = 0
      while (colI < 8) {
        if (cell(row)(colI) < cell(row)(colI + 1))
          hash |= 1L << (row * 8 + colI)
        colI += 1
      }
      row += 1
    }
    hash
  }

  /** Audio resampling — payload→payload linear interpolation to a
    * target rate, closing the "audio resample" stub: PCM decodes
    * through [[PcmCodec]], each channel resamples independently at
    * RATIONAL source positions (pos = i·srcRate/dstRate held as exact
    * integer quotient+remainder, so there is NO accumulating float
    * phase error), each interpolated amplitude is ONE fixed IEEE
    * sequence `a + (b−a)·rem/dstRate` rounded half away (the q117
    * micro-unit discipline — an oracle can recompute every sample), and
    * the result re-encodes into the SAME container and bit depth.
    * Output frame count preserves duration: ((frames−1)·dst)/src + 1.
    *
    * Payloads the codec declines pass through UNTOUCHED — visibly, via
    * [[audioHeaderMeta]]'s unchanged sample_rate, never silently
    * dropped or fabricated. */
  def resampleAudio(media: Dataset[MediaRow], targetRate: Int,
                    batchSize: Int = 64): Dataset[MediaRow] = {
    require(targetRate > 0, s"resampleAudio: bad target rate $targetRate")
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        PcmCodec.decode(bytes) match {
          case Some(p) if p.samples.nonEmpty && p.sampleRate != targetRate =>
            val ch = p.channels
            val frames = p.samples.length / ch
            val outFrames =
              if (frames == 1) 1
              else ((frames - 1).toLong * targetRate / p.sampleRate).toInt + 1
            val out = new Array[Int](outFrames * ch)
            var i = 0
            while (i < outFrames) {
              val num = i.toLong * p.sampleRate
              val k = (num / targetRate).toInt
              val rem = (num % targetRate).toInt
              var c = 0
              while (c < ch) {
                val a = p.samples(k * ch + c)
                out(i * ch + c) =
                  if (rem == 0 || k + 1 >= frames) a
                  else {
                    val b = p.samples((k + 1) * ch + c)
                    val t = (b - a).toDouble * rem / targetRate.toDouble
                    (if (a + t >= 0) math.floor(a + t + 0.5)
                     else -math.floor(-(a + t) + 0.5)).toInt
                  }
                c += 1
              }
              i += 1
            }
            val re =
              if (p.format == "wav")
                PcmCodec.encodeWav(ch, targetRate, p.bits, out)
              else PcmCodec.encodeAiff(ch, targetRate, p.bits, out)
            m.copy(content = re)
          case _ => m // declined or already at rate: untouched, visibly
        }
      }
    }
  }

  /** Perceptual AUDIO fingerprint — [[imageDHash]]'s PCM sibling: decode
    * through [[PcmCodec]], split the amplitude stream into 33 equal
    * windows (boundaries `floor(i·n/33)`, exact integer arithmetic),
    * sum |amplitude| per window, and take the 32 energy[i] < energy[i+1]
    * comparisons as bits — an energy-contour hash that survives volume
    * changes (scaling every sample scales every window equally) the way
    * dHash survives brightness shifts. Payloads the codec declines, and
    * clips shorter than 33 samples, yield NULL — never a fabricated
    * fingerprint. Output: (media_id, afp). */
  def audioFingerprint(media: Dataset[MediaRow], batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        m.media_id -> PcmCodec.decode(bytes).flatMap { p =>
          val n = p.samples.length
          if (n < 33) None
          else {
            val e = new Array[Long](33)
            var wI = 0
            while (wI < 33) {
              var k = wI * n / 33
              val k1 = (wI + 1) * n / 33
              var sum = 0L
              while (k < k1) { sum += math.abs(p.samples(k)); k += 1 }
              e(wI) = sum
              wI += 1
            }
            var hash = 0L
            var i = 0
            while (i < 32) {
              if (e(i) < e(i + 1)) hash |= 1L << i
              i += 1
            }
            Some(hash)
          }
        }
      }
    }.toDF("media_id", "afp")
  }

  /** Periodicity (pitch-period) detection by integer autocorrelation —
    * the audio-analysis member of the curation family: decode through
    * [[PcmCodec]], then for every lag in `[minLag, maxLag]` compute the
    * EXACT integer autocorrelation
    * `R(lag) = Σ_{i<n-lag} s(i)·s(i+lag)` and report the lag that
    * maximizes it (ties → smallest lag — the fundamental, not its
    * multiple). All-integer end to end: products and sums are exact
    * longs, so an oracle recomputes every R from the sample formula and
    * the argmax is deterministic on any engine. A periodic clip scores
    * its true period; noise scores an arbitrary-but-reproducible lag —
    * the feature a voiced/unvoiced or music/speech router thresholds on
    * (score relative to R(0) energy).
    *
    * Payloads the codec declines, clips shorter than `maxLag + 1`
    * samples, AND clips whose `n · peak²` could overflow the exact
    * Long accumulator (a loud 24-bit clip past ~131k samples — wrapped
    * sums would be a silently-wrong pitch, worse than no answer) yield
    * NULL lag/score — a visible non-answer, never a fabricated pitch.
    * Output: (media_id, period_lag, period_score).
    *
    * Scale shape: per-row kernel in narrow batches — `O(n·lagRange)`
    * integer ops per clip, payloads never shuffle. */
  def audioPeriodicity(media: Dataset[MediaRow], minLag: Int, maxLag: Int,
                       batchSize: Int = 64): DataFrame = {
    require(0 < minLag && minLag <= maxLag,
      s"audioPeriodicity: bad lag range [$minLag, $maxLag]")
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        val best = PcmCodec.decode(bytes).flatMap { p =>
          val s = p.samples
          val n = s.length
          var peak = 0L
          s.foreach { v => val a = math.abs(v).toLong; if (a > peak) peak = a }
          if (n <= maxLag ||
            (peak > 0 && n.toLong > Long.MaxValue / (peak * peak))) None
          else {
            var bestLag = 0; var bestR = Long.MinValue
            var lag = minLag
            while (lag <= maxLag) {
              var r = 0L
              var i = 0
              val end = n - lag
              while (i < end) { r += s(i).toLong * s(i + lag); i += 1 }
              if (r > bestR) { bestR = r; bestLag = lag } // strict: ties keep the smaller lag
              lag += 1
            }
            Some((bestLag, bestR))
          }
        }
        (m.media_id, best.map(_._1), best.map(_._2))
      }
    }.toDF("media_id", "period_lag", "period_score")
  }

  /** Peak (loudness) normalization — payload→payload, the level-the-
    * volumes pass an audio corpus runs before comparative feature
    * extraction: decode through [[PcmCodec]], scale every sample so the
    * clip's peak |amplitude| becomes exactly `targetPeak`, re-encode
    * into the SAME container and bit depth. The scale is ALL-INTEGER:
    * `out = round_half_away(s · target / peak)` computed as
    * `(2·|s|·target + peak) div (2·peak)` with the sign reapplied — no
    * float anywhere, so an oracle recomputes every sample, and
    * |out| ≤ targetPeak is guaranteed (no clipping stage needed).
    *
    * Untouched (visibly, via [[audioFeatures]]' unchanged peak):
    * payloads the codec declines, all-zero clips (no peak to scale),
    * and clips whose bit depth cannot represent `targetPeak`
    * (target ≥ 2^(bits−1)) — never a silently clipped rewrite. */
  def normalizeAudioPeak(media: Dataset[MediaRow], targetPeak: Int,
                         batchSize: Int = 64): Dataset[MediaRow] = {
    require(targetPeak > 0, s"normalizeAudioPeak: bad target $targetPeak")
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        PcmCodec.decode(bytes) match {
          case Some(p) if p.samples.nonEmpty &&
            targetPeak < (1 << (p.bits - 1)) =>
            var peak = 0
            p.samples.foreach { s =>
              val a = math.abs(s); if (a > peak) peak = a
            }
            if (peak == 0) m // digital silence: nothing to scale, visibly
            else {
              val out = p.samples.map { s =>
                val scaled = ((2L * math.abs(s) * targetPeak + peak) /
                  (2L * peak)).toInt
                if (s < 0) -scaled else scaled
              }
              val re =
                if (p.format == "wav")
                  PcmCodec.encodeWav(p.channels, p.sampleRate, p.bits, out)
                else PcmCodec.encodeAiff(p.channels, p.sampleRate, p.bits, out)
              m.copy(content = re)
            }
          case _ => m // declined or unrepresentable target: untouched
        }
      }
    }
  }

  /** Activity (non-silence) segmentation — the trim-before-transcribe
    * pass of an audio curation pipeline: decode through [[PcmCodec]],
    * mark each sample ACTIVE iff |amplitude| ≥ `threshold`, and emit
    * every maximal active run of at least `minRun` samples as one
    * segment row (media_id, seg_idx, start, end_excl, n_samples, peak).
    * seg_idx numbers the KEPT segments in order from 0. All-integer —
    * an oracle reproduces every boundary from the sample formula via
    * gaps-and-islands SQL. Payloads the codec declines, and clips with
    * no qualifying run, emit NO rows (compose with [[audioFeatures]]'s
    * visible stub row to distinguish "silent" from "undecodable").
    *
    * Scale shape: flatMap-shaped per-row kernel in narrow batches —
    * payload bytes never shuffle, and the output is segment METADATA
    * (five ints per segment), not audio. */
  def audioActiveSegments(media: Dataset[MediaRow], threshold: Int,
                          minRun: Int, batchSize: Int = 64): DataFrame = {
    require(threshold > 0, s"audioActiveSegments: bad threshold $threshold")
    require(minRun >= 1, s"audioActiveSegments: bad minRun $minRun")
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.flatMap { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        PcmCodec.decode(bytes) match {
          case Some(p) =>
            val s = p.samples
            val segs = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Int, Int, Int, Int, Int)]
            var i = 0
            var segIdx = 0
            while (i < s.length) {
              if (math.abs(s(i)) >= threshold) {
                val start = i
                var peak = 0
                while (i < s.length && math.abs(s(i)) >= threshold) {
                  val a = math.abs(s(i))
                  if (a > peak) peak = a
                  i += 1
                }
                if (i - start >= minRun) {
                  segs += ((m.media_id, segIdx, start, i, i - start, peak))
                  segIdx += 1
                }
              } else i += 1
            }
            segs.toSeq
          case None => Seq.empty
        }
      }
    }.toDF("media_id", "seg_idx", "start", "end_excl", "n_samples", "peak")
  }

  /** Spectral sign hash — [[imageDHash]]'s frequency-domain sibling (the
    * pHash family, with the DCT swapped for the integer-exact
    * Walsh-Hadamard transform so every bit is reproducible arithmetic,
    * not float-rounding luck): decode, grayscale by integer channel
    * mean, area-average onto an 8×8 grid (floor cell boundaries, exact
    * integer division — [[dhash64]]'s cell rule), then the 2-D WHT
    * `H(u,v) = Σ_{x,y} g(y,x)·(−1)^(popcount(y∧u)+popcount(x∧v))`.
    * The 15 lowest-frequency coefficients ((u,v) ∈ {0..3}², DC (0,0)
    * excluded) each contribute one bit: 1 iff the coefficient exceeds
    * their exact integer median (8th smallest of 15). dHash encodes
    * local gradients; this encodes global structure — robust to the
    * local noise that flips gradient bits.
    *
    * Payloads the codecs decline, and images smaller than 8×8, yield
    * NULL. Output: (media_id, shash) — a 15-bit hash, bit (u·4+v−1).
    * Near-dup pairing rides [[nearDupsByHash]]'s banded core unchanged
    * (16-bit multiple via the 15 bits zero-extended is not 4-bandable,
    * so pair via exact equality or small-radius scan — at 15 bits the
    * keyspace is 32k buckets and a plain hash-equijoin is the scale
    * path). */
  def imageSpectralHash(media: Dataset[MediaRow], batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        val decoded =
          if (bytes.isEmpty) None
          else PngCodec.decode(bytes).orElse(GifCodec.decode(bytes))
            .orElse(JpegCodec.decode(bytes))
        m.media_id -> decoded.flatMap { case (w, h, ch, s) =>
          if (w < 8 || h < 8) None else Some(spectralHash15(w, h, ch, s))
        }
      }
    }.toDF("media_id", "shash")
  }

  /** The spectral-hash kernel: 8×8 area means → 2-D Walsh-Hadamard →
    * 15 low-frequency sign-vs-median bits. Integer-exact throughout. */
  private[multimodal] def spectralHash15(w: Int, h: Int, ch: Int, s: Array[Int]): Int = {
    val g = Array.ofDim[Long](8, 8)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8; val x1 = (gx + 1) * w / 8
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * w + x) * ch
            sum += (if (ch == 1) s(i) else (s(i) + s(i + 1) + s(i + 2)) / 3)
            x += 1
          }
          y += 1
        }
        g(gy)(gx) = sum / ((y1 - y0).toLong * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    val coeffs = new Array[Long](15)
    var u = 0
    while (u < 4) {
      var v = 0
      while (v < 4) {
        if (u != 0 || v != 0) {
          var acc = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val sign = Integer.bitCount(x & v) + Integer.bitCount(y & u)
              acc += (if ((sign & 1) == 0) g(y)(x) else -g(y)(x))
              x += 1
            }
            y += 1
          }
          coeffs(u * 4 + v - 1) = acc
        }
        v += 1
      }
      u += 1
    }
    val sorted = coeffs.clone(); java.util.Arrays.sort(sorted)
    val med = sorted(7)
    var hash = 0
    var i = 0
    while (i < 15) {
      if (coeffs(i) > med) hash |= 1 << i
      i += 1
    }
    hash
  }

  /** Near-duplicate image pairs by banded dHash — the [[imageDHash]]
    * scale path: the 64-bit hash splits into four 16-bit bands; by
    * pigeonhole, any pair within Hamming distance 3 agrees on at least
    * one whole band, so candidate generation is four hash-equijoins on
    * 2-byte keys (shuffle carries 8-byte hashes, never pixels) and the
    * exact Hamming check runs only inside buckets. maxHamming ≤ 3 keeps
    * the pigeonhole guarantee; a larger radius would need more bands.
    * Output: (a, b, hamming), a < b, distinct. */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    nearDupsByHash(hashes, "dhash", hashBits = 64, maxHamming = maxHamming)

  /** [[imageNearDups]] for the audio fingerprint: same 4-band
    * pigeonhole over the 32-bit energy-contour hash (8-bit bands). */
  def audioNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    nearDupsByHash(hashes, "afp", hashBits = 32, maxHamming = maxHamming)

  /** Image duplicate CLUSTERS at crawl scale: identical dHashes
    * collapse to one leader before the banded pair listing (equal hash
    * ⇒ Hamming 0 ⇒ edge, so the collapse is exact —
    * [[graft.operators.Dedup.componentsCollapsedByKey]]), then
    * [[imageNearDups]] pairs the leaders and components label them.
    * Without the collapse, m byte-identical images (the million-member
    * logo/placeholder classes every real crawl carries) cost C(m,2)
    * pair rows before components even start — measured 25.9 s → 2.8 s
    * at sf1.0 with cluster mass pushed 4× (800-member clusters), and
    * the uncollapsed cost grows quadratically with cluster size where
    * this stays flat (SCALE.md round-12 table). NULL
    * hashes (declined decodes) stay singleton components. Output:
    * (doc, component), one row per input hash row. */
  def imageDupClusters(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.componentsCollapsedByKey(
      hashes.select(col("media_id"), col("dhash")), "media_id", "dhash",
      leaders => imageNearDups(leaders, maxHamming)
        .select(col("a").as("d1"), col("b").as("d2")))

  /** The shared banded near-dup core: a `hashBits`-bit hash splits into
    * 4 equal bands; by pigeonhole any pair within Hamming distance 3
    * agrees on a whole band, so candidates come from 4 hash-equijoins
    * and the exact Hamming check runs only inside buckets. NULL hashes
    * (declined decodes) never pair. Output: (a, b, hamming), a < b. */
  private def nearDupsByHash(hashes: DataFrame, hashCol: String,
                             hashBits: Int, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"nearDupsByHash: maxHamming $maxHamming breaks the 4-band pigeonhole")
    require(hashBits % 4 == 0, s"nearDupsByHash: bits $hashBits not 4-bandable")
    val bandBits = hashBits / 4
    val mask = (1L << bandBits) - 1
    val hs = hashes.where(col(hashCol).isNotNull)
      .select(col("media_id"), col(hashCol).as("__h"))
    val banded = hs.select(col("media_id"), col("__h"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("__h"), bandBits * i).bitwiseAND(lit(mask))
            .as("key"))): _*)).as("b"))
      .select(col("media_id"), col("__h"),
        col("b.band").as("band"), col("b.key").as("key"))
    val l = banded.select(col("band"), col("key"),
      col("media_id").as("a"), col("__h").as("ha"))
    val r = banded.select(col("band"), col("key"),
      col("media_id").as("b"), col("__h").as("hb"))
    l.join(r, Seq("band", "key"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** REAL integer-factor image downscale — the thumbnailing transform
    * a 100 TB crawl runs before feature extraction, replacing the stub
    * resize for every payload the real codecs can decode: pixels come
    * through [[PngCodec]]/[[GifCodec]]/[[JpegCodec]], each output
    * sample is the EXACT half-up integer mean of its factor×factor box
    * (`(2·sum + f²) div 2f²` — no float, an oracle recomputes it), and
    * the result re-encodes as lossless PNG (thumbnails standardize to
    * PNG regardless of source container — re-encoding lossy JPEG as
    * JPEG would stack quantization error).
    *
    * Payloads that decline — undecodable bytes, dims not divisible by
    * the factor — pass through UNTOUCHED (visible via image_meta's
    * unchanged dims), never silently dropped or fabricated. General
    * fractional resize stays out of the envelope deliberately: it
    * needs interpolation choices this contract doesn't want to hide. */
  def downscaleImages(media: Dataset[MediaRow], factor: Int,
                      batchSize: Int = 64): Dataset[MediaRow] = {
    require(factor >= 1, s"downscaleImages: bad factor $factor")
    import media.sparkSession.implicits._
    val f2 = factor * factor
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        val decoded =
          if (bytes.isEmpty) None
          else PngCodec.decode(bytes).orElse(GifCodec.decode(bytes))
            .orElse(JpegCodec.decode(bytes))
        decoded match {
          case Some((w, h, ch, s))
            if factor > 1 && w % factor == 0 && h % factor == 0 =>
            val ow = w / factor; val oh = h / factor
            val out = new Array[Int](ow * oh * ch)
            var oy = 0
            while (oy < oh) {
              var ox = 0
              while (ox < ow) {
                var c = 0
                while (c < ch) {
                  var sum = 0
                  var dy = 0
                  while (dy < factor) {
                    var dx = 0
                    while (dx < factor) {
                      sum += s(((oy * factor + dy) * w + ox * factor + dx)
                        * ch + c)
                      dx += 1
                    }
                    dy += 1
                  }
                  out((oy * ow + ox) * ch + c) = (2 * sum + f2) / (2 * f2)
                  c += 1
                }
                ox += 1
              }
              oy += 1
            }
            m.copy(mime = "image/png",
              content = PngCodec.encode(ow, oh, ch, out),
              meta = m.meta.copy(width = Some(ow), height = Some(oh)))
          case _ => m // declined or factor 1: untouched, visibly
        }
      }
    }
  }

  /** Image resize: payload→payload transform keeping (id, mime, meta)
    * and rewriting content + dims — the decode→resize→encode round trip
    * behind the stub codec. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int,
                   batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        m.copy(content = StubCodec.resize(bytes, w, h),
          meta = m.meta.copy(width = Some(w), height = Some(h)))
      }
    }
  }

  /** REAL video frame extraction for the Motion-JPEG family: each
    * `movi` chunk of an MJPEG AVI is a complete baseline JPEG, so
    * [[MjpegAvi]] + [[JpegCodec]] extract genuinely decodable frames —
    * one output row per frame, frame payload = the frame's own JPEG
    * bytes, `frame_ms` from the container's µs-per-frame clock.
    * Containers outside the envelope (real inter-frame codecs) emit
    * NO rows — compose with [[sampleFrames]]'s visible stub for those,
    * never fabricated frames. */
  def mjpegFrames(media: Dataset[MediaRow], batchSize: Int = 16): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.flatMap { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        MjpegAvi.decode(bytes) match {
          case Some((us, frames)) =>
            frames.zipWithIndex.map { case (f, i) =>
              FrameSample(m.media_id, i, i.toLong * us / 1000L, f)
            }
          case None => Seq.empty
        }
      }
    }
  }

  /** Video frame sampling: one output row per sampled frame (flatMap
    * shape), frame payload re-hashed per frame (stub). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long,
                   batchSize: Int = 16): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    mapBatches(media, batchSize) { batch =>
      batch.flatMap { m =>
        val dur = m.meta.duration_ms.getOrElse(0L)
        StubCodec.sampleFrames(Option(m.content).getOrElse(Array.emptyByteArray), dur, everyMs)
          .map { case (i, ms) =>
            FrameSample(m.media_id, i, ms, StubCodec.resize(m.content, 32, 32)) }
      }
    }
  }

  /** Pure-SQL metadata facet — no payload decode, stays in codegen. */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("mime"),
      length(col("content")).as("n_bytes"),
      md5(col("content")).as("content_md5"),
      col("meta.width").as("width"), col("meta.height").as("height"))

  /** REAL container metadata from the payload bytes: format, dimensions,
    * bit depth, channels parsed from the PNG/JPEG/GIF/BMP header by the
    * codegen'd [[graft.functions.ImageMetaExpr]] — one narrow scan, no
    * pixel decode, NULLs (not failures) for unrecognized payloads. The
    * trust boundary a 100 TB crawl needs: declared `meta.width/height`
    * can lie; these come from the bytes. */
  def imageHeaderMeta(media: DataFrame): DataFrame = {
    val m = graft.functions.ImageMetaExpr.imageMeta(col("content"))
    media.select(col("media_id"), col("mime"),
      length(col("content")).as("n_bytes"),
      m.getField("format").as("format"),
      m.getField("width").as("width"),
      m.getField("height").as("height"),
      m.getField("bit_depth").as("bit_depth"),
      m.getField("channels").as("channels"))
  }

  /** [[imageHeaderMeta]]'s video sibling, completing the metadata
    * family: MP4/AVI header fields parsed from the payload bytes by the
    * codegen'd [[graft.functions.VideoMetaExpr]] — same narrow-scan,
    * NULL-on-corrupt contract; frame DECODE stays behind the stub. */
  def videoHeaderMeta(media: DataFrame): DataFrame = {
    val m = graft.functions.VideoMetaExpr.videoMeta(col("content"))
    media.select(col("media_id"), col("mime"),
      length(col("content")).as("n_bytes"),
      m.getField("format").as("format"),
      m.getField("width").as("width"),
      m.getField("height").as("height"),
      m.getField("duration_ms").as("duration_ms"),
      m.getField("n_tracks").as("n_tracks"))
  }

  /** [[imageHeaderMeta]]'s audio sibling: WAV/AIFF/FLAC header fields
    * parsed from the payload bytes by the codegen'd
    * [[graft.functions.AudioMetaExpr]], plus derived duration —
    * same narrow-scan, NULL-on-corrupt contract. */
  def audioHeaderMeta(media: DataFrame): DataFrame = {
    val m = graft.functions.AudioMetaExpr.audioMeta(col("content"))
    media.select(col("media_id"), col("mime"),
      length(col("content")).as("n_bytes"),
      m.getField("format").as("format"),
      m.getField("channels").as("channels"),
      m.getField("sample_rate").as("sample_rate"),
      m.getField("bits_per_sample").as("bits_per_sample"),
      m.getField("n_frames").as("n_frames"))
      .withColumn("duration_ms",
        expr("n_frames * 1000 DIV sample_rate"))
  }
}
