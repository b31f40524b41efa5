package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media payloads are
  * opaque BINARY columns with a typed metadata struct riding alongside
  * (the same opaque-blob + typed-metadata split the chunk store uses
  * for array tiles). Decode / feature-extract / resize / frame-sample
  * run as partition-parallel batch transforms over the binary column —
  * the Scala analog of a vectorized-UDF stage: one task per partition,
  * no shuffle before the per-record kernels.
  *
  * The actual image/audio codecs are STUBBED with a deterministic fake
  * (no media libraries in this environment — see
  * [[MediaKernels.decodeStub]]); the Spark-side plumbing — schema,
  * batch shape, partitioning, kernel signature — is real and tested.
  */
object MultimodalOps extends QueryPack {

  case class MediaMeta(mediaType: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)
  case class MediaRecord(media_id: Long, meta: MediaMeta,
      payload: Array[Byte])
  case class MediaFeatures(media_id: Long, mediaType: String,
      n_bytes: Int, mean_intensity: Double, n_frames_sampled: Int,
      resized_w: Int, resized_h: Int)

  /** Kernel boundary: where codecs decode `payload`. Real image decode
    * runs through `javax.imageio` (pure JDK — PNG/BMP/GIF/JPEG);
    * payloads no codec recognizes fall back to the deterministic stub
    * (bytes as unsigned intensities) so the pipeline stays total. The
    * signature (bytes + typed meta in, dense feature row out) is the
    * production contract; audio/video codecs would slot in the same
    * way but have no pure-JDK decoder.
    */
  object MediaKernels {
    def decodeStub(payload: Array[Byte]): Array[Int] =
      payload.map(b => b & 0xff)

    /** Real image decode: per-pixel mean-RGB intensities, row-major.
      * None when no registered codec recognizes the bytes.
      */
    def decodeImage(payload: Array[Byte]): Option[Array[Int]] =
      try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))).map { img =>
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Int](w * h)
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(i) =
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              i += 1; x += 1
            }
            y += 1
          }
          out
        }
      } catch { case _: Exception => None }

    /** Total decode: real codec first, stub fallback. */
    def decode(payload: Array[Byte]): Array[Int] =
      decodeImage(payload).getOrElse(decodeStub(payload))

    def meanIntensity(px: Array[Int]): Double =
      if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length

    /** Frame sampling: every k-th frame index of a fake video/audio
      * timeline derived from durationMs.
      */
    def sampleFrames(durationMs: Long, everyMs: Long): Seq[Long] =
      (0L until durationMs by everyMs).toSeq

    /** Audio decode STUB: payload bytes as alternating-sign centered
      * PCM samples (no pure-JDK audio codec — javax.sound reads WAV
      * headers but the payloads here are synthetic). The alternation
      * gives the fake waveform real zero crossings so the feature
      * kernels are exercised, and the derivation is pure byte
      * arithmetic, so DuckDB replays it exactly.
      */
    def decodeAudioStub(payload: Array[Byte]): Array[Int] =
      payload.zipWithIndex.map { case (b, i) =>
        ((b & 0xff) - 128) * (if (i % 2 == 0) 1 else -1)
      }

    /** The standard waveform summary features: RMS energy, zero
      * crossing rate, peak amplitude, clipping ratio. Integer sums
      * stay exact; the single final division/sqrt is bit-identical
      * across engines.
      */
    def audioFeatures(s: Array[Int]): (Int, Double, Double, Int, Double) = {
      val n = s.length
      if (n == 0) return (0, 0.0, 0.0, 0, 0.0)
      var sumSq = 0L
      var peak = 0
      var clips = 0L
      var zc = 0L
      var i = 0
      while (i < n) {
        val v = s(i)
        sumSq += v.toLong * v
        val a = math.abs(v)
        if (a > peak) peak = a
        if (a >= 90) clips += 1
        if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
        i += 1
      }
      (n, math.sqrt(sumSq.toDouble / n),
        if (n > 1) zc.toDouble / (n - 1) else 0.0,
        peak, clips.toDouble / n)
    }

    /** Resize: target dims only (stub never touches pixels). */
    def resize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      if (w <= maxSide && h <= maxSide) (w, h)
      else {
        val scale = maxSide.toDouble / math.max(w, h)
        (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
      }
    }
  }

  /** Deterministic synthetic media table derived from the documents
    * table: payload bytes from the text, metadata from stable columns.
    * (Media payloads aren't in the driver test data; the derivation is
    * pure so every run and engine sees identical inputs.)
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"), col("source"))
      .as[(Long, String, Long, String)]
      .map { case (id, text, nChars, source) =>
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRecord(id,
          MediaMeta(mt,
            width = (64 + (nChars % 512)).toInt,
            height = (64 + (id * 7 % 512)).toInt,
            sampleRateHz = if (mt == "audio") 16000 else 0,
            durationMs = 40L * (1 + nChars % 250)),
          text.getBytes("UTF-8"))
      }
  }

  val all: Seq[Q] = Seq(

    // decode -> feature-extract -> resize -> frame-sample, one
    // partition-parallel pass over the binary column. The derivation
    // from `documents` is pure and the corpus is ASCII, so the whole
    // kernel chain is expressible (and hash-gated) in DuckDB: byte
    // intensities = character codes, frame count and resize are
    // closed-form arithmetic.
    Q("mm01_media_features",
      Some("WITH m AS (SELECT doc_id AS media_id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END AS \"mediaType\", " +
        "CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, " +
        "list_aggregate(list_transform(range(1, len(text) + 1), " +
        "i -> ascii(text[i])), 'sum') AS s, len(text) AS l, " +
        "40 * (1 + n_chars % 250) AS dur, " +
        "64 + (n_chars % 512) AS w0, 64 + (doc_id * 7 % 512) AS h0 " +
        "FROM documents) " +
        "SELECT media_id, \"mediaType\", n_bytes, " +
        "CAST(s AS DOUBLE) / l AS mean_intensity, " +
        "CAST((dur + 999) // 1000 AS INTEGER) AS n_frames_sampled, " +
        "CASE WHEN w0 <= 256 AND h0 <= 256 THEN CAST(w0 AS INTEGER) " +
        "ELSE CAST(GREATEST(1, FLOOR(w0 * (256.0 / GREATEST(w0, h0)))) " +
        "AS INTEGER) END AS resized_w, " +
        "CASE WHEN w0 <= 256 AND h0 <= 256 THEN CAST(h0 AS INTEGER) " +
        "ELSE CAST(GREATEST(1, FLOOR(h0 * (256.0 / GREATEST(w0, h0)))) " +
        "AS INTEGER) END AS resized_h FROM m"),
      (s, d) => {
      import s.implicits._
      mediaTable(s, d).mapPartitions { it =>
        it.map { r =>
          val px = MediaKernels.decode(r.payload)
          val frames =
            MediaKernels.sampleFrames(r.meta.durationMs, everyMs = 1000L)
          val (rw, rh) =
            MediaKernels.resize(r.meta.width, r.meta.height, maxSide = 256)
          MediaFeatures(r.media_id, r.meta.mediaType, px.length,
            MediaKernels.meanIntensity(px), frames.length, rw, rh)
        }
      }.toDF()
    }),

    // Frame sampling as a FAN-OUT + cross-video frame-level dedup: the
    // video-pipeline step after mm01's per-asset features — sample one
    // frame per second of timeline, fingerprint each sampled frame
    // (here: md5 of the 16-byte payload window the frame index selects;
    // a real codec would hash the decoded frame), and report
    // fingerprints shared by more than one video (near-identical frames
    // to drop before training). Scale shape: the explode is
    // partition-parallel over the binary column (no shuffle to produce
    // frames), dedup is ONE groupBy keyed on the fingerprint, and the
    // report is TakeOrdered top-k — never a frames×frames join.
    Q("mm03_frame_dedup",
      Some("WITH v AS (SELECT doc_id, text, " +
        "40 * (1 + n_chars % 250) AS dur FROM documents " +
        "WHERE doc_id % 3 = 2), " +
        "f AS (SELECT doc_id, text, " +
        "unnest(range(0, (dur + 999) // 1000)) AS fi FROM v), " +
        "fp AS (SELECT doc_id, md5(substr(text, " +
        "CAST((fi * 17) % greatest(1, len(text)) AS INTEGER) + 1, 16)) " +
        "AS frame_fp FROM f) " +
        "SELECT frame_fp, count(DISTINCT doc_id) AS n_videos, " +
        "count(*) AS n_frames FROM fp GROUP BY 1 " +
        "HAVING count(DISTINCT doc_id) > 1 " +
        "ORDER BY n_frames DESC, frame_fp LIMIT 25"),
      (s, d) => {
        import s.implicits._
        val frames = mediaTable(s, d)
          .filter(col("meta.mediaType") === "video")
          .select(col("media_id"),
            col("payload").cast("string").as("text"),
            col("meta.durationMs").as("dur"))
          .withColumn("fi",
            explode(sequence(lit(0L),
              ((col("dur") + 999L) / 1000L).cast("long") - 1L)))
        frames
          .select(col("media_id"),
            md5(col("text").substr(
              ((col("fi") * 17L) % greatest(lit(1L), length(col("text"))))
                .cast("int") + 1, lit(16)).cast("binary")).as("frame_fp"))
          .groupBy(col("frame_fp"))
          .agg(countDistinct(col("media_id")).as("n_videos"),
            count(lit(1)).as("n_frames"))
          .where(col("n_videos") > 1)
          .orderBy(col("n_frames").desc, col("frame_fp"))
          .limit(25)
      }),

    // modality-level stats over the typed metadata struct (no decode:
    // metadata-only scans must not touch payload bytes).
    Q("mm02_media_stats",
      Some("SELECT CASE doc_id % 3 WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END AS media_type, " +
        "count(*) AS n, " +
        "CAST(sum(40 * (1 + n_chars % 250)) AS BIGINT) AS total_duration_ms, " +
        "CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes " +
        "FROM documents GROUP BY 1"),
      (s, d) => {
      import s.implicits._
      mediaTable(s, d)
        .select(col("meta.mediaType").as("media_type"),
          col("meta.durationMs").as("duration_ms"),
          length(col("payload")).as("n_bytes"))
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("duration_ms")).as("total_duration_ms"),
          sum(col("n_bytes")).as("total_bytes"))
    }),

    // audio waveform features over the binary column: decode-stub PCM
    // -> RMS / zero-crossing rate / peak / clipping ratio, one
    // partition-parallel kernel pass (same shape as mm01 — no shuffle
    // before the per-record kernel). Byte-arithmetic stub => the
    // whole chain replays in DuckDB: sample i = (ascii_i - 128) *
    // (-1)^i; integer sums exact, final division/sqrt single IEEE ops.
    Q("mm04_audio_features",
      Some("WITH a AS (SELECT doc_id AS media_id, " +
        "list_transform(range(1, len(text) + 1), i -> " +
        "(ascii(text[i]) - 128) * (CASE WHEN (i - 1) % 2 = 0 " +
        "THEN 1 ELSE -1 END)) AS s FROM documents WHERE doc_id % 3 = 1), " +
        "f AS (SELECT media_id, len(s) AS n_samples, " +
        "list_aggregate(list_transform(s, v -> v * v), 'sum') AS ssq, " +
        "list_aggregate(list_transform(s, v -> abs(v)), 'max') AS peak, " +
        "len(list_filter(s, v -> abs(v) >= 90)) AS clips, " +
        "len(list_filter(range(2, len(s) + 1), i -> " +
        "s[i - 1] * s[i] < 0)) AS zc FROM a) " +
        "SELECT media_id, CAST(n_samples AS INTEGER) AS n_samples, " +
        "sqrt(CAST(ssq AS DOUBLE) / n_samples) AS rms, " +
        "CASE WHEN n_samples > 1 THEN CAST(zc AS DOUBLE) / " +
        "(n_samples - 1) ELSE 0.0 END AS zcr, " +
        "CAST(peak AS INTEGER) AS peak, " +
        "CAST(clips AS DOUBLE) / n_samples AS clip_ratio FROM f"),
      (s, d) => {
        import s.implicits._
        mediaTable(s, d)
          .filter(col("meta.mediaType") === "audio")
          .mapPartitions { it =>
            it.map { r =>
              val pcm = MediaKernels.decodeAudioStub(r.payload)
              val (n, rms, zcr, peak, clip) =
                MediaKernels.audioFeatures(pcm)
              (r.media_id, n, rms, zcr, peak, clip)
            }
          }
          .toDF("media_id", "n_samples", "rms", "zcr", "peak",
            "clip_ratio")
      }),

    // Video scene-change detection: per sampled frame (mm03's 1/sec
    // timeline + 16-byte payload window), frame intensity = mean byte
    // code of the window; a boundary is an intensity jump > 10 between
    // consecutive frames. Scene cuts are inherently SEQUENTIAL per
    // video, so the kernel walks each video's own timeline inside one
    // partition-parallel map — ZERO shuffle (frames derive from the
    // row's payload; the lag-window alternative would explode frames
    // and shuffle them back together). Exactness: intensities are
    // exact-int sums over ≤16 byte codes with one IEEE division each;
    // the jump compare then replays bit-identically in DuckDB.
    Q("mm05_scene_detect",
      Some("WITH v AS (SELECT doc_id, text, " +
        "40 * (1 + n_chars % 250) AS dur FROM documents " +
        "WHERE doc_id % 3 = 2), " +
        "f AS (SELECT doc_id, text, " +
        "unnest(range(0, (dur + 999) // 1000)) AS fi FROM v), " +
        "w AS (SELECT doc_id, fi, substr(text, " +
        "CAST((fi * 17) % greatest(1, len(text)) AS INTEGER) + 1, 16) " +
        "AS sl FROM f), " +
        "i AS (SELECT doc_id, fi, " +
        "CAST(list_aggregate(list_transform(range(1, len(sl) + 1), " +
        "j -> ascii(sl[j])), 'sum') AS DOUBLE) / len(sl) AS inten " +
        "FROM w), " +
        "dd AS (SELECT doc_id, inten - lag(inten) OVER (" +
        "PARTITION BY doc_id ORDER BY fi) AS jump FROM i) " +
        "SELECT doc_id AS media_id, count(*) AS n_frames, " +
        "1 + count(*) FILTER (WHERE abs(jump) > 10) AS n_scenes " +
        "FROM dd GROUP BY 1"),
      (s, d) => {
        import s.implicits._
        mediaTable(s, d)
          .filter(col("meta.mediaType") === "video")
          .mapPartitions { it =>
            it.map { r =>
              // CODE POINTS, not UTF-16 code units: the DuckDB oracle's
              // len/substr/ascii are code-point semantics, so the
              // kernel must share that character model or any
              // non-BMP/non-ASCII text diverges in window position,
              // slice length and intensity
              val cps = new String(r.payload, "UTF-8")
                .codePoints().toArray
              val len = math.max(1, cps.length)
              val nFrames = ((r.meta.durationMs + 999L) / 1000L).toInt
              var prev = 0.0
              var scenes = 1L
              var fi = 0
              while (fi < nFrames) {
                val pos = ((fi.toLong * 17L) % len).toInt
                val end = math.min(pos + 16, cps.length)
                var sum = 0L
                var j = pos
                while (j < end) { sum += cps(j).toLong; j += 1 }
                val inten = sum.toDouble / (end - pos)
                if (fi > 0 && math.abs(inten - prev) > 10.0) scenes += 1
                prev = inten
                fi += 1
              }
              (r.media_id, nFrames.toLong, scenes)
            }
          }
          .toDF("media_id", "n_frames", "n_scenes")
      })
  )
}
