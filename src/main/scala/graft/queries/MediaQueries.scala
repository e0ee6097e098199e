package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{MediaCodecs, Multimodal}

/** Multimodal & container queries (split out of LlmQueries, which had
  * grown past 2,300 lines): the opaque-binary decode/feature plumbing
  * (q36/q52/q63/q71/q124/q141/q170), perceptual fingerprints + banded
  * near-dup (q221–q224), codec dispatch through the FFI seam (q216),
  * audio/image feature extraction (q249/q250/q269–q271), and the
  * round-7 container-walk gates:
  *
  * q324/q325 emit the ID3v2 synchsafe header parse and the ISO-BMFF
  * box walk AS DATA (offsets/sizes/types) and hash-compare them
  * against a SQL respecification. Both engines derive the container
  * bytes from doc_id (the Spark side builds real bytes via hex →
  * unhex and runs the byte-level walk the FFI-seam codecs consume;
  * the oracle recomputes the expected facts from the same generative
  * parameters), so the REAL parsing in MediaCodecs is hash-proven
  * even while lossy payload synthesis stays stubbed behind the seam.
  * Adversarial shapes are data-driven: bad synchsafe high bits, torn
  * tags, torn tail boxes, sub-minimum box sizes.
  */
object MediaQueries extends QueryPack {

  override def defs: Map[String, Q] = Map(


    // Multimodal plumbing: text payloads become opaque binary columns
    // flowing through the partition-batched decode and frame-sampling
    // stubs; the oracle checks the byte/frame accounting (feature
    // vectors are asserted in MultimodalSpec — no SQL form).
    "q36_multimodal" -> Q(
      (s, dir) => {
        val media = Tables.documents(s, dir).select(
          col("doc_id").as("media_id"), lit("text").as("kind"),
          encode(col("text"), "UTF-8").as("bytes"))
        val decoded = Multimodal.decodeFeatures(media)
          .select(col("media_id"), col("n_bytes"))
        val frames = Multimodal.sampleFrames(media, stride = 2)
          .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
        decoded.join(frames, Seq("media_id"), "left")
          .select(col("media_id"), col("n_bytes"),
            coalesce(col("n_frames"), lit(0L)).as("n_frames"))
          .orderBy(col("media_id"))
      },
      // coalesce: null text decodes as 0 bytes / 0 frames on the Spark
      // side (octet_length(encode(NULL)) would be NULL)
      Some("""SELECT doc_id AS media_id,
        |  coalesce(octet_length(encode(text)), 0) AS n_bytes,
        |  (CAST(ceil(coalesce(octet_length(encode(text)), 0) / 256.0) AS BIGINT) + 1) // 2 AS n_frames
        |FROM documents
        |ORDER BY media_id""".stripMargin)),


    // Pluggable-codec dispatch under the oracle gate (the FFI seam,
    // VERDICT r5 item 7): a mixed-modality payload batch — real PNG /
    // WAV containers plus real MP3 (ID3v2 synchsafe) and MP4
    // (ISO-BMFF box walk) container parsing with the lossy decode
    // stubbed behind the per-partition codec lifecycle — routed
    // through the registry. Every metadata field is container math,
    // so the oracle replays the full dispatch table.
    "q216_codec_dispatch" -> Q(
      (s, dir) => graft.operators.MediaCodecs.codecDispatchRoundTrip(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("media_id").as("doc_id"), col("codec"), col("kind"),
          col("width"), col("height"), col("sample_rate"), col("n_frames"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |       WHEN 2 THEN 'mp3_ffi' WHEN 3 THEN 'mp4_ffi'
        |       ELSE 'stub' END AS codec,
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' WHEN 2 THEN 'audio'
        |       WHEN 3 THEN 'video' ELSE 'unknown' END AS kind,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN 8 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN 8 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 5 = 1 THEN 8000
        |            WHEN doc_id % 5 = 2 THEN 44100 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN 1
        |            WHEN doc_id % 5 = 1 THEN 64
        |            WHEN doc_id % 5 = 2 THEN 1 + doc_id % 7
        |            WHEN doc_id % 5 = 3 THEN 1 + doc_id % 3
        |            ELSE 0 END AS BIGINT) AS n_frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin)),


    // Perceptual image fingerprint under the oracle gate: a 9×8
    // near-dup-structured scene PNG is encoded per document, run
    // through the REAL decoder, and dHashed (bit = horizontal
    // gradient direction). PNG is lossless, so the oracle replays
    // hash assembly from the generating formula — a wrong decode or
    // a wrong bit order cannot hash-match. The 64-bit fingerprint is
    // gated as unsigned 32-bit halves: bit 63 would overflow a
    // signed BIGINT built by summing bit·2^k.
    "q221_image_dhash" -> Q(
      (s, dir) => Multimodal.dhashRoundTrip(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("dhash_hi"), col("dhash_lo"))
        .orderBy(col("doc_id")),
      Some("""WITH px AS (
        |  SELECT doc_id, k, k % 8 AS x, k // 8 AS y,
        |    doc_id % 16 AS scene, (doc_id // 16) % 4 AS variant
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS k
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, k,
        |    CASE WHEN
        |      (CASE WHEN y = 0 AND x + 1 < variant
        |            THEN (scene*17 + (x+1)*19 + y*23 + 128) % 256
        |            ELSE (scene*17 + (x+1)*19 + y*23) % 256 END)
        |      >
        |      (CASE WHEN y = 0 AND x < variant
        |            THEN (scene*17 + x*19 + y*23 + 128) % 256
        |            ELSE (scene*17 + x*19 + y*23) % 256 END)
        |    THEN 1 ELSE 0 END AS bit
        |  FROM px)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN k >= 32 THEN bit * (1 << (k - 32)) ELSE 0 END)
        |    AS BIGINT) AS dhash_hi,
        |  CAST(sum(CASE WHEN k < 32 THEN bit * (1 << k) ELSE 0 END)
        |    AS BIGINT) AS dhash_lo
        |FROM b GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)),


    // Image near-dup via banded Hamming over the q221 fingerprints —
    // the multimodal twin of q131's SimHash banding, through the SAME
    // generalized band join (Dedup.hashNearDupPairs): candidates
    // share a verbatim 16-bit band, pairs verify by exact Hamming
    // ≤ 3, and pigeonhole (3 < 4 bands) makes the result EQUAL to
    // the all-pairs predicate the oracle computes quadratically.
    // Same-scene variant pairs land within the bound (≤3 perturbed
    // pixels); cross-scene pairs verify out.
    "q222_image_neardup" -> Q(
      (s, dir) => {
        val fp = Multimodal.dhashRoundTrip(
            Tables.documents(s, dir).select(col("doc_id")), "doc_id")
          .select(col("id").as("doc_id"), col("dhash"))
        graft.operators.Dedup.hashNearDupPairs(
            fp, "doc_id", "dhash", bits = 64, bands = 4, maxHamming = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH px AS (
        |  SELECT doc_id, k, k % 8 AS x, k // 8 AS y,
        |    doc_id % 16 AS scene, (doc_id // 16) % 4 AS variant
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS k
        |        FROM documents)),
        |b AS (
        |  SELECT doc_id, k,
        |    CASE WHEN
        |      (CASE WHEN y = 0 AND x + 1 < variant
        |            THEN (scene*17 + (x+1)*19 + y*23 + 128) % 256
        |            ELSE (scene*17 + (x+1)*19 + y*23) % 256 END)
        |      >
        |      (CASE WHEN y = 0 AND x < variant
        |            THEN (scene*17 + x*19 + y*23 + 128) % 256
        |            ELSE (scene*17 + x*19 + y*23) % 256 END)
        |    THEN 1 ELSE 0 END AS bit
        |  FROM px),
        |h AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN k >= 32 THEN bit * (1 << (k - 32)) ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN k < 32 THEN bit * (1 << k) ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM b GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |  CAST(bit_count(xor(a.hi, c.hi)) + bit_count(xor(a.lo, c.lo))
        |    AS INT) AS hamming
        |FROM h a JOIN h c ON a.doc_id < c.doc_id
        |WHERE bit_count(xor(a.hi, c.hi)) + bit_count(xor(a.lo, c.lo)) <= 3
        |ORDER BY id_a, id_b""".stripMargin)),


    // Acoustic fingerprint under the oracle gate: a near-dup-
    // structured scene WAV is decoded with the REAL JDK codec and
    // envelope-hashed (bit = direction of two-sample energy change —
    // the Shazam-family signal in miniature). PCM is lossless and
    // the energies are integer, so the oracle replays every bit from
    // the sample formula; the same unsigned-half split as q221 keeps
    // bit 63 BIGINT-safe.
    "q223_audio_fingerprint" -> Q(
      (s, dir) => Multimodal.audioFingerprintRoundTrip(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("afp_hi"), col("afp_lo"))
        .orderBy(col("doc_id")),
      Some("""WITH sm AS (
        |  SELECT doc_id, i, i // 2 AS w,
        |    ((doc_id % 16) * 31 + i * 7
        |      + CASE WHEN i < (doc_id // 16) % 4 THEN 31337 ELSE 0 END)
        |      % 65536 - 32768 AS s
        |  FROM (SELECT doc_id, unnest(generate_series(0, 129)) AS i
        |        FROM documents)),
        |e AS (SELECT doc_id, w, CAST(sum(s * s) AS BIGINT) AS en
        |  FROM sm GROUP BY doc_id, w),
        |b AS (
        |  SELECT a.doc_id, a.w AS k,
        |    CASE WHEN c.en > a.en THEN 1 ELSE 0 END AS bit
        |  FROM e a JOIN e c ON c.doc_id = a.doc_id AND c.w = a.w + 1
        |  WHERE a.w < 64)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN k >= 32 THEN bit * (1 << (k - 32)) ELSE 0 END)
        |    AS BIGINT) AS afp_hi,
        |  CAST(sum(CASE WHEN k < 32 THEN bit * (1 << k) ELSE 0 END)
        |    AS BIGINT) AS afp_lo
        |FROM b GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)),


    // Video near-dup by shared frame fingerprints: clips demux
    // through the REAL container parser, every frame decodes through
    // the real PNG codec and dHashes (56 bits on the 8-wide raster),
    // and clips pair by joining on the fingerprint VALUE — the
    // content-addressable join of segment-level text dedup lifted to
    // video, never an all-pairs scan. Consecutive doc_ids share 2 of
    // 3 frames by construction, so the oracle's quadratic replay has
    // real pairs to find.
    "q224_clip_neardup" -> Q(
      (s, dir) => {
        // per-doc frame synthesis + 64-bit fingerprint folds are
        // CPU-dense over a one-split local source — spread (guide §2.2)
        val fp = Multimodal.clipFrameFingerprints(
            graft.operators.Spread.byKey(
              Tables.documents(s, dir).select(col("doc_id")), "doc_id"),
            "doc_id")
          .select(col("id"), col("fp")).distinct()
        val a = fp.select(col("id").as("id_a"), col("fp"))
        val b = fp.select(col("id").as("id_b"), col("fp"))
        a.join(b, Seq("fp"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH fr AS (
        |  SELECT doc_id, doc_id + unnest(generate_series(0, 2)) AS seed
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, seed, k, k % 8 AS x, k // 8 AS y,
        |    seed % 16 AS scene, (seed // 16) % 4 AS variant
        |  FROM (SELECT doc_id, seed, unnest(generate_series(0, 63)) AS k
        |        FROM fr)),
        |b AS (
        |  SELECT doc_id, seed, k,
        |    CASE WHEN
        |      (CASE WHEN y = 0 AND x + 1 < variant
        |            THEN (scene*17 + (x+1)*19 + y*23 + 128) % 256
        |            ELSE (scene*17 + (x+1)*19 + y*23) % 256 END)
        |      >
        |      (CASE WHEN y = 0 AND x < variant
        |            THEN (scene*17 + x*19 + y*23 + 128) % 256
        |            ELSE (scene*17 + x*19 + y*23) % 256 END)
        |    THEN 1 ELSE 0 END AS bit
        |  FROM px),
        |h AS (
        |  SELECT doc_id, seed,
        |    CAST(sum(CASE WHEN k >= 32 THEN bit * (1 << (k - 32)) ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN k < 32 THEN bit * (1 << k) ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM b GROUP BY doc_id, seed),
        |d AS (SELECT DISTINCT doc_id, hi, lo FROM h)
        |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM d a JOIN d c
        |  ON a.hi = c.hi AND a.lo = c.lo AND a.doc_id < c.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin)),


    // REAL image decode under the oracle gate: a deterministic 8×8
    // grayscale PNG is encoded per document (ingest stand-in), decoded
    // with javax.imageio inside the partition pass, and the decoder's
    // ACTUAL output histogram is compared to the pixel formula the
    // oracle recomputes in SQL — PNG is lossless, so a wrong decode
    // cannot hash-match. The stub path stays for codec-less kinds.
    "q52_png_decode" -> Q(
      (s, dir) => Multimodal.pngRoundTripFeatures(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          posexplode(col("hist")).as(Seq("bucket", "share")))
        .orderBy(col("doc_id"), col("bucket")),
      Some("""WITH px AS (
        |  SELECT doc_id, CAST(((doc_id * 31 + i) % 256) // 16 AS INT) AS b
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS i FROM documents)),
        |cnt AS (SELECT doc_id, b, count(*) AS c FROM px GROUP BY 1, 2),
        |bk AS (SELECT doc_id, CAST(unnest(generate_series(0, 15)) AS INT) AS bucket FROM documents)
        |SELECT bk.doc_id, 8 AS width, 8 AS height, bk.bucket,
        |  coalesce(c, 0) / 64.0 AS share
        |FROM bk LEFT JOIN cnt ON cnt.doc_id = bk.doc_id AND cnt.b = bk.bucket
        |ORDER BY bk.doc_id, bk.bucket""".stripMargin)),


    // Video→frames→patches E2E: real container demux, real per-frame
    // decode, patch tokenization — the full multimodal ingest chain,
    // with every pixel of every frame recomputed by the oracle from
    // the frame-seed formula (frame f of clip d is the seed-(d+f)
    // image).
    "q412_clip_patches" -> Q(
      (s, dir) => Multimodal.clipPatchGrid(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id",
          nFrames = 2, patch = 4)
        .select(col("id").as("doc_id"), col("frame_idx"),
          col("patch_row"), col("patch_col"), col("px_sum"))
        .orderBy(col("doc_id"), col("frame_idx"), col("patch_row"),
          col("patch_col")),
      Some("""WITH px AS (
        |  SELECT doc_id, f, i // 8 AS x, i % 8 AS y,
        |    ((doc_id + f) * 31 + i) % 256 AS v
        |  FROM (SELECT doc_id, unnest([0, 1]) AS f FROM documents)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i))
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(y // 4 AS BIGINT) AS patch_row,
        |  CAST(x // 4 AS BIGINT) AS patch_col,
        |  CAST(sum(v) AS BIGINT) AS px_sum
        |FROM px GROUP BY 1, 2, 3, 4
        |ORDER BY doc_id, frame_idx, patch_row, patch_col""".stripMargin)),

    // Per-frame audio VAD features over real PCM decode: energy
    // (Σ sample², exact long) + zero-crossing count per 16-sample
    // frame, with the voiced verdict — the speech/noise triage before
    // ASR. Oracle recomputes the decoder's sample values from the
    // synthesis formula (q249 discipline).
    "q411_wav_vad_frames" -> Q(
      (s, dir) => Multimodal.wavFrameFeatures(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id",
          frame = 16, minEnergy = 8000000000L, maxCrossings = 6L)
        .select(col("id").as("doc_id"), col("frame_idx"),
          col("energy"), col("n_crossings"), col("voiced"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH s AS (
        |  SELECT doc_id, i,
        |    ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS i
        |        FROM documents)),
        |f AS (SELECT doc_id, i, v, i // 16 AS frame_idx,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv,
        |    i % 16 AS o
        |  FROM s),
        |g AS (SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |    CAST(sum(v * v) AS BIGINT) AS energy,
        |    CAST(sum(CASE WHEN o > 0 AND (v >= 0) <> (pv >= 0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings
        |  FROM f GROUP BY 1, 2)
        |SELECT doc_id, frame_idx, energy, n_crossings,
        |  energy >= 8000000000 AND n_crossings <= 6 AS voiced
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin)),

    // ViT-style patch tokenization under the oracle gate: the decoded
    // 8×8 PNG splits into 2×2 patches with exact integer intensity
    // stats per tile — the decode→patch pass a vision pipeline runs
    // before embedding, with the REAL JDK decoder's pixel values
    // recomputed by the oracle from the synthesis formula.
    "q410_png_patches" -> Q(
      (s, dir) => Multimodal.pngPatchGrid(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id",
          patch = 2)
        .orderBy(col("id"), col("patch_row"), col("patch_col")),
      Some("""WITH px AS (
        |  SELECT doc_id, i // 8 AS x, i % 8 AS y,
        |    (doc_id * 31 + i) % 256 AS v
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS i
        |        FROM documents))
        |SELECT doc_id AS id,
        |  CAST(y // 2 AS BIGINT) AS patch_row,
        |  CAST(x // 2 AS BIGINT) AS patch_col,
        |  CAST(sum(v) AS BIGINT) AS px_sum,
        |  CAST(min(v) AS BIGINT) AS px_min,
        |  CAST(max(v) AS BIGINT) AS px_max
        |FROM px GROUP BY 1, 2, 3
        |ORDER BY id, patch_row, patch_col""".stripMargin)),

    // REAL pixel resize under the oracle gate: decode the q52 PNG and
    // nearest-neighbor resample 8×8 → 4×4 — on a lossless codec the
    // output pixels are exactly the source pixels at the sampled
    // coordinates, so the oracle replays the resample from the
    // generating formula: v(x, y) = (doc_id·31 + 2x·8 + 2y) mod 256.
    "q170_png_resize" -> Q(
      (s, dir) => Multimodal.pngResizeRoundTrip(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id",
          outW = 4, outH = 4)
        .select(col("id").as("doc_id"), col("x"), col("y"), col("v"))
        .orderBy(col("doc_id"), col("x"), col("y")),
      Some("""WITH xs AS (SELECT doc_id, unnest(generate_series(0, 3)) AS x
        |  FROM documents),
        |px AS (SELECT doc_id, x, unnest(generate_series(0, 3)) AS y FROM xs)
        |SELECT doc_id, CAST(x AS INT) AS x, CAST(y AS INT) AS y,
        |  CAST((doc_id * 31 + (x * 2) * 8 + y * 2) % 256 AS INT) AS v
        |FROM px
        |ORDER BY doc_id, x, y""".stripMargin)),


    // REAL JPEG decode under the oracle gate: a flat grayscale JPEG
    // (quality 1.0) is encoded per document and decoded with the JDK's
    // actual JPEG codec — the one lossy-image class with an EXACT
    // oracle (constant block ⇒ DC-only ⇒ unit quant tables round-trip
    // it bit-exactly; see Multimodal.syntheticJpeg). Textured payloads
    // are bounded-error and spec-gated in MultimodalSpec instead.
    "q124_jpeg_decode" -> Q(
      (s, dir) => Multimodal.jpegRoundTripStats(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("px_min"), col("px_max"), col("px_sum"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 8 AS width, 8 AS height,
        |  (doc_id * 31) % 256 AS px_min,
        |  (doc_id * 31) % 256 AS px_max,
        |  64 * ((doc_id * 31) % 256) AS px_sum
        |FROM documents
        |ORDER BY doc_id""".stripMargin)),


    // REAL GIF decode through the JDK's palette codec: a TEXTURED
    // ramp raster (LZW is lossless, so non-constant pixels round-trip
    // exactly, unlike the JPEG flat-field constraint) against the
    // generating formula replayed per pixel via generate_series.
    "q141_gif_decode" -> Q(
      (s, dir) => Multimodal.gifRoundTripStats(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("px_min"), col("px_max"), col("px_sum"))
        .orderBy(col("doc_id")),
      Some("""WITH px AS (
        |  SELECT doc_id, ((doc_id * 31) + k) % 256 AS p
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS k
        |        FROM documents))
        |SELECT doc_id, 8 AS width, 8 AS height,
        |  CAST(min(p) AS BIGINT) AS px_min,
        |  CAST(max(p) AS BIGINT) AS px_max,
        |  CAST(sum(p) AS BIGINT) AS px_sum
        |FROM px GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)),


    // REAL audio decode through the JDK's WAV codec
    // (javax.sound.sampled): encode a deterministic 16-bit PCM payload
    // per document, decode it back, and gate the decoder's integer
    // sample stats against the generating formula. The audio analog of
    // q52 — the video modality remains the labeled stub.
    "q63_wav_decode" -> Q(
      (s, dir) => Multimodal.wavRoundTripStats(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("sample_rate"),
          col("n_samples"), col("s_min"), col("s_max"), col("s_sum"),
          col("s_sum_sq"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 8000 AS sample_rate, 64 AS n_samples,
        |  min(s) AS s_min, max(s) AS s_max,
        |  CAST(sum(s) AS BIGINT) AS s_sum,
        |  CAST(sum(s * s) AS BIGINT) AS s_sum_sq
        |FROM (SELECT doc_id, ((doc_id * 31 + i * 7) % 65536) - 32768 AS s
        |      FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS i
        |            FROM documents))
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)),


    // Video path: demux a framed clip container (every 2nd of 3
    // frames) and run each sampled frame through the REAL PNG decoder
    // — container parsing + per-frame pixel decode gated against the
    // per-frame pixel formula. Completes the multimodal triad
    // (q52 image, q63 audio, q71 video frames).
    "q71_clip_frames" -> Q(
      (s, dir) => Multimodal.clipRoundTripFrames(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("frame_idx"), col("width"),
          col("height"), posexplode(col("hist")).as(Seq("bucket", "share")))
        .orderBy(col("doc_id"), col("frame_idx"), col("bucket")),
      Some("""WITH f AS (
        |  SELECT doc_id, CAST(unnest([0, 2]) AS INT) AS frame_idx
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, frame_idx,
        |         CAST((((doc_id + frame_idx) * 31 + i) % 256) // 16 AS INT) AS b
        |  FROM (SELECT doc_id, frame_idx,
        |          unnest(generate_series(0, 63)) AS i FROM f)),
        |cnt AS (SELECT doc_id, frame_idx, b, count(*) AS c
        |        FROM px GROUP BY 1, 2, 3),
        |bk AS (SELECT doc_id, frame_idx,
        |         CAST(unnest(generate_series(0, 15)) AS INT) AS bucket
        |       FROM f)
        |SELECT bk.doc_id, bk.frame_idx, 8 AS width, 8 AS height,
        |  bk.bucket, coalesce(c, 0) / 64.0 AS share
        |FROM bk LEFT JOIN cnt
        |  ON cnt.doc_id = bk.doc_id AND cnt.frame_idx = bk.frame_idx
        |  AND cnt.b = bk.bucket
        |ORDER BY bk.doc_id, bk.frame_idx, bk.bucket""".stripMargin)),


    // Silence segmentation over the REAL JDK WAV decode: runs of
    // |sample| < 8192 at least 2 long, per doc — counts, longest run,
    // first start. The oracle replays the synthetic sample formula as
    // a gaps-and-islands SQL, so the gate pins the decoder AND the
    // run-length logic in exact integers (the q63 discipline).
    "q249_wav_silence" -> Q(
      (s, dir) => Multimodal.silenceSegments(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id",
          threshold = 8192, minRun = 2)
        .select(col("id").as("doc_id"), col("n_samples"),
          col("n_silent"), col("n_runs"), col("max_run"),
          col("first_start"))
        .orderBy(col("doc_id")),
      Some("""WITH s AS (
        |  SELECT doc_id, i,
        |    ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS i
        |        FROM documents)),
        |g AS (
        |  SELECT doc_id, i,
        |    i - row_number() OVER (PARTITION BY doc_id
        |      ORDER BY i) AS grp
        |  FROM s WHERE abs(v) < 8192),
        |runs AS (
        |  SELECT doc_id, min(i) AS start_i, count(*) AS len
        |  FROM g GROUP BY doc_id, grp),
        |q AS (
        |  SELECT doc_id, count(*) AS n_runs,
        |    CAST(sum(len) AS BIGINT) AS n_silent,
        |    max(len) AS max_run, min(start_i) AS first_start
        |  FROM runs WHERE len >= 2 GROUP BY doc_id)
        |SELECT d.doc_id, CAST(64 AS BIGINT) AS n_samples,
        |  coalesce(n_silent, 0) AS n_silent,
        |  coalesce(n_runs, 0) AS n_runs,
        |  coalesce(max_run, 0) AS max_run,
        |  coalesce(first_start, -1) AS first_start
        |FROM documents d LEFT JOIN q ON d.doc_id = q.doc_id
        |ORDER BY d.doc_id""".stripMargin)),


    // PNG metadata round trip: two provenance tEXt chunks spliced
    // into each synthetic PNG (computed CRC, before IEND) and
    // recovered by walking the real chunk layout — plus IHDR
    // width/height read from the container bytes. The oracle states
    // the closed-form truth; a green hash means the writer and the
    // independent reader agree on the actual PNG byte format.
    "q250_png_metadata" -> Q(
      (s, dir) => Multimodal.pngMetadataRoundTrip(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("chunk_key"), col("chunk_value"))
        .orderBy(col("doc_id"), col("chunk_key")),
      Some("""SELECT doc_id, CAST(8 AS INT) AS width,
        |  CAST(8 AS INT) AS height, k AS chunk_key,
        |  CASE k WHEN 'Comment' THEN 'doc-' || doc_id
        |         ELSE 'synthetic-' || (doc_id % 10) END AS chunk_value
        |FROM documents
        |CROSS JOIN (SELECT unnest(['Comment', 'Source']) AS k)
        |ORDER BY doc_id, chunk_key""".stripMargin)),


    // Histogram equalization over the REAL PNG decode: the discrete
    // integer transform e(v) = ((cdf(v)−cdf_min)·255) div (n−cdf_min)
    // replayed from the pixel formula — contrast normalization as an
    // exactly-gated codec-loop op.
    "q269_hist_equalize" -> Q(
      (s, dir) => Multimodal.equalizeStats(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("n_levels_in"),
          col("n_levels_out"), col("eq_min"), col("eq_max"),
          col("eq_sum"))
        .orderBy(col("doc_id")),
      Some("""WITH px AS (
        |  SELECT doc_id, ((doc_id * 31 + k) % 256) AS v
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS k
        |        FROM documents)),
        |h AS (SELECT doc_id, v, count(*) AS c FROM px GROUP BY 1, 2),
        |cd AS (
        |  SELECT doc_id, v, c,
        |    CAST(sum(c) OVER (PARTITION BY doc_id ORDER BY v)
        |      AS BIGINT) AS cdf
        |  FROM h),
        |cm AS (SELECT doc_id, min(cdf) AS cdf_min FROM cd GROUP BY 1),
        |e AS (
        |  SELECT cd.doc_id, v, c,
        |    ((cdf - cdf_min) * 255) // (64 - cdf_min) AS eq
        |  FROM cd JOIN cm ON cd.doc_id = cm.doc_id)
        |SELECT doc_id, count(*) AS n_levels_in,
        |  CAST(count(DISTINCT eq) AS BIGINT) AS n_levels_out,
        |  min(eq) AS eq_min, max(eq) AS eq_max,
        |  CAST(sum(eq * c) AS BIGINT) AS eq_sum
        |FROM e GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)),


    // Decimate-by-2 resampling over the REAL WAV decode: paired-
    // sample means in truncating integer division (Java / ≡ DuckDB
    // //), stats replayed from the sample formula.
    "q270_audio_decimate" -> Q(
      (s, dir) => Multimodal.decimateStats(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("id").as("doc_id"), col("n_out"), col("d_min"),
          col("d_max"), col("d_sum"))
        .orderBy(col("doc_id")),
      Some("""WITH s AS (
        |  SELECT doc_id, i,
        |    ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
        |  FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS i
        |        FROM documents)),
        |p AS (
        |  SELECT doc_id, i // 2 AS j,
        |    CAST(sum(v) AS BIGINT) // 2 AS d
        |  FROM s GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_out, min(d) AS d_min,
        |  max(d) AS d_max, CAST(sum(d) AS BIGINT) AS d_sum
        |FROM p GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)),


    // Keyframe detection: consecutive-frame L1 pixel-diff energy over
    // the demuxed clip's REAL per-frame decodes; cut flagged above
    // 3000 (base ramp diff is 64·31 = 1984; mod-256 wraps add 194
    // per wrapped pixel). Exact integers end to end.
    "q271_keyframes" -> Q(
      (s, dir) => Multimodal.keyframeStats(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id",
          nFrames = 3, threshold = 3000L)
        .select(col("id").as("doc_id"), col("frame_idx"),
          col("diff_sum"), col("is_keyframe"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH px AS (
        |  SELECT doc_id, f, k,
        |    (((doc_id + f) * 31 + k) % 256) AS a,
        |    (((doc_id + f + 1) * 31 + k) % 256) AS b
        |  FROM (SELECT doc_id, unnest([0, 1]) AS f FROM documents)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS k))
        |SELECT doc_id, CAST(f + 1 AS INT) AS frame_idx,
        |  CAST(sum(abs(a - b)) AS BIGINT) AS diff_sum,
        |  CAST(sum(abs(a - b)) AS BIGINT) > 3000 AS is_keyframe
        |FROM px GROUP BY 1, 2
        |ORDER BY doc_id, frame_idx""".stripMargin)),


    // ID3v2 synchsafe walk: header facts per payload. doc_id % 11
    // plants a synchsafe high bit (parse must reject), doc_id % 13
    // tears the tag (body_len goes NEGATIVE and frames null) — both
    // engines agree on every fact or the hash breaks.
    "q324_id3_walk" -> Q(
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id"))
          .withColumn("tag_len", expr("doc_id % 300"))
          .withColumn("bad", expr("doc_id % 11 = 0"))
          .withColumn("torn", expr("doc_id % 13 = 0"))
          .withColumn("fill", expr(
            "CASE WHEN torn THEN tag_len div 2 " +
              "ELSE tag_len + (doc_id % 7) * 417 + doc_id % 100 END"))
          .withColumn("b0", expr(
            "CASE WHEN bad THEN tag_len % 128 + 128 ELSE tag_len % 128 END"))
          .withColumn("hex", expr(
            "concat('494433030000', " +
              "format_string('%02x%02x%02x%02x', " +
              "int((tag_len div 2097152) % 128), int((tag_len div 16384) % 128), " +
              "int((tag_len div 128) % 128), int(b0)), " +
              "repeat('00', int(fill)))"))
          .select(col("doc_id").as("media_id"), unhex(col("hex")).as("bytes"))
        MediaCodecs.id3Walk(media).orderBy(col("media_id"))
      },
      Some("""WITH p AS (
        |  SELECT doc_id, doc_id % 300 AS tag_len,
        |    doc_id % 11 = 0 AS bad,
        |    CASE WHEN doc_id % 13 = 0 THEN (doc_id % 300) // 2
        |         ELSE doc_id % 300 + (doc_id % 7) * 417 + doc_id % 100
        |    END AS fill
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  NOT bad AS synch_ok,
        |  CASE WHEN bad THEN NULL ELSE tag_len END AS tag_len,
        |  CASE WHEN bad THEN NULL ELSE fill - tag_len END AS body_len,
        |  CASE WHEN bad OR fill - tag_len < 0 THEN NULL
        |       ELSE (fill - tag_len) // 417 END AS n_frames
        |FROM p ORDER BY media_id""".stripMargin)),

    // ISO-BMFF box walk: one row per WELL-FORMED box with exact
    // (offset, size, type). doc_id % 11 appends a size-4 box and
    // doc_id % 5 a size-100 header with 8 bytes present — the walk
    // must truncate at both without emitting the torn box.
    "q325_bmff_walk" -> Q(
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id"))
          .withColumn("k", expr("1 + doc_id % 3"))
          .withColumn("pay", expr("8 + doc_id % 5"))
          .withColumn("hasfree", expr("doc_id % 7 = 0"))
          .withColumn("tail", expr(
            "CASE WHEN doc_id % 11 = 0 THEN '0000000466726565' " +
              "WHEN doc_id % 5 = 0 THEN '000000646d646174' ELSE '' END"))
          .withColumn("hex", expr(
            "concat('0000001066747970', repeat('00', 8), " +
              "CASE WHEN hasfree THEN concat('0000000c66726565', repeat('00', 4)) ELSE '' END, " +
              "repeat(concat(format_string('%08x', int(8 + pay)), '6d646174', " +
              "repeat('00', int(pay))), int(k)), tail)"))
          .select(col("doc_id").as("media_id"), unhex(col("hex")).as("bytes"))
        MediaCodecs.bmffWalk(media)
          .orderBy(col("media_id"), col("box_idx"))
      },
      Some("""WITH p AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS k, 8 + doc_id % 5 AS pay,
        |    doc_id % 7 = 0 AS hasfree
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, 0 AS box_idx, 0 AS box_off, 16 AS box_size,
        |    'ftyp' AS box_type FROM p
        |  UNION ALL
        |  SELECT doc_id, 1, 16, 12, 'free' FROM p WHERE hasfree
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN hasfree THEN 2 ELSE 1 END + i,
        |    16 + CASE WHEN hasfree THEN 12 ELSE 0 END + i * (8 + pay),
        |    8 + pay, 'mdat'
        |  FROM (SELECT doc_id, pay, hasfree, unnest(range(0, k)) AS i FROM p))
        |SELECT doc_id AS media_id, CAST(box_idx AS BIGINT) AS box_idx,
        |  CAST(box_off AS BIGINT) AS box_off,
        |  CAST(box_size AS BIGINT) AS box_size, box_type
        |FROM f ORDER BY media_id, box_idx""".stripMargin)),

    // TIFF/EXIF IFD walk as data — third container format of the
    // family: little-endian header, chained IFDs of 12-byte entries.
    // Shapes: torn entry table (%11: claims n entries, ships n−1 →
    // whole IFD dropped), chained second IFD (%3), next-pointer past
    // EOF (%13: IFD0 parses, chain stops). The Spark side BUILDS real
    // bytes (hex→unhex) and runs the byte walk the codec uses; the
    // oracle recomputes expected entries from the generator.
    "q357_tiff_walk" -> Q(
      (s, dir) => {
        def b2(c: org.apache.spark.sql.Column) = format_string("%02x%02x",
          (c % 256).cast("int"), ((c / 256).cast("long") % 256).cast("int"))
        def b4(c: org.apache.spark.sql.Column) =
          concat(b2(c % 65536), b2((c / 65536).cast("long")))
        val d = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("n", (lit(2) + col("doc_id") % 3).cast("long"))
          .withColumn("torn", col("doc_id") % 11 === 0)
          .withColumn("two", col("doc_id") % 11 =!= 0 &&
            col("doc_id") % 3 === 0)
          .withColumn("past", col("doc_id") % 11 =!= 0 &&
            col("doc_id") % 3 =!= 0 && col("doc_id") % 13 === 0)
        val entry = (j: org.apache.spark.sql.Column) => concat(
          b2(lit(256L) + j), b2(lit(3L) + j % 2), b4(lit(1L)),
          b4((col("doc_id") * 7 + j) % 65536))
        val entriesHex = (upto: org.apache.spark.sql.Column) =>
          array_join(transform(sequence(lit(0L), upto), entry), "")
        val nextOff = lit(8L) + 2L + col("n") * 12 + 4L
        val hex = concat(lit("49492a0008000000"), b2(col("n")),
          when(col("torn"), entriesHex(col("n") - 2)) // n−1 entries
            .otherwise(concat(
              entriesHex(col("n") - 1),
              when(col("two"), concat(b4(nextOff),
                // IFD1: one entry (tag 513, type 4, cnt 1, value id%1000)
                lit("0100"), b2(lit(513L)), b2(lit(4L)), b4(lit(1L)),
                b4(col("doc_id") % 1000), b4(lit(0L))))
                .when(col("past"), b4(lit(99999L)))
                .otherwise(b4(lit(0L))))))
        val media = d.select(col("doc_id").as("media_id"),
          unhex(hex).as("bytes"))
        MediaCodecs.tiffWalk(media)
          .orderBy(col("media_id"), col("ifd_idx"), col("entry_idx"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS n FROM documents
        |  WHERE doc_id % 11 <> 0),
        |e0 AS (
        |  SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS ifd_idx,
        |    CAST(j AS BIGINT) AS entry_idx,
        |    CAST(256 + j AS BIGINT) AS tag,
        |    CAST(3 + j % 2 AS BIGINT) AS ftype,
        |    CAST(1 AS BIGINT) AS cnt,
        |    CAST((doc_id * 7 + j) % 65536 AS BIGINT) AS value
        |  FROM (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS j
        |        FROM d)),
        |e1 AS (
        |  SELECT doc_id AS media_id, CAST(1 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(513 AS BIGINT), CAST(4 AS BIGINT), CAST(1 AS BIGINT),
        |    CAST(doc_id % 1000 AS BIGINT)
        |  FROM d WHERE doc_id % 3 = 0)
        |SELECT * FROM (SELECT * FROM e0 UNION ALL SELECT * FROM e1)
        |ORDER BY media_id, ifd_idx, entry_idx""".stripMargin))
  )
}
