package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft

/** Multimodal-column plumbing beyond q26's metadata stub: the Spark-side
  * shapes a training pipeline needs for image/audio/video payloads held as
  * opaque binary columns, running REAL codecs (JDK built-ins — the only
  * media libraries this container carries: javax.imageio PNG,
  * javax.sound.sampled PCM WAV). Every kernel here consumes an actual
  * encoded payload: the image queries synthesize a deterministic image
  * per document, ENCODE it to real PNG bytes (the opaque binary column a
  * pipeline stores), then the kernel under test DECODES those bytes back
  * to pixels before featurizing/resizing. PNG and PCM WAV are lossless,
  * so every oracle re-derives the expected output from the pixel/sample
  * FORMULA alone — the decode arithmetic is verified exactly, with no
  * codec on the oracle side and no fixture.
  *
  * Scale: all ops are embarrassingly parallel over the payload column —
  * mapPartitions batch iterators, no shuffle at all until a downstream
  * aggregation; frame explosion multiplies rows partition-locally exactly
  * like a real frame sampler feeding a vision encoder. At 100 TB the cost
  * IS the codec (CPU-bound, linear in payloads); a production swap
  * replaces the synthetic-payload `synthPng` call with the stored binary
  * column and changes nothing downstream.
  */
object Multimodal {
  import Relational.Q

  private def payloads(s: SparkSession, d: String) =
    Graft.table(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Doc-id input stream for the codec kernels, spread to the cluster's
    * parallelism when the scan produced fewer splits (r12): the codec
    * cost is per ROW and invisible to input-split sizing, so a
    * one-small-file corpus put the ENTIRE decode workload on one task
    * (measured: q46/q101/q278 each ran as a single ~1.2 s task at sf0.1
    * with 31 cores idle — guide §2.5 input skew). A no-op whenever the
    * scan is already at least core-parallel (the 100 TB case); what the
    * round-robin exchange moves is doc_id longs, never payloads.
    */
  private def kernelIds(s: SparkSession, d: String) = {
    import s.implicits._
    val ids = Graft.table(s, d, "documents").select(col("doc_id")).as[Long]
    val p = s.sparkContext.defaultParallelism
    if (ids.rdd.getNumPartitions < p) ids.repartition(p) else ids
  }

  /** Deterministic 32x32 RGB image for a document — each channel an
    * integer formula of (doc_id, x, y) — encoded to REAL PNG bytes: the
    * binary image column the decode kernels consume. Formula shared by
    * q46/q101/q278 and re-derived by their oracles (PNG is lossless).
    */
  private[operators] def synthPng(id: Long, w: Int): Array[Byte] = {
    // ImageIO defaults to DISK-backed stream caching — a temp file per
    // encode/decode, which at millions of tiny payloads turns a CPU
    // kernel into an I/O workload. Memory caching is the right mode for
    // byte-array round-trips; the setter is an idempotent JVM-global.
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      w, w, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < w) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The real decode step: PNG bytes -> pixels (javax.imageio), loud on a
    * torn payload.
    */
  private[operators] def decodePng(png: Array[Byte], w: Int, id: Long)
      : java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false) // see synthPng — a stored-
    // column pipeline enters here without synthesizing first
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(dec != null && dec.getWidth == w && dec.getHeight == w,
      s"PNG decode failed for doc $id")
    dec
  }

  // ---------------------------------------------------------------- q45
  /** Frame sampling: one row per fixed-stride frame of each payload
    * (video frame-sample / audio windowing shape). Pure column ops —
    * sequence + transform + explode — so the planner sees through it.
    */
  val q45: Q = (s, d) =>
    payloads(s, d)
      .select(col("doc_id"), length(col("payload")).as("len"))
      .where(col("len") > 0)
      .select(col("doc_id"), col("len"),
        explode(expr("sequence(0, cast((len - 1) div 256 as int))")).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("frame_idx") * 256).cast("long").as("frame_offset"),
        least(lit(256), col("len") - col("frame_idx") * 256).cast("long").as("frame_len"))
      .orderBy("doc_id", "frame_idx")

  val q45Sql: String =
    """SELECT doc_id, frame_idx,
      |  CAST(frame_idx * 256 AS BIGINT) AS frame_offset,
      |  CAST(LEAST(256, length(text) - frame_idx * 256) AS BIGINT) AS frame_len
      |FROM (
      |  SELECT doc_id, text, UNNEST(range(0, ((length(text) - 1) // 256) + 1)) AS frame_idx
      |  FROM documents WHERE length(text) > 0
      |)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Batched decode + featurize over REAL PNG payloads: the mapInPandas
    * feature-extractor shape — one iterator pass per partition, each
    * document's binary image column (a real PNG, synthesized by
    * [[synthPng]]) DECODED back to pixels (javax.imageio) and reduced to
    * a fixed-width feature vector (per-channel sums + a position-weighted
    * luminance term — a transposed or re-ordered pixel fails the gate)
    * plus the 4x-thumbnail dims taken from the DECODED geometry. PNG is
    * lossless, so the oracle re-derives every feature from the pixel
    * formula with no codec — the decode + featurize arithmetic is
    * verified exactly. (Until r10 this kernel featurized the raw payload
    * bytes with the codec stubbed; q278 proved the real-codec shape and
    * this query now runs it.)
    */
  val q46: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    kernelIds(s, d)
      .mapPartitions { it =>
        val W = 32
        it.map { id =>
          val png = synthPng(id, W) // the stored binary image column
          val dec = decodePng(png, W, id) // the kernel under test
          var rs = 0L; var gs = 0L; var bs = 0L; var wl = 0L
          var y = 0
          while (y < W) {
            var x = 0
            while (x < W) {
              val p = dec.getRGB(x, y)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
              rs += r; gs += g; bs += b
              wl += (y * W + x + 1).toLong * (r + g + b)
              x += 1
            }
            y += 1
          }
          (id, rs.toDouble, gs.toDouble, bs.toDouble, wl.toDouble,
            dec.getWidth / 4, dec.getHeight / 4)
        }
      }
      .toDF("doc_id", "f0", "f1", "f2", "f3", "thumb_w", "thumb_h")
      .orderBy("doc_id")
  }

  val q46Sql: String =
    """WITH px AS (
      |  SELECT d.doc_id, g.x, g.y,
      |    ((d.doc_id * 31 + g.x * 7 + g.y * 13) % 256) AS r,
      |    ((d.doc_id * 17 + g.x * 11 + g.y * 3) % 256) AS g2,
      |    ((d.doc_id * 23 + g.x * 5 + g.y * 19) % 256) AS b
      |  FROM (SELECT doc_id FROM documents) d
      |  CROSS JOIN (
      |    SELECT x.x, y.y
      |    FROM (SELECT UNNEST(range(0, 32)) AS x) x,
      |         (SELECT UNNEST(range(0, 32)) AS y) y) g)
      |SELECT doc_id,
      |  CAST(sum(r) AS DOUBLE) AS f0,
      |  CAST(sum(g2) AS DOUBLE) AS f1,
      |  CAST(sum(b) AS DOUBLE) AS f2,
      |  CAST(sum((y * 32 + x + 1) * (r + g2 + b)) AS DOUBLE) AS f3,
      |  CAST(8 AS INT) AS thumb_w, CAST(8 AS INT) AS thumb_h
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q101
  /** Batched nearest-neighbor resize over REAL PNG payloads: decode the
    * document's PNG (javax.imageio) and take every 4th pixel in each
    * axis — the stride-pick resize kernel an image-preprocessing stage
    * runs when bilinear (q278's kernel) is overkill. Emits the decoded
    * pixel count, the stride, the thumbnail pixel count, and an integer
    * checksum + position-weighted sum of the PICKED pixels, so the
    * oracle gate verifies which exact pixels the kernel sampled, not
    * just row counts. Embarrassingly parallel, no shuffle until the
    * final order. (Until r10 this kernel strided raw payload bytes with
    * the codec stubbed; it now consumes the real decode.)
    */
  val q101: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    kernelIds(s, d)
      .mapPartitions { it =>
        val W = 32
        val S = 4
        it.map { id =>
          val dec = decodePng(synthPng(id, W), W, id)
          var checksum = 0L
          var wsum = 0L
          var n = 0L
          var oy = 0
          while (oy < W / S) {
            var ox = 0
            while (ox < W / S) {
              val p = dec.getRGB(S * ox, S * oy)
              val v = ((p >> 16) & 0xff).toLong * 65536L +
                ((p >> 8) & 0xff).toLong * 256L + (p & 0xff).toLong
              checksum += v
              wsum += (oy * (W / S) + ox + 1).toLong * v
              n += 1
              ox += 1
            }
            oy += 1
          }
          (id, (W * W).toLong, S, n, checksum, wsum)
        }
      }
      .toDF("doc_id", "orig_px", "stride", "out_px", "checksum", "wsum")
      .orderBy("doc_id")
  }

  val q101Sql: String =
    """WITH px AS (
      |  SELECT d.doc_id, g.ox, g.oy,
      |    ((d.doc_id * 31 + (4 * g.ox) * 7 + (4 * g.oy) * 13) % 256) AS r,
      |    ((d.doc_id * 17 + (4 * g.ox) * 11 + (4 * g.oy) * 3) % 256) AS g2,
      |    ((d.doc_id * 23 + (4 * g.ox) * 5 + (4 * g.oy) * 19) % 256) AS b
      |  FROM (SELECT doc_id FROM documents) d
      |  CROSS JOIN (
      |    SELECT ox.ox, oy.oy
      |    FROM (SELECT UNNEST(range(0, 8)) AS ox) ox,
      |         (SELECT UNNEST(range(0, 8)) AS oy) oy) g)
      |SELECT doc_id, CAST(1024 AS BIGINT) AS orig_px, CAST(4 AS INT) AS stride,
      |  COUNT(*) AS out_px,
      |  CAST(sum(r * 65536 + g2 * 256 + b) AS BIGINT) AS checksum,
      |  CAST(sum((oy * 8 + ox + 1) * (r * 65536 + g2 * 256 + b)) AS BIGINT) AS wsum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q120
  /** Perceptual-hash near-dup candidates over binary payloads — image
    * dedup's standard shape (compact perceptual signature → Hamming-band
    * candidate join), run on the stub payloads: the signature is a
    * 64-bucket CHARACTER-BIGRAM histogram hash over the payload's
    * code points (= its bytes on this ASCII corpus; a real image tier
    * hashes decoded pixels — exactly what q46/q101/q278 decode) with
    * bit i = bucket i above the uniform mean — the histogram-family
    * perceptual hash; a positional aHash needs spatially-aligned
    * inputs, which images have and shuffled text deliberately doesn't.
    * The candidate join is q21's
    * pigeonhole-complete 4×16 banding at Hamming ≤ 2. Like every real
    * perceptual-hash tier this is CANDIDATE GENERATION — recall-oriented
    * with some false positives — and a downstream exact verify (q19/q20's
    * shape) owns precision.
    *
    * Exactness: the mean comparison is cross-multiplied into INTEGER
    * arithmetic (bucket_count · 64 > total_bigrams), so the signature is
    * engine-exact and the WHOLE operator — signature included — is
    * re-derived relationally by the DuckDB oracle with no fixture.
    *
    * Shape (r12): the signature is ONE codegen'd row-local pass
    * (`char_bigram_phash` — histogram + integer mean test in a local
    * array), so nothing document-sized ever shuffles; banding, the
    * candidate join, and the pair distinct all run on signature-sized
    * data. The oracle still re-derives the signature relationally
    * (explode → counts → mean test), so the kernel is independently
    * verified with no fixture.
    */
  val q120: Q = (s, d) => {
    // r12: the ENTIRE signature is row-local — `char_bigram_phash` is
    // one codegen'd pass over the text (histogram + integer mean test in
    // a local int[64]), null for <2-positive-code-point docs (the old
    // `size(codes) > 1` gate). The previous formulation composed the
    // histogram relationally (explode → tot/st aggregations → join →
    // re-aggregate): three corpus-sized exchanges, and the interpreted
    // higher-order bigram chain evaluated FOUR times over the corpus in
    // the plan (both join sides × both aggregations) — its two 1-task
    // stages were q120's top CPU in the round-12 baseline profile. At
    // 100 TB this is strictly better: payload text is read once per join
    // side and only signature-sized rows ever shuffle.
    val sigs = Graft.table(s, d, "documents")
      .select(col("doc_id"),
        graft.functions.char_bigram_phash(col("text"), 64).as("phash"))
      .where(col("phash").isNotNull)

    val chunked = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("phash"), c * 16).bitwiseAND(lit(0xffffL)).as("ck"))): _*)).as("b"))
      .select(col("doc_id"), col("phash"), col("b.c"), col("b.ck"))

    chunked.as("x")
      .join(chunked.as("y"),
        col("x.c") === col("y.c") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 2)
      .orderBy("doc_a", "doc_b")
  }

  val q120Sql: String =
    """WITH t AS (
      |  SELECT doc_id, list_transform(string_split(text, ''), x -> ord(x)) AS codes
      |  FROM documents),
      |bk AS (
      |  SELECT doc_id, unnest(list_filter(
      |    list_transform(list_zip(codes, codes[2:]),
      |      p -> CASE WHEN p[2] IS NULL THEN NULL ELSE (p[1] * 31 + p[2]) % 64 END),
      |    x -> x IS NOT NULL)) AS bucket
      |  FROM t WHERE len(codes) > 1),
      |tot AS (SELECT doc_id, count(*) AS n FROM bk GROUP BY 1),
      |st AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
      |sig AS (
      |  -- bucket 63 is the sign bit: DuckDB's checked 1<<63 overflows,
      |  -- so it contributes Long.MinValue directly (what Spark's
      |  -- wrapping shiftleft(1L, 63) produces); the HUGEINT sum of the
      |  -- mixed powers equals the signed 64-bit pattern and casts back
      |  SELECT st.doc_id,
      |    CAST(sum(CASE WHEN st.cnt * 64 <= tot.n THEN 0
      |                  WHEN st.bucket = 63 THEN -9223372036854775807 - 1
      |                  ELSE (CAST(1 AS BIGINT) << st.bucket) END) AS BIGINT) AS phash
      |  FROM st JOIN tot USING (doc_id) GROUP BY 1),
      |chunks AS (
      |  SELECT doc_id, CAST(phash AS BIGINT) AS phash, c,
      |    (CAST(phash AS BIGINT) >> (c * 16)) & 65535 AS ck
      |  FROM sig, (SELECT UNNEST([0, 1, 2, 3]) AS c)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |    CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
      |  FROM chunks x JOIN chunks y
      |    ON x.c = y.c AND x.ck = y.ck AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b, hamming FROM pairs
      |WHERE hamming <= 2 ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q278
  /** REAL image-codec kernel (r9): synthesize a deterministic 32x32 RGB
    * image per document — each channel an integer formula of
    * (doc_id, x, y) — ENCODE it to actual PNG bytes (javax.imageio; the
    * opaque binary image column a multimodal pipeline carries), then run
    * the kernel under test: DECODE the PNG back to pixels and
    * BILINEAR-resize it 4x down with half-pixel alignment. At an exact
    * 4x scale the half-pixel sample centers land midway between the 2x2
    * center pixels of each block, so bilinear = their equal-weight
    * average — computed per channel in INTEGER arithmetic (floor
    * division), which makes the kernel engine-exact. PNG is lossless, so
    * the DuckDB oracle re-derives every output pixel from the FORMULA
    * alone: the decode + resample arithmetic is verified PIXEL-EXACT
    * (positional weighted sum included, so a transposed or re-ordered
    * pixel fails the gate) with no fixture and no codec on the oracle
    * side. Same mapPartitions batch-iterator shape as q46/q101 —
    * embarrassingly parallel over documents, no shuffle until the final
    * order — and swapping the synthetic payload for a real image column
    * changes nothing downstream of the `png` val.
    */
  val q278: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    kernelIds(s, d)
      .mapPartitions { it =>
        val W = 32
        val OW = 8
        it.map { id =>
          // synthesize + encode a REAL PNG payload, then the kernel under
          // test: real decode + integer bilinear 4x down
          val dec = decodePng(synthPng(id, W), W, id)
          var checksum = 0L
          var wsum = 0L
          var oy = 0
          while (oy < OW) {
            var ox = 0
            while (ox < OW) {
              var rs = 0; var gs = 0; var bs = 0
              var dy = 1
              while (dy <= 2) {
                var dx = 1
                while (dx <= 2) {
                  val p = dec.getRGB(4 * ox + dx, 4 * oy + dy)
                  rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
                  dx += 1
                }
                dy += 1
              }
              val v = ((rs / 4).toLong << 16) + ((gs / 4).toLong << 8) + (bs / 4).toLong
              checksum += v
              wsum += (oy * OW + ox + 1).toLong * v
              ox += 1
            }
            oy += 1
          }
          (id, OW, OW, checksum, wsum)
        }
      }
      .toDF("doc_id", "out_w", "out_h", "checksum", "wsum")
      .orderBy("doc_id")
  }

  val q278Sql: String =
    """WITH px AS (
      |  SELECT d.doc_id, g.ox, g.oy, g.dx, g.dy,
      |    ((d.doc_id * 31 + (4 * g.ox + g.dx) * 7 + (4 * g.oy + g.dy) * 13) % 256) AS r,
      |    ((d.doc_id * 17 + (4 * g.ox + g.dx) * 11 + (4 * g.oy + g.dy) * 3) % 256) AS g2,
      |    ((d.doc_id * 23 + (4 * g.ox + g.dx) * 5 + (4 * g.oy + g.dy) * 19) % 256) AS b
      |  FROM (SELECT doc_id FROM documents) d
      |  CROSS JOIN (
      |    SELECT ox.ox, oy.oy, dx.dx, dy.dy
      |    FROM (SELECT UNNEST(range(0, 8)) AS ox) ox,
      |         (SELECT UNNEST(range(0, 8)) AS oy) oy,
      |         (SELECT UNNEST([1, 2]) AS dx) dx,
      |         (SELECT UNNEST([1, 2]) AS dy) dy) g),
      |agg AS (
      |  SELECT doc_id, ox, oy,
      |    (sum(r) // 4) AS r, (sum(g2) // 4) AS g, (sum(b) // 4) AS b
      |  FROM px GROUP BY 1, 2, 3)
      |SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
      |  CAST(sum(r * 65536 + g * 256 + b) AS BIGINT) AS checksum,
      |  CAST(sum((oy * 8 + ox + 1) * (r * 65536 + g * 256 + b)) AS BIGINT) AS wsum
      |FROM agg GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q279
  /** REAL audio-codec kernel (r9, the q278 discipline on the audio
    * modality): synthesize a deterministic 2048-sample 16-bit PCM mono
    * clip per document (each sample an integer formula of (doc_id, i)),
    * ENCODE it to actual WAV bytes (javax.sound.sampled — JDK built-in,
    * the opaque binary audio column a pipeline carries), then the kernel
    * under test: DECODE the WAV back to samples and window them into
    * 256-sample frames, emitting per-document integer frame statistics
    * (total / max absolute amplitude, position-weighted sum — the
    * energy-profile shape a feature extractor feeds downstream). PCM WAV
    * is lossless, so the DuckDB oracle re-derives every sample from the
    * FORMULA alone: the decode + framing arithmetic is verified
    * SAMPLE-EXACT with no fixture and no codec on the oracle side. Same
    * mapPartitions batch-iterator shape as q46/q101/q278.
    */
  val q279: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    // NOT kernelIds-spread (r12, measured): javax.sound's AudioSystem
    // routes every write/getAudioInputStream through the JDK's global
    // service-provider registry, whose lookup SYNCHRONIZES — 32 parallel
    // tasks showed 52 s of task run time against 2.3 s of CPU (a lock
    // convoy) and ran 2.7× slower than the single-task scan. The PNG
    // kernels (q46/q101/q278) have no such global lock and do spread.
    Graft.table(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        val N = 2048
        val FRAME = 256
        it.map { id =>
          // synthesize + encode: a REAL WAV payload (PCM s16le mono 8 kHz)
          val pcm = new Array[Byte](N * 2)
          var i = 0
          while (i < N) {
            val v = (((id * 31 + i.toLong * i * 7 + i.toLong * 13) % 65536L) - 32768L).toInt
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, N.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          val wav = bos.toByteArray

          // the kernel under test: real WAV decode + frame statistics
          val dec = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val df = dec.getFormat
          require(df.getSampleSizeInBits == 16 && df.getChannels == 1 &&
            !df.isBigEndian, s"unexpected decoded WAV format for doc $id: $df")
          val bytes = dec.readAllBytes()
          require(bytes.length == N * 2,
            s"WAV decode returned ${bytes.length} bytes for doc $id, wanted ${N * 2}")
          var totalAbs = 0L
          var maxAbs = 0L
          var wsum = 0L
          i = 0
          while (i < N) {
            val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
            val a = math.abs(v)
            totalAbs += a
            if (a > maxAbs) maxAbs = a
            wsum += (i / FRAME + 1).toLong * a
            i += 1
          }
          (id, N / FRAME, totalAbs, maxAbs, wsum)
        }
      }
      .toDF("doc_id", "n_frames", "total_abs", "max_abs", "wsum")
      .orderBy("doc_id")
  }

  val q279Sql: String =
    """WITH sm AS (
      |  SELECT d.doc_id, i.i,
      |    ((d.doc_id * 31 + i.i * i.i * 7 + i.i * 13) % 65536) - 32768 AS v
      |  FROM (SELECT doc_id FROM documents) d
      |  CROSS JOIN (SELECT UNNEST(range(0, 2048)) AS i) i)
      |SELECT doc_id, CAST(8 AS INT) AS n_frames,
      |  CAST(sum(abs(v)) AS BIGINT) AS total_abs,
      |  CAST(max(abs(v)) AS BIGINT) AS max_abs,
      |  CAST(sum(((i // 256) + 1) * abs(v)) AS BIGINT) AS wsum
      |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q45_frame_sample", q45, Some(q45Sql)),
    ("q46_mm_features", q46, Some(q46Sql)),
    ("q101_resize_nearest", q101, Some(q101Sql)),
    ("q120_phash_dedup", q120, Some(q120Sql)),
    ("q278_image_decode_resize", q278, Some(q278Sql)),
    ("q279_audio_decode_frames", q279, Some(q279Sql))
  )
}
