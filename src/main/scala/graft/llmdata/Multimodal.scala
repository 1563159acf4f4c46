package graft.llmdata

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** `[EXT]` Multimodal-column plumbing: image/audio/video payloads as
  * opaque `binary` columns with typed metadata, plus a batched
  * decode/feature-extract stage.
  *
  * Two `MediaDecoder` implementations ship: `FakeDecoder`, a
  * deterministic byte-statistics "feature" so the oracle-checked
  * queries pin the plumbing — schema, batching, partition mapping —
  * on the text-derived testdata; and `ImageIoDecoder`, a REAL pure-JVM
  * image codec (`javax.imageio`) proving the seam's signature fits an
  * actual decoder (spec-gated on checked-in PNG fixtures through the
  * extract/resize/aHash kernels). Audio/video codecs would slot into
  * the same trait (JNI-backed in production); nothing else changes.
  *
  * Scale design (100 TB):
  *  - payloads stay opaque binary end to end — never parsed by Catalyst,
  *    never part of a shuffle key; metadata columns carry the plan;
  *  - feature extraction is `mapPartitions` over a typed Dataset — the
  *    Scala analog of `mapInPandas`: per-partition batched calls, no
  *    per-row JNI overhead, no driver involvement;
  *  - decode is placed AFTER filters/joins on metadata so the expensive
  *    kernel touches only surviving rows (predicate pushdown on
  *    metadata, not payload);
  *  - binary columns make parquet row groups large — at scale, store
  *    payloads in a separate co-partitioned table (or object store with
  *    pointer columns) and join on doc_id; q37's plan reads text-derived
  *    payloads so the testdata stays driver-generated.
  */
object Multimodal {

  /** One media payload with typed metadata. */
  final case class MediaRecord(
      docId: Long, mediaType: String, payload: Array[Byte])

  /** Extracted features: byte stats stand in for a real embedding. */
  final case class MediaFeatures(
      docId: Long, mediaType: String, nBytes: Int, feature: Array[Float])

  /** The pluggable decode kernel (the `???` seam for real codecs). */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): Array[Float]
  }

  /** Deterministic fake: 4 byte-statistics as the "embedding". */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Float] = {
      if (payload.isEmpty) Array(0f, 0f, 0f, 0f)
      else {
        val n = payload.length
        var sum = 0L; var mn = 255; var mx = 0
        payload.foreach { b =>
          val u = b & 0xff; sum += u
          if (u < mn) mn = u; if (u > mx) mx = u
        }
        Array(n.toFloat, sum.toFloat / n, mn.toFloat, mx.toFloat)
      }
    }
  }

  /** Real pure-JVM image decode (`javax.imageio` — JDK built-in, zero
    * new dependencies): the proof that the [[MediaDecoder]] seam's
    * signature fits an actual codec, not only the deterministic fake.
    * Decodes whatever the JDK ImageIO registry handles (PNG/JPEG/GIF/
    * BMP), then resamples to an 8×8 luminance grid by STRIDE sampling
    * — `getRGB(gx·w/8, gy·h/8)`, integer Rec.601 luma — deliberately
    * no interpolation, so the output is a pure function of the pixel
    * data with no platform-dependent resampler in the loop. The 64
    * grid values are exactly the pixel-grid front-end [[aHash]] (and
    * q121's threshold rule) consumes. Fails loudly on a non-image
    * mediaType or an undecodable payload — a codec that silently
    * zero-fills would poison every downstream near-dup decision. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Float] = {
      require(mediaType.startsWith("image/"),
        s"ImageIoDecoder handles image/* payloads, got '$mediaType'")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload (no ImageIO reader)")
      val w = img.getWidth
      val h = img.getHeight
      require(w >= 8 && h >= 8, s"image too small for the 8x8 grid: ${w}x$h")
      val out = new Array[Float](64)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val px = img.getRGB(gx * w / 8, gy * h / 8)
          val lum = (((px >> 16) & 0xff) * 299 + ((px >> 8) & 0xff) * 587 +
            (px & 0xff) * 114) / 1000
          out(gy * 8 + gx) = lum.toFloat
          gx += 1
        }
        gy += 1
      }
      out
    }
  }

  /** aHash over a decoded pixel grid — q121's integer threshold rule
    * (`n·p_j > Σp` ⟺ pixel above mean, no division) applied to a
    * decoder's output: bit j set iff grid cell j is above the grid
    * mean. With [[ImageIoDecoder]] in front this is the REAL image
    * near-dup pipeline; q121 runs the same rule over byte payloads so
    * the oracle can replay it. */
  def aHash(pixels: Array[Float]): Long = {
    val n = pixels.length
    var sum = 0.0
    pixels.foreach(sum += _)
    var hash = 0L
    var j = 0
    while (j < n && j < 64) {
      if (pixels(j) * n > sum) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** documents → MediaRecord dataset (text bytes as the stand-in
    * payload; real pipelines read image/audio files the same shape). */
  def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("docId"),
        lit("text/plain").as("mediaType"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Batched per-partition decode — the mapInPandas-shaped stage. */
  def extractFeatures(ds: Dataset[MediaRecord], decoder: MediaDecoder)
      : Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.docId, r.mediaType, r.payload.length,
          decoder.decode(r.payload, r.mediaType))
      }
    }
  }

  /** Resize stub: deterministic byte-domain downsample to `targetBytes`
    * by stride sampling — stands in for an image resize kernel (the
    * Spark-side contract is what matters: payload→payload, row count
    * preserved, bounded output size; swap the kernel for a codec). */
  def resize(ds: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        if (r.payload.length <= targetBytes) r
        else {
          val out = new Array[Byte](targetBytes)
          val stride = r.payload.length.toDouble / targetBytes
          var i = 0
          while (i < targetBytes) {
            out(i) = r.payload((i * stride).toInt)
            i += 1
          }
          r.copy(payload = out)
        }
      }
    }
  }

  /** Frame-sample stub: split the payload into `nFrames` contiguous
    * "frames" (video → frame list shape); one output row per frame with
    * (docId, frameIdx) identity — the explode-heavy stage a video
    * pipeline runs before per-frame decode. */
  final case class MediaFrame(
      docId: Long, mediaType: String, frameIdx: Int, payload: Array[Byte])

  def sampleFrames(ds: Dataset[MediaRecord], nFrames: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      if (r.payload.isEmpty) Iterator.empty
      else {
        val k = math.min(nFrames, r.payload.length)
        val size = r.payload.length / k
        (0 until k).iterator.map { i =>
          val from = i * size
          val until = if (i == k - 1) r.payload.length else from + size
          MediaFrame(r.docId, r.mediaType, i,
            java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }

  val qs: Seq[Q] = Seq(
    // ---- q37: binary-column metadata path — payload length, content
    //      hash, head bytes; all computed on the `binary` column (the
    //      decode-free 99% of a multimodal pipeline). ----
    Q(
      "q37_multimodal_bytes",
      """SELECT doc_id,
        |  length(text) AS n_bytes,
        |  sha256(text) AS sha,
        |  lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
        |  CAST(length(text) % 256 AS BIGINT) AS fake_feature
        |FROM documents ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val blob = col("text").cast("binary")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          length(blob).cast("long").as("n_bytes"),
          sha2(blob, 256).as("sha"),
          lower(hex(substring(blob, 1, 8))).as("head_hex"),
          (length(blob) % 256).cast("long").as("fake_feature"))
        .orderBy("doc_id")
    },

    // ---- q103: frame-sampling under the oracle — the typed-Dataset
    //      `sampleFrames` kernel (video → per-frame rows) checked
    //      value-for-value: DuckDB recomputes each frame's bytes with
    //      the same integer boundary math (k = min(4, len), size =
    //      len div k, last frame takes the remainder) via substr on
    //      the ASCII payload. This puts the mapPartitions/flatMap
    //      execution surface itself — not just its column plumbing —
    //      under the correctness gate. ----
    Q(
      "q103_frame_stats",
      """WITH b AS (SELECT doc_id, text, length(text) AS n,
        |    least(4, length(text)) AS k,
        |    length(text) // least(4, length(text)) AS sz
        |  FROM documents WHERE length(text) > 0),
        |f AS (
        |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |    CASE WHEN i < k - 1
        |      THEN substr(text, CAST(i*sz + 1 AS INT), CAST(sz AS INT))
        |      ELSE substr(text, CAST(i*sz + 1 AS INT)) END AS frame
        |  FROM b, unnest(range(0, 4)) AS t(i)
        |  WHERE i < k)
        |SELECT doc_id, frame_idx,
        |  CAST(length(frame) AS BIGINT) AS n_bytes,
        |  sha256(frame) AS sha
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      sampleFrames(mediaRecords(s, d), 4)
        .map(f => (f.docId, f.frameIdx, f.payload.length.toLong,
          f.payload))
        .toDF("doc_id", "frame_idx", "n_bytes", "p")
        .select(col("doc_id"), col("frame_idx"), col("n_bytes"),
          sha2(col("p"), 256).as("sha"))
        .orderBy("doc_id", "frame_idx")
    },

    // ---- q104: resize kernel under the oracle — the stride-sampling
    //      byte-domain resize (`resize`, the image-downsample stand-in)
    //      checked value-for-value: DuckDB rebuilds the resized payload
    //      with the same position formula (floor(i·len/target), 1-based
    //      substr) and compares the hex rendering. Docs at or under the
    //      target pass through untouched (both sides). ----
    Q(
      "q104_resize_bytes",
      """SELECT doc_id,
        |  CAST(CASE WHEN length(text) <= 32 THEN length(text) ELSE 32 END
        |    AS BIGINT) AS n_bytes,
        |  lower(hex(encode(CASE WHEN length(text) <= 32 THEN text
        |    ELSE array_to_string(list_transform(range(0, 32),
        |      i -> substr(text,
        |        CAST(floor(i * length(text) / 32.0) AS INT) + 1, 1)), '')
        |    END))) AS payload_hex
        |FROM documents WHERE length(text) > 0
        |ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      resize(mediaRecords(s, d), 32)
        .map(r => (r.docId, r.payload.length.toLong, r.payload))
        .toDF("doc_id", "n_bytes", "p")
        .select(col("doc_id"), col("n_bytes"),
          lower(hex(col("p"))).as("payload_hex"))
        .orderBy("doc_id")
    },

    // ---- q105: the decode kernel under the oracle — `extractFeatures`
    //      with the deterministic byte-statistics decoder, recomputed
    //      by DuckDB over the payload's code points. The float feature
    //      (mean byte) is ONE int/int IEEE division on both sides
    //      (sum and count are exact integers), so even the Float
    //      channel compares exactly after a float→double round trip on
    //      both engines. Completes the kernel trio q103/q104 started:
    //      all three mapPartitions/flatMap stages are gate-checked,
    //      only the codec binding itself stays a stub. ----
    Q(
      "q105_decode_features",
      """WITH b AS (SELECT doc_id, text, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      i -> ord(substr(text, CAST(i AS INT), 1))) AS cps
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |  CAST(n AS INT) AS n_bytes,
        |  CAST(n AS FLOAT) AS f_len,
        |  CAST(CAST(list_sum(cps) AS FLOAT) / n AS FLOAT) AS f_mean,
        |  CAST(list_min(cps) AS FLOAT) AS f_min,
        |  CAST(list_max(cps) AS FLOAT) AS f_max
        |FROM b ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      extractFeatures(mediaRecords(s, d), FakeDecoder)
        .map(f => (f.docId, f.nBytes, f.feature(0), f.feature(1),
          f.feature(2), f.feature(3)))
        .toDF("doc_id", "n_bytes", "f_len", "f_mean", "f_min", "f_max")
        .orderBy("doc_id")
    },

    // ---- q94: cross-modal referential-integrity audit — the check a
    //      multimodal pipeline runs before trusting any doc↔vector
    //      join (q80's shape): per language, how many docs have no
    //      embedding row and how many embedding ids have no document.
    //      Orphans on either side silently shrink every downstream
    //      cross-modal result. Plan: two anti-join shapes rendered as
    //      ONE full outer join on the id (each side scanned once,
    //      single id-keyed shuffle), counts aggregated per lang (the
    //      doc-side attribute; vector orphans carry a NULL lang
    //      bucket). ----
    Q(
      "q94_crossmodal_integrity",
      """SELECT d.lang,
        |  CAST(count(CASE WHEN d.doc_id IS NOT NULL
        |    AND e.vec_id IS NOT NULL THEN 1 END) AS BIGINT) AS n_matched,
        |  CAST(count(CASE WHEN d.doc_id IS NOT NULL
        |    AND e.vec_id IS NULL THEN 1 END) AS BIGINT) AS n_doc_orphans,
        |  CAST(count(CASE WHEN d.doc_id IS NULL THEN 1 END) AS BIGINT)
        |    AS n_vec_orphans
        |FROM documents d FULL OUTER JOIN embeddings e
        |  ON e.vec_id = d.doc_id
        |GROUP BY 1 ORDER BY lang NULLS FIRST""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val vecs = Tables.embeddings(s, d).select(col("vec_id"))
      docs.join(vecs, col("vec_id") === col("doc_id"), "full_outer")
        .groupBy("lang")
        .agg(
          count(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1))
            .as("n_matched"),
          count(when(col("doc_id").isNotNull && col("vec_id").isNull, 1))
            .as("n_doc_orphans"),
          count(when(col("doc_id").isNull, 1)).as("n_vec_orphans"))
        .orderBy(col("lang").asc_nulls_first)
    },

    // ---- q121: perceptual-hash near-duplicate pairs — image dedup's
    //      aHash (average hash: resample to a fixed pixel grid,
    //      threshold each pixel at the mean, Hamming-compare the bit
    //      strings; public technique) over the media payload, using
    //      q104's stride-resample as the "pixel grid" and INTEGER-ONLY
    //      math: pixel_j > mean ⟺ 60·pixel_j > Σpixels, so the hash
    //      is exact with no float anywhere, and DuckDB replays the
    //      whole kernel over the payload code points (the
    //      q103/q104/q105 discipline — the codec binding is the only
    //      stub). Pairing is a pigeonhole EQUI-join, never all-pairs —
    //      but one level deeper than q53's single chunks: ≤ 7
    //      differing bits touch ≤ 7 of the 10 six-bit chunks, so ≥ 3
    //      chunks survive untouched and every qualifying pair shares
    //      at least one untouched chunk TRIPLE. Keying on the
    //      C(10,3) = 120 (triple-id, 18-bit value) combinations costs
    //      120 rows/doc but shrinks candidate volume ~13× vs single
    //      chunks on this corpus (measured 10.1 M → 0.74 M at sf0.1:
    //      word-soup pixel bits are cross-doc correlated, so 6-bit
    //      buckets run hot — the multi-index refinement is what keeps
    //      the join output candidate-bounded, not occupancy²-bounded).
    //      Exact popcount verify inside the join, distinct pass
    //      collapsing multi-triple meetings. ----
    Q(
      "q121_phash_neardup",
      """WITH p AS (SELECT doc_id,
        |    list_transform(range(0, 60), j -> ord(substr(text,
        |      CAST(1 + (j * length(text)) // 60 AS INT), 1))) AS px
        |  FROM documents WHERE length(text) >= 60),
        |h AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60),
        |      j -> CASE WHEN px[CAST(j + 1 AS INT)] * 60 > list_sum(px)
        |           THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END))
        |    AS BIGINT) AS ph
        |  FROM p)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 7
        |ORDER BY a_id, b_id""".stripMargin,
    ) { (s, d) =>
      // pixel rows through a Generate boundary, hash via window +
      // aggregate — NOT nested HOF lambdas: CollapseProject inlines a
      // referenced column into a lambda body, so a mean computed as an
      // array-aggregate re-evaluates per ELEMENT (the setSim fp
      // lesson, measured here as 45 s of interpreted expression evals
      // at sf0.1 vs ~1 s for this shape). ExtractGenerator keeps the
      // pixel transform below the explode — once per doc — and the
      // doc-keyed window and aggregate share one exchange.
      val pix = Tables.documentsSpread(s, d)
        .filter(length(col("text")) >= 60)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, 59), j -> ascii(substring(text, " +
            "CAST(1 + (j * length(text)) DIV 60 AS INT), 1)))"))
          .as(Seq("j", "pv")))
      val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val h = graft.Caches.persist(pix
        .withColumn("s", sum("pv").over(wDoc))
        .groupBy("doc_id")
        .agg(sum(when(col("pv") * 60 > col("s"),
          expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L)).as("ph")))
      // untouched-triple keys: every ≤7-distance pair meets on ≥1 of
      // the C(10,3) (triple-id, 18-bit chunk-values) combinations
      def chunk(s: String) = s"pmod(shiftright(ph, 6 * t.$s), 64)"
      val combos = for {
        i <- 0 until 10; j <- (i + 1) until 10; k <- (j + 1) until 10
      } yield s"named_struct('i', $i, 'j', $j, 'k', $k)"
      val keyed = h
        .withColumn("cand", explode(expr(
          "transform(array(" + combos.mkString(", ") +
            "), t -> named_struct(" +
            "'tid', t.i * 100 + t.j * 10 + t.k, " +
            s"'ck', (${chunk("i")} * 64 + ${chunk("j")}) * 64 " +
            s"+ ${chunk("k")}))")))
        .select(col("doc_id"), col("ph"),
          col("cand.tid").as("tid"), col("cand.ck").as("ck"))
      // CANONICAL-TRIPLE dedup (the q160 canonical-row pattern): a
      // qualifying pair meets once per shared untouched triple — an
      // exact duplicate meets on all C(10,3) = 120 — and the old
      // distinct shuffled that multiplicity. The pair's untouched-
      // chunk set is a pure function of x = aph^bph (chunk b
      // untouched ⟺ six-bit group b of x is zero), so "is this row
      // the pair's LOWEST shared triple" is row-local: the native
      // PhCanonicalTriple kernel returns the lexicographically
      // smallest untouched triple's id in one pass (a PLAN-ARITHMETIC
      // rendering of the same ladder inlined exponentially under
      // CollapseProject and fell the stage out of codegen — 5.6 s →
      // 114 s at sf1; see the kernel scaladoc). hamming ≤ 7 FIRST:
      // pigeonhole then guarantees ≥ 3 zero chunks, so the id is
      // defined on every surviving row. Measured parity at sf1
      // (5.5 s vs the distinct's 5.6 — this synthetic corpus is
      // nearly dup-free, so multiplicity is small); the win is the
      // SHAPE: on a dup-heavy corpus (web crawls run ~30 % exact
      // dups, each meeting on all 120 triples) the distinct's
      // shuffle volume is multiplicity-scaled while this filter
      // stays map-side.
      val canonical = {
        import org.apache.spark.sql.GraftSqlBridge.{column, expression}
        column(graft.functions.PhCanonicalTriple(
          expression(expr("aph ^ bph")), chunks = 10))
      }
      keyed.toDF("a_id", "aph", "tid", "ck")
        .join(keyed.toDF("b_id", "bph", "tid", "ck"), Seq("tid", "ck"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("hamming", expr("CAST(bit_count(aph ^ bph) AS INT)"))
        .filter(col("hamming") <= 7)
        .filter(col("tid") === canonical)
        .select("a_id", "b_id", "hamming")
        .orderBy("a_id", "b_id")
    },
  )
}
