package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.MediaPipeline
import graft.sources.Tables

/** Multimodal pack: binary-column image decode and frame sampling
  * through the REAL typed mapPartitions pipeline
  * (graft.multimodal.MediaPipeline — javax.imageio, JDK-only), plus the
  * sliding-window batch dual of the streaming operator.
  *
  * Fixture discipline = the PDF tier's (m3–m6): every row synthesizes a
  * REAL encoded image (png/jpeg/gif/bmp; gif payloads animated) with
  * writer-known dimensions / frame count / planted top-left pixel; the
  * decoder recovers them from the actual bytes and the oracle restates
  * the planted ground truth — a pass proves real decoding, not
  * arithmetic on byte lengths.
  */
object MultimodalQueries extends QueryPack {

  /** ONE copy of the m13/m14 oracle aHash restatement: planted raster →
    * 8×6 thumbnail → 48-bit average hash for the lossless images.
    */
  private val duckAHashCtes =
    """dims AS (SELECT doc_id,
                16 + doc_id % 48 AS w, 12 + doc_id % 36 AS h,
                doc_id % 256 AS planted
              FROM documents WHERE doc_id % 4 IN (0, 3)),
              smp AS (SELECT doc_id, tx, ty,
                       CASE WHEN tx * w // 8 = 0 AND ty * h // 6 = 0 THEN planted
                       ELSE ((tx * w // 8) * 31 + (ty * h // 6) * 17) & 63 END AS v
                     FROM dims,
                          (SELECT unnest(range(8)) AS tx),
                          (SELECT unnest(range(6)) AS ty)),
              m AS (SELECT doc_id, sum(v) // 48 AS mean FROM smp GROUP BY 1),
              hsh AS (SELECT smp.doc_id,
                        CAST(sum(CASE WHEN v > mean
                            THEN (CAST(1 AS BIGINT) << (ty * 8 + tx)) ELSE 0 END) AS BIGINT) AS ahash
                      FROM smp JOIN m USING (doc_id) GROUP BY 1)"""

  /** ONE copy of the m5/x39 hostile-PDF fixture (the damage classes +
    * planted recoverable text); quarantine rule: only kind 0 recovers.
    */
  private def hostilePdfUdf = udf { id: Long =>
    val kind = (id % 5) match {
      case 0 => "wrong-length"
      case 1 => "bogus-filter"
      case 2 => "truncated"
      case 3 => "corrupt-flate"
      case _ => "identity-h-no-tounicode"
    }
    graft.sources.PdfText.synthesizeHostile(kind, s"Urteil Nr. $id bleibt lesbar")
  }

  def all: Seq[Q] = Seq(

    // ---- Binary payload → typed metadata via mapPartitions over a REAL
    // javax.imageio decode (frame-0 raster decode is the validity bar).
    // px_red asserts the planted pixel for the lossless RGB formats.
    Q("m1_media_meta",
      (s, d) => MediaPipeline.decodeMeta(
        MediaPipeline.withImagePayload(Tables.documents(s, d))).toDF(),
      Some("""SELECT doc_id, false AS quarantined,
                CASE CAST(doc_id % 4 AS int) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                     WHEN 2 THEN 'gif' ELSE 'bmp' END AS format,
                CAST(16 + doc_id % 48 AS int) AS width,
                CAST(12 + doc_id % 36 AS int) AS height,
                CAST(CASE WHEN doc_id % 4 = 2 THEN 1 + doc_id % 3 ELSE 1 END AS int) AS n_frames,
                CAST(CASE WHEN doc_id % 4 IN (0, 3) THEN doc_id % 256 END AS int) AS px_red
              FROM documents""")),

    // ---- Frame sampling: decode EVERY frame's raster (animated gifs
    // emit one row per frame — the video-frame-extraction shape); the
    // oracle restates the writer-known per-frame dimensions.
    Q("m2_frame_sample",
      (s, d) => MediaPipeline.sampleFrames(
        MediaPipeline.withImagePayload(Tables.documents(s, d))).toDF(),
      Some("""WITH meta AS (SELECT doc_id,
                CAST(16 + doc_id % 48 AS int) AS w, CAST(12 + doc_id % 36 AS int) AS h,
                CASE WHEN doc_id % 4 = 2 THEN 1 + doc_id % 3 ELSE 1 END AS nf
              FROM documents)
              SELECT doc_id, CAST(f AS int) AS frame_idx, w AS frame_w, h AS frame_h
              FROM (SELECT doc_id, w, h, unnest(range(nf)) AS f FROM meta)""")),

    // ---- Hostile media tier (the m5 discipline for images): junk
    // bytes, empty payloads, and truncated PNGs (valid header, amputated
    // pixel data) must quarantine — null metadata, never a throw — while
    // the interleaved valid control rows still decode fully.
    Q("m7_media_hostile",
      (s, d) => MediaPipeline.decodeMeta(
        MediaPipeline.withHostilePayload(Tables.documents(s, d))).toDF()
        .select("doc_id", "quarantined", "format", "width", "height", "px_red"),
      Some("""SELECT doc_id,
                CAST(doc_id % 4 AS int) <> 0 AS quarantined,
                CASE WHEN doc_id % 4 = 0 THEN 'png' END AS format,
                CAST(CASE WHEN doc_id % 4 = 0 THEN 16 + (doc_id * 4) % 48 END AS int) AS width,
                CAST(CASE WHEN doc_id % 4 = 0 THEN 12 + (doc_id * 4) % 36 END AS int) AS height,
                CAST(CASE WHEN doc_id % 4 = 0 THEN (doc_id * 4) % 256 END AS int) AS px_red
              FROM documents""")),

    // ---- REAL pixel-level features over the decoded raster: full-frame
    // red-channel sum + an 8×6 nearest-neighbor thumbnail resample
    // (the feature-extract / resize steps of a multimodal pipeline).
    // The fixture raster is closed-form — pixel (x,y) carries
    // (x*31 + y*17) & 63 with the planted (0,0) = doc_id % 256 — so the
    // oracle recomputes BOTH sums pixel-by-pixel in SQL; a hash match
    // proves the decoder read every pixel the writer wrote. Lossless
    // formats only (png/bmp); jpeg/gif rows are null by discipline.
    Q("m9_image_features",
      (s, d) => MediaPipeline.decodeImageFeatures(
        MediaPipeline.withImagePayload(Tables.documents(s, d))).toDF(),
      Some("""WITH dims AS (SELECT doc_id,
                16 + doc_id % 48 AS w, 12 + doc_id % 36 AS h,
                doc_id % 256 AS planted, doc_id % 4 IN (0, 3) AS lossless
              FROM documents),
              px AS (SELECT doc_id,
                       planted + sum(CASE WHEN x = 0 AND y = 0 THEN 0
                                     ELSE (x * 31 + y * 17) & 63 END) AS s
                     FROM (SELECT doc_id, planted, unnest(range(w)) AS x, h
                           FROM dims WHERE lossless),
                          (SELECT unnest(range(48)) AS y)
                     WHERE y < h GROUP BY doc_id, planted),
              th AS (SELECT doc_id,
                       sum(CASE WHEN tx * w // 8 = 0 AND ty * h // 6 = 0 THEN planted
                           ELSE ((tx * w // 8) * 31 + (ty * h // 6) * 17) & 63 END) AS s
                     FROM (SELECT doc_id, w, h, planted FROM dims WHERE lossless),
                          (SELECT unnest(range(8)) AS tx),
                          (SELECT unnest(range(6)) AS ty)
                     GROUP BY doc_id)
              SELECT dims.doc_id,
                CAST(px.s AS bigint) AS px_sum,
                CAST(th.s AS bigint) AS thumb_sum
              FROM dims LEFT JOIN px ON dims.doc_id = px.doc_id
                        LEFT JOIN th ON dims.doc_id = th.doc_id""")),

    // ---- AUDIO tier (the third modality): real PCM-16 WAV payloads
    // synthesized per row (javax.sound.sampled, JDK-only like the image
    // and PDF tiers), decoded back for container metadata AND a full
    // sample pass (the peak) — every output column restated by the
    // oracle from the writer-planted ground truth.
    Q("m8_audio_meta",
      (s, d) => MediaPipeline.decodeAudioMeta(
        MediaPipeline.withWavPayload(Tables.documents(s, d))).toDF(),
      Some("""WITH t AS (SELECT doc_id,
                CASE CAST(doc_id % 4 AS int) WHEN 0 THEN 8000 WHEN 1 THEN 11025
                     WHEN 2 THEN 16000 ELSE 22050 END AS sr,
                CAST(1 + doc_id % 2 AS int) AS ch,
                500 + doc_id % 1000 AS nf
              FROM documents)
              SELECT doc_id, false AS quarantined, CAST(sr AS int) AS sample_rate,
                ch AS channels, CAST(nf AS bigint) AS n_frames,
                CAST(nf * 1000 // sr AS bigint) AS duration_ms,
                CAST(CASE WHEN (doc_id % 3000) + nf * ch <= 3000
                     THEN (doc_id % 3000) + nf * ch - 1 - 1500
                     ELSE 1499 END AS int) AS peak
              FROM t""")),

    // ---- Audio FRAMING + windowed energy (the MFCC-front-end shape):
    // 256-sample windows, hop 128, over the REAL decoded PCM stream —
    // one row per window with the exact integer sum of squares; the
    // oracle recomputes every window sample-by-sample from the planted
    // waveform.
    Q("m10_audio_windows",
      (s, d) => MediaPipeline.audioWindows(
        MediaPipeline.withWavPayload(Tables.documents(s, d))).toDF(),
      Some("""WITH t AS (SELECT doc_id,
                (500 + doc_id % 1000) * (1 + doc_id % 2) AS n FROM documents),
              w AS (SELECT doc_id, n, unnest(range((n - 256) // 128 + 1)) AS k FROM t),
              g AS (SELECT doc_id, k, j FROM w, (SELECT unnest(range(256)) AS j))
              SELECT doc_id, cast(k as int) AS win_idx,
                cast(sum(((doc_id + k*128 + j) % 3000 - 1500)
                       * ((doc_id + k*128 + j) % 3000 - 1500)) as bigint) AS energy
              FROM g GROUP BY doc_id, k""")),

    // ---- Perceptual AVERAGE-HASH (pHash family — image near-dup
    // fingerprinting): 48-bit hash from the decoded 8×6 thumbnail, bit
    // set when the sample beats the integer mean. Real pixels in, the
    // oracle restates every bit from the closed-form raster; lossy
    // formats null by discipline.
    Q("m11_image_ahash",
      (s, d) => MediaPipeline.imageAHashes(
        MediaPipeline.withImagePayload(Tables.documents(s, d))).toDF(),
      Some("""WITH dims AS (SELECT doc_id,
                16 + doc_id % 48 AS w, 12 + doc_id % 36 AS h,
                doc_id % 256 AS planted, doc_id % 4 IN (0, 3) AS lossless
              FROM documents),
              smp AS (SELECT doc_id, tx, ty,
                       CASE WHEN tx * w // 8 = 0 AND ty * h // 6 = 0 THEN planted
                       ELSE ((tx * w // 8) * 31 + (ty * h // 6) * 17) & 63 END AS v
                     FROM (SELECT * FROM dims WHERE lossless),
                          (SELECT unnest(range(8)) AS tx),
                          (SELECT unnest(range(6)) AS ty)),
              m AS (SELECT doc_id, sum(v) // 48 AS mean FROM smp GROUP BY 1),
              hsh AS (SELECT smp.doc_id,
                        sum(CASE WHEN v > mean
                            THEN (CAST(1 AS BIGINT) << (ty * 8 + tx)) ELSE 0 END) AS ahash
                      FROM smp JOIN m USING (doc_id) GROUP BY 1)
              SELECT dims.doc_id, cast(hsh.ahash as bigint) AS ahash
              FROM dims LEFT JOIN hsh ON dims.doc_id = hsh.doc_id""")),

    // ---- Image NEAR-DUP pairs (the multimodal dedup tier): banded
    // hamming-LSH over the 48-bit aHash (operators.HammingLSH). 4
    // bands × 12 bits; by pigeonhole any pair at hamming ≤ 3 keeps at
    // least one band intact, so the banded equi-join + exact popcount
    // filter IS all-pairs hamming ≤ 3 — the oracle restates the
    // brute-force form while Spark only compares bucket-mates.
    Q("m13_image_neardup",
      (s, d) => {
        val hashes = MediaPipeline.imageAHashes(
          MediaPipeline.withImagePayload(Tables.documents(s, d))).toDF()
          .where(col("ahash").isNotNull)
        graft.operators.HammingLSH
          .nearDupPairs(hashes, "doc_id", "ahash", bits = 48, bands = 4)
          .withColumnRenamed("id_a", "doc_a")
          .withColumnRenamed("id_b", "doc_b")
      },
      Some(s"""WITH $duckAHashCtes
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(bit_count(xor(a.ahash, b.ahash)) AS int) AS hamming
              FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.ahash, b.ahash)) <= 3""")),

    // ---- Image KEEP-LIST (m14): the product shape of multimodal
    // dedup at scale — m13's near-dup PAIRS are output-quadratic in
    // duplicate density (the d6 argument), so the pipeline output is
    // one row per image mapping to the smallest doc_id in its
    // CONNECTED COMPONENT of the verified-pair graph. Edges are m13's
    // EXACT hamming≤3 pairs (banded candidates + popcount verify —
    // bucket-graph components alone would over-merge through false
    // candidates); the closure runs through the same pointer-jumping
    // fixpoint as the text tier (MinHashLSH.convergeKeepList), each
    // verified pair encoded as a two-member bucket — singletons never
    // enter the loop (they map to themselves in one post-closure left
    // join). Oracle = the d10 discipline: an
    // INDEPENDENT recursive-CTE transitive closure over the
    // brute-force hamming pair graph.
    Q("m14_image_keeplist",
      (s, d) => {
        // persist the decoded hashes: the composition consumes them on
        // BOTH sides of the banded self-join plus the singleton frame —
        // without the cache the imageio decode pipeline runs 3×
        // (ContextCleaner reclaims the blocks once the gate result is
        // collected and dropped)
        val hashes = MediaPipeline.imageAHashes(
          MediaPipeline.withImagePayload(Tables.documents(s, d))).toDF()
          .where(col("ahash").isNotNull)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = graft.operators.HammingLSH
          .nearDupPairs(hashes, "doc_id", "ahash", bits = 48, bands = 4)
        val pairKey = concat(col("id_a"), lit("_"), col("id_b"))
        // one pass over the verified-pair join (round-16): the old
        // union-of-selects re-executed the banded hamming join per
        // branch; explode emits both endpoints from a single scan —
        // identical row multiset into the order-free closure
        val edges = pairs.select(
          explode(array(col("id_a"), col("id_b"))).as("doc_id"),
          lit(0).as("band"), pairKey.as("h"))
        // the fixpoint loops ONLY over pair-graph members (edges are
        // explicit here, unlike the text tier's content buckets) —
        // singletons can never merge, so they skip the iterative rounds
        // entirely and map to themselves in one left join. At 100 TB
        // that means the loop's working set tracks the duplicate-graph
        // size, not the corpus.
        val closed = graft.operators.MinHashLSH.convergeKeepList(edges, "doc_id")
        hashes.select("doc_id").join(closed, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("keep_id"), col("doc_id")).as("keep_id"))
      },
      Some(s"""WITH RECURSIVE $duckAHashCtes,
              edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
                        FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
                        WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM hsh
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id FROM reach GROUP BY doc_id""")),

    // ---- S3 PDF ingest round-trip: synthesize a real single-page PDF
    // per row cycling through every native decode path of
    // sources.PdfText — plain, FlateDecode (with a nested /DecodeParms
    // sub-dict), ASCIIHexDecode, LZWDecode, RunLengthDecode, and an
    // ASCIIHex→Flate filter CHAIN — then extract the text natively
    // (JDK-only) and compare to the ground truth. Per-row map, binary
    // never leaves the executors.
    Q("m3_pdf_text",
      (s, d) => {
        val mkPdf = udf { id: Long =>
          val filters = (id % 6) match {
            case 0 => Seq.empty[String]
            case 1 => Seq("FlateDecode")
            case 2 => Seq("ASCIIHexDecode")
            case 3 => Seq("LZWDecode")
            case 4 => Seq("RunLengthDecode")
            case _ => Seq("ASCIIHexDecode", "FlateDecode")
          }
          graft.sources.PdfText.synthesize(s"Urteil Nr. $id (rechtskräftig)", filters)
        }
        Tables.documents(s, d)
          .withColumn("pdf_raw", mkPdf(col("doc_id")))
          .select(col("doc_id"),
            graft.sources.Ingest.pdfTextUdf(col("pdf_raw")).as("pdf_text"))
      },
      Some("""SELECT doc_id, 'Urteil Nr. ' || doc_id || ' (rechtskräftig)' AS pdf_text
              FROM documents""")),

    // ---- S3 Tika-gap tiers: ENCRYPTED PDFs (standard security
    // handler, empty user password — RC4-40, RC4-128, AES-128-CBC, and
    // V5/R6 AES-256 with the hardened SHA-2 hash; the writer derives
    // O/U/OE/UE/file-key with the spec algorithms, so the gate
    // exercises real key derivation + per-object keys) and CID/Type0
    // text resolved through a /ToUnicode CMap. Round-trip oracle.
    Q("m4_pdf_secure",
      (s, d) => {
        val mkPdf = udf { id: Long =>
          val text = s"Vertraulich Nr. $id (rechtskräftig)"
          (id % 5) match {
            case 0 => graft.sources.PdfText.synthesizeEncrypted(text, "rc4-40")
            case 1 => graft.sources.PdfText.synthesizeEncrypted(text, "rc4-128")
            case 2 => graft.sources.PdfText.synthesizeEncrypted(text, "aes-128")
            case 3 => graft.sources.PdfText.synthesizeEncrypted(text, "aes-256")
            case _ => graft.sources.PdfText.synthesizeCid(text)
          }
        }
        Tables.documents(s, d)
          .withColumn("pdf_raw", mkPdf(col("doc_id")))
          .select(col("doc_id"),
            graft.sources.Ingest.pdfTextUdf(col("pdf_raw")).as("pdf_text"))
      },
      Some("""SELECT doc_id, 'Vertraulich Nr. ' || doc_id || ' (rechtskräftig)' AS pdf_text
              FROM documents""")),

    // ---- S3 hostile tier (m5): the damage classes real court corpora
    // contain, with the extraction-vs-quarantine split oracle-stated —
    // wrong /Length recovers via the EOL-consistency fallback, every
    // other class yields a clean null (the reference's Tika-timeout /
    // log-and-skip path), never corrupted text. 1 of 5 classes
    // recovers → quarantine rate 80% on this fixture corpus.
    Q("m5_pdf_hostile",
      (s, d) => {
        Tables.documents(s, d)
          .withColumn("pdf_raw", hostilePdfUdf(col("doc_id")))
          .withColumn("pdf_text", graft.sources.Ingest.pdfTextUdf(col("pdf_raw")))
          .select(col("doc_id"), col("pdf_text"),
            col("pdf_text").isNull.as("quarantined"))
      },
      Some("""SELECT doc_id,
                CASE CAST(doc_id % 5 AS INT)
                  WHEN 0 THEN 'Urteil Nr. ' || doc_id || ' bleibt lesbar' END AS pdf_text,
                CAST(doc_id % 5 AS INT) <> 0 AS quarantined
              FROM documents""")),

    // ---- S3 exotic-CID upper tier (m6): Type0/Identity-H with NO
    // /ToUnicode but WITH an embedded TrueType font program — the
    // realistic shape of the class m5 pins as terminal-without-a-font.
    // Recovery inverts the font's own cmap table (glyph id → Unicode,
    // sources.TrueTypeCmap), the same tier Tika/PDFBox use
    // (text_to_database.py:256-287 territory). Per-row synthesis makes
    // every expected string known by construction.
    Q("m6_pdf_cid_fontcmap",
      (s, d) => {
        val mkPdf = udf { id: Long =>
          graft.sources.PdfText.synthesizeCidTrueType(
            s"Urteil Nr. $id der II. Kammer: Beschwerde abgewiesen.")
        }
        Tables.documents(s, d)
          .withColumn("pdf_raw", mkPdf(col("doc_id")))
          .withColumn("pdf_text", graft.sources.Ingest.pdfTextUdf(col("pdf_raw")))
          .select(col("doc_id"), col("pdf_text"))
      },
      Some("""SELECT doc_id,
                'Urteil Nr. ' || doc_id || ' der II. Kammer: Beschwerde abgewiesen.' AS pdf_text
              FROM documents""")),

    // ---- UNIFIED MEDIA CATALOG (the "opaque binary column with typed
    // metadata" contract end-to-end, all three modalities in ONE table):
    // each row carries a real payload of its modality (image / WAV /
    // PDF by doc_id%3), the decode dispatches per modality inside the
    // partition loop, and the catalog row unifies (modality, ok,
    // modality-specific detail) — the shape a 100 TB media lake
    // actually stores. Oracle restates every detail from the planted
    // ground truth of the matching tier.
    Q("x37_media_catalog",
      (s, d) => {
        val mk = udf { id: Long =>
          (id % 3) match {
            case 0 => MediaPipeline.synthesizeImage(id)
            case 1 => MediaPipeline.synthesizeWav(id)
            case _ => graft.sources.PdfText.synthesize(s"Dok $id", Seq("FlateDecode"))
          }
        }
        val decode = udf { (id: Long, b: Array[Byte]) =>
          (id % 3) match {
            case 0 =>
              val m = MediaPipeline.decodeImage(id, b)
              ("image", !m.quarantined, m.width.map(_.toLong).getOrElse(-1L))
            case 1 =>
              val m = MediaPipeline.decodeWav(id, b)
              ("audio", !m.quarantined, m.sample_rate.map(_.toLong).getOrElse(-1L))
            case _ =>
              val t = graft.sources.PdfText.extract(b)
              ("pdf", t != null, if (t == null) -1L else t.length.toLong)
          }
        }
        Tables.documents(s, d).select("doc_id")
          .repartition(s.sparkContext.defaultParallelism)
          .withColumn("payload", mk(col("doc_id")))
          .withColumn("m", decode(col("doc_id"), col("payload")))
          .select(col("doc_id"), col("m._1").as("modality"),
            col("m._2").as("ok"), col("m._3").as("detail"))
      },
      Some("""SELECT doc_id,
                CASE CAST(doc_id % 3 AS int) WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'pdf' END AS modality,
                true AS ok,
                CAST(CASE CAST(doc_id % 3 AS int)
                  WHEN 0 THEN 16 + doc_id % 48
                  WHEN 1 THEN CASE CAST(doc_id % 4 AS int) WHEN 0 THEN 8000
                       WHEN 1 THEN 11025 WHEN 2 THEN 16000 ELSE 22050 END
                  ELSE 4 + length(CAST(doc_id AS varchar)) END AS bigint) AS detail
              FROM documents""")),

    // ---- HYBRID PDF: text layer + embedded image XObject (the scanned
    // court-document shape — /DCTDecode stream IS a raw JPEG). The gate
    // extracts the text through the normal tier AND the image through
    // the XObject scan, then DECODES the embedded JPEG with the imageio
    // tier and cross-checks raster dims against the declared /Width
    // /Height — two independent decoders agreeing on the same planted
    // fixture.
    Q("m12_pdf_embedded_image",
      (s, d) => {
        val build = udf { id: Long =>
          val imgId = 4 * id + 1 // % 4 == 1 → jpeg
          graft.sources.PdfText.synthesizeWithImage(
            s"Scan Nr. $id", MediaPipeline.synthesizeImage(imgId),
            (16 + imgId % 48).toInt, (12 + imgId % 36).toInt)
        }
        val extract = udf { (id: Long, b: Array[Byte]) =>
          val text = graft.sources.PdfText.extract(b)
          graft.sources.PdfText.imageXObjects(b).headOption match {
            case Some((w, h, payload)) =>
              val dec = MediaPipeline.decodeImage(id, payload)
              (text, w, h,
                dec.width.contains(w) && dec.height.contains(h) &&
                  dec.format.contains("jpeg"))
            case None => (text, -1, -1, false)
          }
        }
        Tables.documents(s, d).select("doc_id")
          .repartition(s.sparkContext.defaultParallelism)
          .withColumn("r", extract(col("doc_id"), build(col("doc_id"))))
          .select(col("doc_id"), col("r._1").as("pdf_text"),
            col("r._2").as("img_w"), col("r._3").as("img_h"),
            col("r._4").as("dims_agree"))
      },
      Some("""SELECT doc_id, 'Scan Nr. ' || doc_id AS pdf_text,
                CAST(16 + (4 * doc_id + 1) % 48 AS int) AS img_w,
                CAST(12 + (4 * doc_id + 1) % 36 AS int) AS img_h,
                true AS dims_agree
              FROM documents""")),

    // ---- UNIFIED QUARANTINE CHANNEL (x39): the PDF (m5), media (m7),
    // and extractor (x15) hostile tiers all route their failures
    // through ONE envelope — struct<result, error> with error null ⟺
    // clean (sources.Quarantine) — and ONE shared sink storing the
    // normalized (tier, doc_id, error) rows. Previously each tier had
    // its own convention (null text / quarantined flag / per-UDF error
    // struct); the envelope unifies routing while result types stay
    // tier-specific. The gate drives all three hostile fixtures
    // through the shared sink and counts quarantines per tier;
    // n_with_error = n_quarantined proves every quarantined row
    // carries a reason. Oracle restates the planted failure rates.
    Q("x39_quarantine_unified",
      (s, d) => {
        import graft.sources.Quarantine
        val sinkPath = graft.queries.Scratch.dir("graft_x39_")
          .resolve("quarantine").toString
        val docs = Tables.documents(s, d)
        // PDF tier (the SHARED m5 fixture): null extracted text ⇒ quarantined
        val pdf = docs.withColumn("q", Quarantine.envelopeNullable(
          graft.sources.Ingest.pdfTextUdf(hostilePdfUdf(col("doc_id"))),
          "PdfQuarantined: no recoverable text"))
        Quarantine.appendQuarantined(pdf, "q", "pdf", "doc_id", sinkPath)
        // media tier (m7 fixture): quarantined flag ⇒ envelope error
        val media = MediaPipeline.decodeMeta(
          MediaPipeline.withHostilePayload(docs)).toDF()
          .withColumn("q", Quarantine.envelope(
            struct(col("format"), col("width"), col("height")),
            when(col("quarantined"), lit("MediaQuarantined: undecodable payload"))))
        Quarantine.appendQuarantined(media, "q", "media", "doc_id", sinkPath)
        // extractor tier (the SHARED x15 fixture): strict validation
        // raises real error strings inside the safe UDF
        val ext = docs.withColumn("ext",
          graft.extract.ExtractUdfs.judgmentsSpiderSafe(
            lit("UR_Gerichte"), expr(ExtractQueries.urRulingsCase), lit("de")))
          .withColumn("q", Quarantine.envelope(col("ext.outcomes"), col("ext.error")))
        Quarantine.appendQuarantined(ext, "q", "extract", "doc_id", sinkPath)
        s.read.parquet(sinkPath)
          .groupBy("tier")
          .agg(count(lit(1)).as("n_quarantined"),
            countDistinct("doc_id").as("n_docs"),
            sum(col("error").isNotNull.cast("long")).as("n_with_error"))
      },
      Some("""SELECT 'pdf' AS tier, count(*) AS n_quarantined,
                     count(*) AS n_docs, count(*) AS n_with_error
              FROM documents WHERE doc_id % 5 <> 0
              UNION ALL
              SELECT 'media', count(*), count(*), count(*)
              FROM documents WHERE doc_id % 4 <> 0
              UNION ALL
              SELECT 'extract', count(*), count(*), count(*)
              FROM documents WHERE doc_id % 4 IN (2, 3)""")),

    // ---- Sliding 1-hour windows every 15 min (batch dual of
    // streaming.EventStreams.slidingCounts): each row lands in exactly 4
    // windows — explode the 4 offsets, then one hash agg.
    Q("e5_sliding_window",
      (s, d) => {
        val slideUs = 900L * 1000000L
        Tables.events(s, d)
          .withColumn("j", explode(expr("sequence(0, 3)")))
          .groupBy(((expr(s"ts_us div $slideUs") - col("j")) * slideUs)
            .as("window_start_us"))
          .agg(count(lit(1)).as("n_events"))
      },
      Some(s"""SELECT ((epoch_ns(ts) // 1000 // 900000000) - j) * 900000000 AS window_start_us,
              count(*) AS n_events
              FROM events CROSS JOIN (SELECT unnest(range(4)) AS j)
              GROUP BY 1""")),
  )
}
