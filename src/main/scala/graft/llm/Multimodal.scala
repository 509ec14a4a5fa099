package graft.llm

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** An opaque binary payload column standing in for image/audio/video
  * bytes (north-star "multimodal columns"). */
case class BinaryDoc(doc_id: Long, payload: Array[Byte])

/** Typed metadata produced by the decode stage. */
case class ImageMeta(doc_id: Long, width: Int, height: Int,
    channels: Int, mean_intensity: Double)

/** Output schema of the resize stage. */
case class ResizedMeta(doc_id: Long, width: Int, height: Int,
    out_w: Int, out_h: Int)

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed, schema'd metadata extraction (north-star extension — the
  * reference has nothing beyond strings).
  *
  * The image/audio codec libraries are not in this container, so the
  * decode step is a DETERMINISTIC STUB — [[Multimodal.decodeStub]]
  * derives fake dimensions from the payload's leading bytes. Everything
  * around it is real and is the part that matters at 100 TB: a binary
  * column through a Parquet scan, a typed `Dataset[BinaryDoc]` with
  * per-partition batch processing (`mapPartitions` — the decoder is
  * initialized once per partition, not per row, exactly how a real
  * codec/JNI handle must be managed), and a stable output schema that
  * downstream relational ops consume.
  *
  * The payload here is synthesized as `unhex(md5(text))` (16 bytes) so
  * the DuckDB oracle can recompute the stub's outputs from the same hex
  * digits — byte i = 16·hexval(2i+1) + hexval(2i+2).
  */
object Multimodal {

  /** Attach the synthetic binary payload column. At 100 TB this is the
    * Parquet binary column itself; the synthesis is only because the
    * fixture tables carry no media bytes. */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), unhex(md5(col("text"))).as("payload"))

  /** STUB decoder — stands in for image decode + feature extraction.
    * Deterministic: width/height/channels from the first 3 bytes, mean
    * intensity over the first 4 (exact: quarters are binary-exact
    * doubles). Real plumbing: one decoder "handle" per partition,
    * streaming rows through it. */
  def decodeStub(ds: Dataset[BinaryDoc]): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init would go here (codec/JNI handle)
      rows.map { d =>
        val b = d.payload.map(_ & 0xff)
        ImageMeta(d.doc_id,
          width = 64 + b(0) % 64,
          height = 64 + b(1) % 64,
          channels = 1 + b(2) % 3,
          mean_intensity = (b(0) + b(1) + b(2) + b(3)) / 4.0)
      }
    }
  }

  /** STUB resize — stands in for the pixel-resample kernel: fit into a
    * 224×224 box preserving aspect ratio. All-integer arithmetic
    * (`w·224 div max(w,h)`) so the oracle twin is bit-exact. Same
    * per-partition shape as [[decodeStub]]: a real resampler allocates
    * its buffers once per partition. */
  def resizeStub(ds: Dataset[ImageMeta], box: Int = 224): Dataset[ResizedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition resample-buffer allocation would go here
      rows.map { m =>
        val longSide = math.max(m.width, m.height)
        ResizedMeta(m.doc_id, m.width, m.height,
          out_w = m.width * box / longSide,
          out_h = m.height * box / longSide)
      }
    }
  }

  /** Hex-digit value via ascii — portable to the oracle verbatim. */
  private def hv(pos: Int) =
    s"(ascii(substr(h, $pos, 1)) - (CASE WHEN substr(h, $pos, 1) >= 'a' THEN 87 ELSE 48 END))"
  private def byteAt(i: Int) = s"(${hv(2 * i + 1)} * 16 + ${hv(2 * i + 2)})"

  val queries: Map[String, Q] = Map(
    // Full typed path: scan → binary column → Dataset[BinaryDoc] →
    // mapPartitions decode stub → typed metadata → sort. The oracle
    // recomputes the stub arithmetic from the md5 hex digits.
    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = attachPayload(Tables(s, dir, "documents")).as[BinaryDoc]
      decodeStub(docs).toDF().orderBy("doc_id")
    }),

    // Resize stage: decode → aspect-preserving fit into 224×224 —
    // the standard vision-pipeline preprocessing step, typed end to
    // end (Dataset[BinaryDoc] → Dataset[ImageMeta] → Dataset[ResizedMeta]).
    "q_multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      val docs = attachPayload(Tables(s, dir, "documents")).as[BinaryDoc]
      resizeStub(decodeStub(docs)).toDF().orderBy("doc_id")
    }),

    // Format sniffing + byte-level QA stats — the one multimodal stage
    // that needs NO codec and is therefore fully real here: magic-byte
    // classification (the dispatch step that routes a payload to the
    // right decoder) and exact integer corruption-screen stats
    // (distinct-byte count, modal byte frequency, byte checksum — a
    // truncated/zero-filled payload shows up as collapsed byte
    // diversity long before a decoder rejects it). Everything is
    // integer-exact, so the oracle hash-gates it like any relational
    // query; Shannon entropy is deliberately NOT computed — log() is
    // transcendental and cross-engine bit-equality would be luck, and
    // (n_distinct, max_freq) carries the same screen signal exactly.
    // On md5-synthesized payloads the magic arms rarely fire (each is
    // a 2⁻¹⁶ prefix match) — the dispatch CODE is what ships; real
    // payloads hit real arms.
    "q_multimodal_sniff" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .withColumn("bytes", expr(
          "transform(sequence(0, 15), i -> " +
            "(ascii(substr(h, 2*i+1, 1)) - (CASE WHEN substr(h, 2*i+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 + " +
            "(ascii(substr(h, 2*i+2, 1)) - (CASE WHEN substr(h, 2*i+2, 1) >= 'a' THEN 87 ELSE 48 END)))"))
        .select(col("doc_id"),
          expr("""CASE WHEN substring(h, 1, 4) = 'ffd8' THEN 'jpeg'
                |     WHEN substring(h, 1, 8) = '89504e47' THEN 'png'
                |     WHEN substring(h, 1, 6) = '474946' THEN 'gif'
                |     WHEN substring(h, 1, 8) = '52494646' THEN 'riff'
                |     ELSE 'unknown' END""".stripMargin).as("format"),
          size(array_distinct(col("bytes"))).as("n_distinct"),
          expr("array_max(transform(array_distinct(bytes), " +
            "w -> size(filter(bytes, x -> x = w))))").as("max_freq"),
          expr("aggregate(bytes, 0L, (a, x) -> a + x)").as("checksum"))
        .orderBy("doc_id")
    }),

    // Frame-sampling analog: the 16-byte payload split into 4 fixed
    // "frames", each with an index + checksum — the schema/partitioning
    // shape of video frame extraction, minus the codec.
    "q_multimodal_frames" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .select(col("doc_id"), col("h"), explode(expr("sequence(0, 3)")).as("frame"))
        .withColumn("checksum", expr(
          "aggregate(transform(sequence(1, 8), " +
            "k -> ascii(substr(h, frame * 8 + k, 1)) - " +
            "(CASE WHEN substr(h, frame * 8 + k, 1) >= 'a' THEN 87 ELSE 48 END)), " +
            "0L, (acc, v) -> acc + v)"))
        .select(col("doc_id"), col("frame"), col("checksum"))
        .orderBy("doc_id", "frame")
    }))

  val oracles: Map[String, String] = Map(
    "q_multimodal_decode" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                   ${byteAt(2)} AS b2, ${byteAt(3)} AS b3
            FROM hx)
      SELECT doc_id,
             CAST(64 + b0 % 64 AS INT) AS width,
             CAST(64 + b1 % 64 AS INT) AS height,
             CAST(1 + b2 % 3 AS INT) AS channels,
             CAST(b0 + b1 + b2 + b3 AS DOUBLE) / 4 AS mean_intensity
      FROM b ORDER BY doc_id""",
    "q_multimodal_resize" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1 FROM hx),
      wh AS (SELECT doc_id, 64 + b0 % 64 AS w, 64 + b1 % 64 AS hh FROM b)
      SELECT doc_id,
             CAST(w AS INT) AS width, CAST(hh AS INT) AS height,
             CAST(w * 224 // greatest(w, hh) AS INT) AS out_w,
             CAST(hh * 224 // greatest(w, hh) AS INT) AS out_h
      FROM wh ORDER BY doc_id""",
    "q_multimodal_sniff" -> """
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      bt AS (SELECT doc_id, h, list_transform(generate_series(0, 15), i ->
               (ascii(substr(h, 2*i+1, 1)) - (CASE WHEN substr(h, 2*i+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
               (ascii(substr(h, 2*i+2, 1)) - (CASE WHEN substr(h, 2*i+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS bytes
             FROM hx)
      SELECT doc_id,
             CASE WHEN substr(h, 1, 4) = 'ffd8' THEN 'jpeg'
                  WHEN substr(h, 1, 8) = '89504e47' THEN 'png'
                  WHEN substr(h, 1, 6) = '474946' THEN 'gif'
                  WHEN substr(h, 1, 8) = '52494646' THEN 'riff'
                  ELSE 'unknown' END AS format,
             CAST(len(list_distinct(bytes)) AS INT) AS n_distinct,
             CAST(list_max(list_transform(list_distinct(bytes),
               w -> len(list_filter(bytes, x -> x = w)))) AS INT) AS max_freq,
             CAST(list_sum(bytes) AS BIGINT) AS checksum
      FROM bt ORDER BY doc_id""",
    "q_multimodal_frames" -> """
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents)
      SELECT doc_id, CAST(frame AS INT) AS frame,
             CAST(list_sum(list_transform(generate_series(1, 8),
               k -> ascii(substr(h, frame * 8 + k, 1)) -
                    (CASE WHEN substr(h, frame * 8 + k, 1) >= 'a' THEN 87 ELSE 48 END))) AS BIGINT) AS checksum
      FROM hx, UNNEST(generate_series(0, 3)) AS g(frame)
      ORDER BY doc_id, frame""")
}
