package graft.llm

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
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

/** Typed output of the REAL resize stage (nearest-neighbor over
  * genuinely decoded P6 pixels): status, source and target dims, exact
  * per-channel sums over the SAMPLED pixels, and the packed top-left
  * sample (r·65536 + g·256 + b) that pins the index map's rounding
  * direction in the hash gate. */
case class ResizedRealMeta(doc_id: Long, status: String,
    width: Option[Int], height: Option[Int], out_w: Option[Int],
    out_h: Option[Int], r_sum: Option[Long], g_sum: Option[Long],
    b_sum: Option[Long], top_left: Option[Long])

/** One row of the HTML text-extraction stage: parse status (`ok` /
  * `truncated` — EOF before the html close tag / `no_markup` — a
  * plain-text payload routed around the tag walk), block census, and
  * the md5 of the boilerplate-filtered kept text (NULL when nothing
  * survives the filter). */
case class HtmlExtract(doc_id: Long, status: String, n_blocks: Int,
    n_kept: Int, n_script: Int, kept_hash: Option[String])

/** Typed output of the perceptual-hash stage: dHash over genuinely
  * decoded P6 pixels, packed as two 32-bit halves (hi = comparison
  * bits 32..63, lo = 0..31) so the DuckDB twin can rebuild each half
  * with shifts that never touch the BIGINT sign bit. */
case class PhashMeta(doc_id: Long, status: String,
    dhash_hi: Option[Long], dhash_lo: Option[Long])

/** Typed output of the REAL (non-stub) PPM decode: parse status,
  * header fields, and exact raster stats. Nullable fields are None
  * wherever the parse did not get far enough to produce them. */
case class PpmMeta(doc_id: Long, status: String,
    width: Option[Int], height: Option[Int], maxval: Option[Int],
    r_sum: Option[Long], g_sum: Option[Long], b_sum: Option[Long],
    px_min: Option[Int], px_max: Option[Int])

/** Typed output of the REAL WAV decode: parse status, fmt-chunk
  * fields, and exact PCM sample stats (8-bit unsigned). */
case class WavMeta(doc_id: Long, status: String,
    n_channels: Option[Int], sample_rate: Option[Int], bits: Option[Int],
    n_samples: Option[Long], s_sum: Option[Long],
    s_min: Option[Int], s_max: Option[Int], n_clip: Option[Long])

/** Typed output of the REAL BMP decode: parse status, header fields
  * (height always positive — `top_down` carries the sign bit), exact
  * per-channel sums over the LOGICAL image, and the top-row checksum
  * that makes row order observable in the hash gate. */
case class TiffMeta(doc_id: Long, status: String,
    byte_order: Option[String], width: Option[Int], height: Option[Int],
    px_sum: Option[Long], px_min: Option[Int], px_max: Option[Int],
    top_row_sum: Option[Long])

case class BmpMeta(doc_id: Long, status: String,
    width: Option[Int], height: Option[Int], bpp: Option[Int],
    top_down: Option[Int], r_sum: Option[Long], g_sum: Option[Long],
    b_sum: Option[Long], px_min: Option[Int], px_max: Option[Int],
    top_row_sum: Option[Long])

/** Typed output of the REAL QOI decode (the first COMPRESSED format
  * in the decode family): parse status, header dims, exact per-channel
  * sums over the decoded pixels, and the count of run-emitted pixels —
  * the decoder-path evidence that run-length chunks were actually
  * taken, observable in the hash gate. */
case class QoiMeta(doc_id: Long, status: String,
    width: Option[Int], height: Option[Int],
    r_sum: Option[Long], g_sum: Option[Long], b_sum: Option[Long],
    px_min: Option[Int], px_max: Option[Int], n_run_px: Option[Long])

/** One fixed-length analysis frame of decoded audio — the feature
  * stage downstream of [[Multimodal.parseWav]]: exact integer energy
  * (sum of squared deviations from the 8-bit midpoint 128) and the
  * zero-crossing count (sign changes across the midpoint), the two
  * classic speech/music discriminators, plus the raw sample sum. */
case class AudioFrame(doc_id: Long, frame: Int, n_s: Int,
    s_sum: Long, energy: Long, zcr: Int)

/** Typed output of the REAL GIF decode — the second COMPRESSED format
  * and the first DICTIONARY coder (LZW with variable-width codes): parse
  * status, logical-screen dims, palette size, exact per-channel sums
  * through the global color table, and the logical-top-row checksum
  * that makes DE-INTERLACING observable in the hash gate (an interlaced
  * GIF stores rows in 4-pass order; a decoder that skips the
  * permutation gets row0_sum wrong while all whole-image sums stay
  * right). */
case class GifMeta(doc_id: Long, status: String,
    width: Option[Int], height: Option[Int], n_colors: Option[Int],
    interlaced: Option[Int], r_sum: Option[Long], g_sum: Option[Long],
    b_sum: Option[Long], px_min: Option[Int], px_max: Option[Int],
    row0_sum: Option[Long])

/** Typed output of the REAL PNG decode — the third COMPRESSED format
  * and the first ENTROPY coder (RFC 1951 DEFLATE: bit-level prefix
  * codes + LZ77 back-references, under the RFC 1950 zlib wrapper and
  * the PNG chunk container with CRC-32 integrity): parse status,
  * IHDR fields, the IDAT chunk count (pins multi-chunk zlib-stream
  * reassembly in the hash gate), exact per-channel sums, and the
  * top-row checksum that makes per-row FILTER INVERSION (None / Sub /
  * Up / Average / Paeth) observable — a decoder that mis-predicts any
  * filter gets the sums wrong. */
case class PngMeta(doc_id: Long, status: String,
    width: Option[Int], height: Option[Int], color_type: Option[Int],
    n_idat: Option[Int], r_sum: Option[Long], g_sum: Option[Long],
    b_sum: Option[Long], px_min: Option[Int], px_max: Option[Int],
    row0_sum: Option[Long])

/** Typed output of the REAL baseline-JPEG decode (ITU-T T.81 SOF0) —
  * the image format that dominates real crawls, and the family's
  * first full transform codec: marker walk, DQT/DHT table parsing,
  * MSB-first entropy decode with FF00 unstuffing, dequantization,
  * de-zigzag, fixed-point 8×8 IDCT, level shift, and the JFIF
  * integer YCbCr→RGB. Columns follow the [[PngMeta]] discipline:
  * exact per-channel sums over the DECODED RGB pixels, min/max, and
  * a top-row checksum that pins MCU raster order and the block
  * layout. `n_blocks` = total 8×8 blocks entropy-decoded. */
case class JpegMeta(doc_id: Long, status: String,
    width: Option[Int], height: Option[Int], n_blocks: Option[Int],
    r_sum: Option[Long], g_sum: Option[Long], b_sum: Option[Long],
    px_min: Option[Int], px_max: Option[Int], row0_sum: Option[Long])

/** Typed output of the JPEG APP1/Exif METADATA extraction — the
  * orientation/camera pass a real image pipeline runs before any
  * pixel work (EXIF orientation decides whether the decoded raster
  * needs a rotate; composed decoders: the JPEG marker walk around a
  * dual-endian TIFF IFD). `n_ifd` = IFD0 entry count; width/height
  * come from the SOF header past the APP1, proving the walk
  * continues through the metadata segment. */
case class ExifMeta(doc_id: Long, status: String,
    byte_order: Option[String], orientation: Option[Int],
    make: Option[String], n_ifd: Option[Int],
    width: Option[Int], height: Option[Int],
    gps_lat_mas: Option[Long])

/** Typed output of the ORIENTED decode — the rotate/flip stage every
  * image pipeline runs between Exif read and pixel work (dHash,
  * resize): the Exif Orientation tag (default 1 when absent or
  * unreadable) applied to the decoded raster as an exact index map.
  * `o_checksum` / `o_row0_wsum` are position-weighted sums over the
  * ORIENTED coordinates, so every one of the 8 tag values yields a
  * distinct, hash-gateable value on generic content (plain channel
  * sums are rotation/flip-invariant and could not prove the transform
  * ran); `r_sum` ties the row back to the un-oriented decode. */
case class JpegOriented(doc_id: Long, status: String, orientation: Int,
    ow: Option[Int], oh: Option[Int], o_checksum: Option[Long],
    o_row0_wsum: Option[Long], r_sum: Option[Long])

/** Typed output of the REAL PDF text extraction — the crawl format
  * every Common-Crawl-scale pipeline carries beside HTML: per-doc
  * page census (xref → catalog → pages → kids walk), object count,
  * text-showing operator count (Tj + TJ), and the extracted text's
  * exact length + md5 — the dedup/quality key downstream stages use.
  * Malformed input degrades to a status row, never a throw. */
case class PdfMeta(doc_id: Long, status: String, n_pages: Option[Int],
    n_objects: Option[Int], n_text_ops: Option[Int],
    n_chars: Option[Int], text_md5: Option[String])

/** Typed output of the REAL gzip decode — the crawl-decompression
  * stage (RFC 1952; WARC payloads arrive as gzip members): status,
  * the FNAME-flag evidence the optional-field walk ran, and exact
  * text-ingest stats over the decoded payload (byte count, byte sum,
  * separator count, first byte). */
case class GzipMeta(doc_id: Long, status: String, has_name: Option[Int],
    n_bytes: Option[Int], sum_bytes: Option[Long], n_sep: Option[Long],
    first_byte: Option[Int])

/** Typed output of the WARC-record ingest stage: gzip-member decode
  * status, the WARC-Target-URI pulled from the record header, and the
  * record/body sizes the downstream funnel gates on. */
case class WarcMeta(doc_id: Long, status: String, url: Option[String],
    n_bytes: Option[Int], body_bytes: Option[Int])

/** [[WarcMeta]] with the decoded BODY carried along — the crawl
  * pipeline's working row (the funnel query only needs sizes). */
case class WarcDoc(doc_id: Long, status: String, url: Option[String],
    body: Option[String])

/** One row of the ZIP archive ingest — the decode family's first
  * 1→N container: a healthy archive yields one row PER MEMBER
  * (`member` 0..n-1) with the member's central-directory identity
  * (name, method) and exact text-ingest stats over its decompressed
  * payload; an archive that fails before the member walk yields ONE
  * row with `member` = -1 and the failure status (`truncated` /
  * `bad_eocd` / `bad_cd`). A member whose payload fails its CRC-32
  * or size check keeps its identity with NULL stats (`bad_data`) —
  * the per-member funnel a crawl's archive blobs need. */
case class ZipMember(doc_id: Long, member: Int, status: String,
    name: Option[String], method: Option[String], n_bytes: Option[Int],
    sum_bytes: Option[Long], n_sep: Option[Long])

/** One row of the TAR archive ingest — the decode family's SECOND
  * 1→N container, and the distribution unit public corpora actually
  * ship as (The Pile / RedPajama tarballs): a healthy archive yields
  * one row per member with its ustar identity (prefix-joined name)
  * and exact text-ingest stats; container-level failures (`truncated`
  * / `empty` / `bad_magic`) yield ONE `member` = -1 row. TAR is a
  * POSITIONAL container (no central directory to cross-check), so
  * header-level failures stop the walk WITH a row — `bad_checksum`
  * (the header can't be trusted, including its size field, so no
  * resync is possible), `bad_header` (unparseable size octal), and
  * `short_data` (the archive ends inside the member's data). */
case class TarMember(doc_id: Long, member: Int, status: String,
    name: Option[String], n_bytes: Option[Int],
    sum_bytes: Option[Long], n_sep: Option[Long])

/** The member grain WITH its decoded text — what the archive-member
  * dedup screen consumes: one row per member row of [[parseZip]],
  * `text` present exactly on `ok` members. */
case class ZipTextMember(doc_id: Long, member: Int, status: String,
    text: Option[String])

/** One SAMPLED (or failed) frame of the video frame-sampling stage —
  * the fps-reduction op a multimodal pipeline runs before feature
  * extraction: a healthy F-frame stream yields one row per KEPT frame
  * (every k-th), a mid-stream failure yields its frame's status row
  * and stops the walk (positional container — no resync without a
  * magic scan). */
case class VideoFrame(doc_id: Long, frame: Int, status: String,
    width: Option[Int], height: Option[Int],
    r_sum: Option[Long], g_sum: Option[Long], b_sum: Option[Long])

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

  /** Synthesize a REAL P6 (binary) PPM byte stream per document,
    * deterministically from the doc's md5 — the fixture tables carry no
    * media bytes, but the PAYLOAD built here is a genuine netpbm file:
    * ASCII header (`P6`, optional `#` comment line, width, height,
    * maxval) followed by a `w·h·3`-byte RGB raster (raster bytes cycle
    * the 16 md5 bytes). Three md5-derived arms exercise the parser's
    * failure paths exactly like a real crawl does: a corrupted magic
    * (`X6`, ~6%), a comment line in the header (~25%), and a raster
    * truncated 2 bytes short (~12.5%). Dimensions are 1..4 so the
    * raster never outruns `repeat(h, 3)`'s 48 bytes. */
  def ppmPayload(docs: DataFrame): DataFrame = ppmPayloadKeep(docs, Nil)

  /** [[ppmPayload]] with passthrough columns — the cross-modal gate
    * carries `source` beside the payload so the whole synth+decode
    * stays one scan. */
  def ppmPayloadKeep(docs: DataFrame, keep: Seq[String]): DataFrame =
    docs.select(col("doc_id") +: keep.map(col) :+ md5(col("text")).as("h"): _*)
      .withColumn("b0", expr(byteAt(0)))
      .withColumn("b1", expr(byteAt(1)))
      .withColumn("b13", expr(byteAt(13)))
      .withColumn("b14", expr(byteAt(14)))
      .withColumn("b15", expr(byteAt(15)))
      .withColumn("w", expr("1 + b0 % 4"))
      .withColumn("hh", expr("1 + b1 % 4"))
      .withColumn("rhex", expr(
        "substring(repeat(h, 3), 1, 2 * (w * hh * 3) - " +
          "(CASE WHEN b15 % 8 = 0 THEN 4 ELSE 0 END))"))
      .withColumn("hdr", expr(
        "concat(CASE WHEN b13 % 16 = 0 THEN 'X6' ELSE 'P6' END, '\n', " +
          "CASE WHEN b14 % 4 = 0 THEN '# synthetic fixture\n' ELSE '' END, " +
          "cast(w AS string), ' ', cast(hh AS string), '\n255\n')"))
      .select(col("doc_id") +: keep.map(col) :+
        concat(encode(col("hdr"), "UTF-8"), unhex(col("rhex"))).as("payload"): _*)

  /** REAL from-scratch P6 PPM parser — the honest decode path the
    * stubs below can't be (no codec library in the container, but
    * netpbm needs none): magic check, whitespace/`#`-comment skipping,
    * ASCII integer header fields, the single post-maxval whitespace
    * byte, then exact integer raster stats (per-channel sums, global
    * min/max). Malformed inputs degrade to a status, never a throw —
    * at 100 TB a decode stage that crashes on one truncated crawl blob
    * kills the task, so every failure is a ROW (`bad_magic`,
    * `bad_header`, `unsupported_maxval`, `truncated`), filterable
    * downstream like any other QA signal. */
  /** P6 header walk shared by the decode and resize stages: magic,
    * whitespace/`#`-comment skipping, ASCII header ints, the single
    * post-maxval whitespace. Returns (status, w, h, mv, rasterOffset);
    * rasterOffset is valid only when status == "ok" (full raster
    * present). */
  private def ppmHeader(p: Array[Byte]): (String, Int, Int, Int, Int) = {
    if (p == null || p.length < 2 || p(0) != 'P' || p(1) != '6')
      return ("bad_magic", -1, -1, -1, -1)
    var i = 2
    def eof = i >= p.length
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def parseInt(): Int = { // -1 = parse failure
      var go = true
      while (go && !eof) { // skip whitespace and # comments
        if (isWs(p(i))) i += 1
        else if (p(i) == '#') { while (!eof && p(i) != '\n') i += 1 }
        else go = false
      }
      var v = 0L
      var any = false
      while (!eof && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    val w = parseInt(); val h = parseInt(); val mv = parseInt()
    if (w <= 0 || h <= 0 || mv <= 0) return ("bad_header", -1, -1, -1, -1)
    if (mv > 255) // 2-byte samples — out of scope for this decoder
      return ("unsupported_maxval", w, h, mv, -1)
    if (!eof && isWs(p(i))) i += 1 // exactly ONE whitespace, then raster
    if (p.length - i < w.toLong * h * 3) return ("truncated", w, h, mv, -1)
    ("ok", w, h, mv, i)
  }

  private[llm] def parsePpm(id: Long, p: Array[Byte]): PpmMeta = {
    val none = PpmMeta(id, "bad_magic", None, None, None, None, None, None, None, None)
    val (st, w, h, mv, off) = ppmHeader(p)
    if (st == "bad_magic" || st == "bad_header") return none.copy(status = st)
    if (st != "ok")
      return none.copy(status = st,
        width = Some(w), height = Some(h), maxval = Some(mv))
    val need = w.toLong * h * 3
    var rs = 0L; var gs = 0L; var bs = 0L
    var mn = 255; var mx = 0
    var k = 0
    while (k < need) {
      val v = p(off + k) & 0xff
      (k % 3: @annotation.switch) match {
        case 0 => rs += v
        case 1 => gs += v
        case _ => bs += v
      }
      if (v < mn) mn = v
      if (v > mx) mx = v
      k += 1
    }
    PpmMeta(id, "ok", Some(w), Some(h), Some(mv),
      Some(rs), Some(gs), Some(bs), Some(mn), Some(mx))
  }

  /** REAL resize over genuinely decoded pixels — the decode→transform
    * stage the stub below stands in for when no decoder exists:
    * nearest-neighbor sampling (src = (out·in) div out_dim, the
    * classic integer NN index map) of the parsed P6 raster down to
    * ow×oh, with exact per-channel sums over the sampled pixels and
    * the packed top-left sample pinning WHICH pixels were chosen (a
    * wrong rounding direction in the index map changes top_left before
    * it changes any sum). Failure statuses flow through from the
    * header walk as rows, decode-family contract. */
  private[llm] def resizePpm(id: Long, p: Array[Byte], ow: Int,
      oh: Int): ResizedRealMeta = {
    val none = ResizedRealMeta(id, "bad_magic", None, None, None, None,
      None, None, None, None)
    val (st, w, h, _, off) = ppmHeader(p)
    if (st == "bad_magic" || st == "bad_header") return none.copy(status = st)
    if (st != "ok")
      return none.copy(status = st, width = Some(w), height = Some(h))
    var rs = 0L; var gs = 0L; var bs = 0L; var tl = 0L
    var r = 0
    while (r < oh) {
      var c = 0
      while (c < ow) {
        val base = off + ((r * h / oh) * w + (c * w / ow)) * 3
        val rr = p(base) & 0xff
        val gg = p(base + 1) & 0xff
        val bb = p(base + 2) & 0xff
        rs += rr; gs += gg; bs += bb
        if (r == 0 && c == 0) tl = rr * 65536L + gg * 256L + bb
        c += 1
      }
      r += 1
    }
    ResizedRealMeta(id, "ok", Some(w), Some(h), Some(ow), Some(oh),
      Some(rs), Some(gs), Some(bs), Some(tl))
  }

  /** dHash (difference hash) over genuinely decoded P6 pixels — the
    * perceptual fingerprint image-dedup pipelines key on (the LAION
    * recipe's cheap tier; Krawetz 2013 popularized the algorithm):
    * nearest-neighbor sample an 8×9 gray grid (gray = exact channel
    * sum — monotone in luma, integer-exact), then 64 bits, bit
    * (r,c) = gray(r,c) < gray(r,c+1), packed into two 32-bit halves.
    * Same index-map convention as [[resizePpm]] (src = out·in div
    * out_dim), so one rounding discipline covers both stages. */
  private[graft] def dhashPpm(id: Long, p: Array[Byte]): PhashMeta = {
    val (st, w, h, _, off) = ppmHeader(p)
    if (st != "ok") return PhashMeta(id, st, None, None)
    val grays = new Array[Int](8 * 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val base = off + ((r * h / 8) * w + (c * w / 9)) * 3
        grays(r * 9 + c) = (p(base) & 0xff) + (p(base + 1) & 0xff) +
          (p(base + 2) & 0xff)
        c += 1
      }
      r += 1
    }
    var lo = 0L; var hi = 0L
    var k = 0
    while (k < 64) {
      val rr = k / 8; val cc = k % 8
      if (grays(rr * 9 + cc) < grays(rr * 9 + cc + 1)) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    PhashMeta(id, "ok", Some(hi), Some(lo))
  }

  /** The typed decode stage over [[parsePpm]] — same per-partition
    * shape as the stubs (a real decoder's buffers/handles initialize
    * once per partition, rows stream through). */
  def decodePpm(ds: Dataset[BinaryDoc]): Dataset[PpmMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.map(d => parsePpm(d.doc_id, d.payload))
    }
  }

  /** Synthesize a REAL RIFF/WAVE byte stream from a doc's md5 hex — a
    * genuine canonical-form WAV file (RIFF size + `WAVE` + `fmt `
    * PCM/8-bit header + `data` chunk, all little-endian per the spec),
    * with md5-driven arms exercising the parser's failure and
    * chunk-walk paths the way a real crawl does: corrupted magic
    * (`XIFF`, ~6%), an extra `LIST`/`INFO` chunk before `fmt ` that a
    * correct RIFF walk must SKIP (~25%), and a data chunk truncated
    * one byte short of its declared size (~12.5%). Samples are the
    * md5's own bytes (1..8 per channel, 1..2 channels ⇒ ≤16 bytes, no
    * wrap), so the oracle recomputes the expected stats from the hex
    * digits while the Spark side parses actual bytes. */
  private[llm] def wavBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(13) % 16 == 0
    val hasList = b(14) % 4 == 0
    val trunc = b(15) % 8 == 0
    val nch = 1 + b(2) % 2
    val n = 1 + b(3) % 8 // samples per channel
    val dataLen = n * nch
    val out = new java.io.ByteArrayOutputStream(64)
    def w32(v: Int): Unit = { out.write(v & 255); out.write((v >> 8) & 255)
      out.write((v >> 16) & 255); out.write((v >> 24) & 255) }
    def w16(v: Int): Unit = { out.write(v & 255); out.write((v >> 8) & 255) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag(if (badMagic) "XIFF" else "RIFF")
    w32(4 + (if (hasList) 12 else 0) + 24 + 8 + dataLen)
    tag("WAVE")
    if (hasList) { tag("LIST"); w32(4); tag("INFO") }
    tag("fmt "); w32(16); w16(1); w16(nch); w32(8000); w32(8000 * nch)
    w16(nch); w16(8)
    tag("data"); w32(dataLen)
    var k = 0
    val actual = if (trunc) dataLen - 1 else dataLen
    while (k < actual) { out.write(b(k % 16)); k += 1 }
    out.toByteArray
  }

  /** REAL from-scratch RIFF/WAV parser — the second honest decode path
    * (canonical PCM WAV needs no codec): magic + `WAVE` check, a
    * word-aligned chunk WALK that skips unknown chunks (the property
    * that makes real-world WAVs with `LIST`/`bext`/`cue ` metadata
    * parseable), `fmt ` field extraction, declared-vs-available data
    * length check, then exact integer sample stats (sum, min, max, and
    * the clipped-sample count — the audio-QA signal). 8-bit unsigned
    * mono/stereo PCM only; anything else degrades to a `bad_fmt` ROW,
    * truncation to `truncated`, a non-RIFF payload to `bad_magic` —
    * never a throw, for the same reason as [[parsePpm]]. */
  private[llm] def parseWav(id: Long, p: Array[Byte]): WavMeta = {
    val none = WavMeta(id, "bad_magic", None, None, None, None, None, None, None, None)
    if (p == null || p.length < 12) return none
    def u32(i: Int): Long = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return none
    var i = 12
    var fmt = -1; var nch = -1; var rate = -1; var bits = -1; var haveFmt = false
    while (i + 8 <= p.length) {
      val t = tag(i); val sz = u32(i + 4)
      if (sz > p.length) { // corrupt declared size: can't even skip it
        if (t != "data") return none.copy(status = "bad_fmt")
      }
      if (t == "fmt " && i + 8 + 16 <= p.length) {
        fmt = u16(i + 8); nch = u16(i + 10); rate = u32(i + 12).toInt
        bits = u16(i + 22); haveFmt = true
      } else if (t == "data") {
        if (!haveFmt || fmt != 1 || bits != 8 || nch <= 0)
          return none.copy(status = "bad_fmt")
        val avail = p.length - (i + 8)
        if (avail < sz)
          return none.copy(status = "truncated", n_channels = Some(nch),
            sample_rate = Some(rate), bits = Some(bits))
        var ss = 0L; var mn = 255; var mx = 0; var clip = 0L
        var k = 0
        while (k < sz) {
          val v = p(i + 8 + k) & 0xff
          ss += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          if (v == 0 || v == 255) clip += 1
          k += 1
        }
        return WavMeta(id, "ok", Some(nch), Some(rate), Some(bits),
          Some(sz / nch), Some(ss), Some(mn), Some(mx), Some(clip))
      }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    none.copy(status = "bad_fmt") // RIFF/WAVE but no usable data chunk
  }

  /** The typed WAV decode stage over [[parseWav]] — same per-partition
    * shape as [[decodePpm]]. */
  def decodeWav(ds: Dataset[BinaryDoc]): Dataset[WavMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.map(d => parseWav(d.doc_id, d.payload))
    }
  }

  /** Audio FEATURE EXTRACTION over the decoded PCM — the stage a
    * training pipeline runs after decode (VAD screens, music/speech
    * routing, silence trimming all start from frame energy + ZCR).
    * Channel 0 of each `ok` decode is cut into fixed 4-sample frames
    * (a ragged tail frame keeps its true n_s); per frame: exact
    * integer energy Σ(v−128)², midpoint zero-crossing count, and the
    * sample sum. Failed decodes contribute ZERO rows — the upstream
    * status row already carries the failure, and a feature stage that
    * invents frames for undecodable audio would poison downstream
    * aggregates. flatMap keeps it one pass, no shuffle: at 100 TB this
    * stage is scan-shaped, embarrassingly parallel, and its output is
    * a bounded ~n/4 rows per doc. */
  def audioFrames(ds: Dataset[BinaryDoc], frameLen: Int = 4): Dataset[AudioFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition frame-buffer allocation would go here
      rows.flatMap { d =>
        val m = parseWav(d.doc_id, d.payload)
        if (m.status != "ok") Iterator.empty
        else {
          val p = d.payload
          val nch = m.n_channels.get
          // locate the data chunk (walk is safe: status ok proved it)
          def u32(i: Int): Long = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
            ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
          var i = 12
          while (new String(p, i, 4, "US-ASCII") != "data")
            i += 8 + u32(i + 4).toInt + (u32(i + 4).toInt & 1)
          val off = i + 8
          val n = m.n_samples.get.toInt // per-channel count
          Iterator.range(0, (n + frameLen - 1) / frameLen).map { f =>
            val lo = f * frameLen
            val hi = math.min(n, lo + frameLen)
            var ss = 0L; var en = 0L; var zc = 0
            var k = lo
            while (k < hi) {
              val v = p(off + k * nch) & 0xff // channel 0
              ss += v
              val dev = v - 128
              en += dev.toLong * dev
              if (k > lo) {
                val prev = p(off + (k - 1) * nch) & 0xff
                if ((v >= 128) != (prev >= 128)) zc += 1
              }
              k += 1
            }
            AudioFrame(d.doc_id, f, hi - lo, ss, en, zc)
          }
        }
      }
    }
  }

  /** Synthesize a REAL uncompressed 24-bit BMP from a doc's md5 hex —
    * a genuine BITMAPFILEHEADER + BITMAPINFOHEADER + padded pixel
    * raster, all little-endian per the spec. The format brings the two
    * parsing hazards PPM and WAV don't have: rows are stored BOTTOM-UP
    * unless the height field is negative (the top-down arm, ~25%), and
    * every row is padded to a 4-byte boundary (w ∈ 1..4 at 24 bpp ⇒
    * pad ∈ {1,2,3,0} — all four cases occur). Pixel bytes are keyed by
    * LOGICAL position ((row·w + col)·3 + channel, cycling the 16 md5
    * bytes) while rows are WRITTEN in storage order, so a parser that
    * mis-walks direction or stride reconstructs the wrong logical
    * image and breaks the hash gate. Arms: corrupted magic (`XM`,
    * ~6%), top-down height, raster truncated one byte short (~12.5%). */
  private[llm] def bmpBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(13) % 16 == 0
    val topDown = b(14) % 4 == 0
    val trunc = b(15) % 8 == 0
    val w = 1 + b(0) % 4
    val ht = 1 + b(1) % 4
    val stride = (w * 3 + 3) & ~3
    val need = stride * ht
    val out = new java.io.ByteArrayOutputStream(128)
    def w32(v: Int): Unit = { out.write(v & 255); out.write((v >> 8) & 255)
      out.write((v >> 16) & 255); out.write((v >> 24) & 255) }
    def w16(v: Int): Unit = { out.write(v & 255); out.write((v >> 8) & 255) }
    out.write(if (badMagic) 'X' else 'B'); out.write('M')
    w32(14 + 40 + need); w16(0); w16(0); w32(54)
    w32(40); w32(w); w32(if (topDown) -ht else ht)
    w16(1); w16(24); w32(0); w32(need); w32(2835); w32(2835); w32(0); w32(0)
    var sr = 0
    while (sr < ht) {
      val logical = if (topDown) sr else ht - 1 - sr
      var c = 0
      while (c < w * 3) { out.write(b((logical * w * 3 + c) % 16)); c += 1 }
      while (c < stride) { out.write(0); c += 1 }
      sr += 1
    }
    val full = out.toByteArray
    if (trunc) full.dropRight(1) else full
  }

  /** REAL from-scratch BMP parser — the third honest decode path
    * (uncompressed 24-bit BMP needs no codec): `BM` magic, little-
    * endian header fields read at their spec offsets (pixel offset at
    * 10 — honored, not assumed, since real files put palettes there),
    * signed height (negative = top-down), planes/bpp/compression
    * validation, declared-vs-available raster check against the padded
    * stride, then the row walk in LOGICAL top-down order with exact
    * integer stats: per-channel sums (BGR byte order — the BMP gotcha),
    * global min/max, and the top-row checksum that pins row order.
    * Malformed input degrades to a status ROW (`bad_magic`,
    * `bad_header`, `unsupported`, `truncated`), never a throw — same
    * 100 TB survival property as [[parsePpm]]/[[parseWav]]. */
  private[llm] def parseBmp(id: Long, p: Array[Byte]): BmpMeta = {
    val none = BmpMeta(id, "bad_magic", None, None, None, None, None,
      None, None, None, None, None)
    if (p == null || p.length < 2 || p(0) != 'B' || p(1) != 'M') return none
    if (p.length < 54) return none.copy(status = "bad_header")
    def u32(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    val dataOff = u32(10)
    val hdrSize = u32(14)
    val w = u32(18) // signed per spec; negative width is invalid
    val hRaw = u32(22) // signed: negative = top-down row order
    val planes = u16(26)
    val bpp = u16(28)
    val comp = u32(30)
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || planes != 1 || dataOff < 54)
      return none.copy(status = "bad_header")
    val topDown = hRaw < 0
    val ht = math.abs(hRaw)
    val meta = none.copy(width = Some(w), height = Some(ht),
      bpp = Some(bpp), top_down = Some(if (topDown) 1 else 0))
    if (bpp != 24 || comp != 0) return meta.copy(status = "unsupported")
    val stride = (w * 3 + 3) & ~3
    val need = stride.toLong * ht
    if (p.length - dataOff < need) return meta.copy(status = "truncated")
    var rs = 0L; var gs = 0L; var bs = 0L; var trs = 0L
    var mn = 255; var mx = 0
    var r = 0
    while (r < ht) {
      val stored = if (topDown) r else ht - 1 - r
      val off = dataOff + stored * stride
      var c = 0
      while (c < w) {
        val bb = p(off + 3 * c) & 0xff // BGR on disk
        val gg = p(off + 3 * c + 1) & 0xff
        val rr = p(off + 3 * c + 2) & 0xff
        bs += bb; gs += gg; rs += rr
        if (r == 0) trs += bb + gg + rr
        if (bb < mn) mn = bb; if (gg < mn) mn = gg; if (rr < mn) mn = rr
        if (bb > mx) mx = bb; if (gg > mx) mx = gg; if (rr > mx) mx = rr
        c += 1
      }
      r += 1
    }
    meta.copy(status = "ok", r_sum = Some(rs), g_sum = Some(gs),
      b_sum = Some(bs), px_min = Some(mn), px_max = Some(mx),
      top_row_sum = Some(trs))
  }

  /** The typed BMP decode stage over [[parseBmp]] — same per-partition
    * shape as [[decodePpm]]/[[decodeWav]]. */
  def decodeBmp(ds: Dataset[BinaryDoc]): Dataset[BmpMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.map(d => parseBmp(d.doc_id, d.payload))
    }
  }

  /** Synthesize a REAL baseline TIFF (TIFF 6.0, Adobe 1992 — the
    * first DIRECTORY format in the decode family: where every other
    * format streams, TIFF is a byte-order mark + a table of
    * (tag, type, count, value) entries with offset indirection):
    * 8-byte header in EITHER byte order (the md5 picks II or MM —
    * one decoder must handle both), an 8-entry IFD (width / length /
    * bits=8 / compression=1 / photometric=1 / strip offset / rows-
    * per-strip / strip byte count, tags ascending per spec, SHORT
    * values left-justified in their 4-byte slot — the classic TIFF
    * writer bug), and one uncompressed grayscale strip whose pixel
    * (y·w + x) is the md5 byte (y·w + x) mod 16. Arms: bad byte-order
    * mark (~6%), strip truncated one byte (~12.5%), and the II/MM
    * split itself (~25% MM). */
  private[graft] def tiffBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(12) % 16 == 0
    val bigEnd = b(13) % 4 == 0
    val trunc = b(15) % 8 == 2
    val w = 1 + b(0) % 4
    val ht = 1 + b(1) % 4
    val out = new java.io.ByteArrayOutputStream(160)
    def w16(v: Int): Unit =
      if (bigEnd) { out.write((v >> 8) & 255); out.write(v & 255) }
      else { out.write(v & 255); out.write((v >> 8) & 255) }
    def w32(v: Int): Unit =
      if (bigEnd) { out.write((v >>> 24) & 255); out.write((v >>> 16) & 255)
        out.write((v >>> 8) & 255); out.write(v & 255) }
      else { out.write(v & 255); out.write((v >> 8) & 255)
        out.write((v >> 16) & 255); out.write((v >>> 24) & 255) }
    if (badMagic) { out.write('X'); out.write('X') }
    else if (bigEnd) { out.write('M'); out.write('M') }
    else { out.write('I'); out.write('I') }
    w16(42); w32(8)
    val stripOff = 8 + 2 + 8 * 12 + 4
    def entryShort(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1); w16(v); w16(0) // SHORT left-justified
    }
    def entryLong(tag: Int, v: Int): Unit = { w16(tag); w16(4); w32(1); w32(v) }
    w16(8)
    entryShort(256, w); entryShort(257, ht); entryShort(258, 8)
    entryShort(259, 1); entryShort(262, 1)
    entryLong(273, stripOff); entryShort(278, ht); entryLong(279, w * ht)
    w32(0)
    var i = 0
    while (i < w * ht) { out.write(b(i % 16)); i += 1 }
    val full = out.toByteArray
    if (trunc) full.dropRight(1) else full
  }

  /** REAL from-scratch TIFF parser — the EIGHTH decode path and the
    * directory-format one: byte-order mark dispatches every
    * subsequent 16/32-bit read (one parser, both endiannesses), magic
    * 42, IFD walk with bounds-checked entry reads (a type-3 SHORT
    * reads the first two bytes of its value slot, a type-4 LONG all
    * four), baseline validation (8-bit, uncompressed, grayscale),
    * declared-vs-available strip check, then the single-strip pixel
    * walk with exact integer stats. Dimension caps keep a fuzzed
    * 2³²-pixel claim from walking off the end (DecoderFuzzSpec runs
    * arbitrary bytes through this — total, never a throw). */
  private[llm] def parseTiff(id: Long, p: Array[Byte]): TiffMeta = {
    val none =
      TiffMeta(id, "bad_magic", None, None, None, None, None, None, None)
    if (p == null || p.length < 8) return none
    val big = p(0) == 'M' && p(1) == 'M'
    val lit = p(0) == 'I' && p(1) == 'I'
    if (!big && !lit) return none
    def u16(i: Long): Int =
      if (i < 0 || i + 1 >= p.length) -1
      else if (big) ((p(i.toInt) & 0xff) << 8) | (p(i.toInt + 1) & 0xff)
      else (p(i.toInt) & 0xff) | ((p(i.toInt + 1) & 0xff) << 8)
    def u32(i: Long): Long =
      if (i < 0 || i + 3 >= p.length) -1L
      else if (big) ((p(i.toInt) & 0xffL) << 24) | ((p(i.toInt + 1) & 0xffL) << 16) |
        ((p(i.toInt + 2) & 0xffL) << 8) | (p(i.toInt + 3) & 0xffL)
      else (p(i.toInt) & 0xffL) | ((p(i.toInt + 1) & 0xffL) << 8) |
        ((p(i.toInt + 2) & 0xffL) << 16) | ((p(i.toInt + 3) & 0xffL) << 24)
    if (u16(2) != 42) return none
    val hdr = none.copy(status = "bad_header",
      byte_order = Some(if (big) "MM" else "II"))
    val ifd = u32(4)
    if (ifd < 0 || ifd > p.length.toLong - 2) return hdr
    val n = u16(ifd)
    if (n <= 0 || ifd + 2 + n.toLong * 12 + 4 > p.length) return hdr
    var w = -1L; var htL = -1L; var bits = 1L; var comp = 1L
    var photo = 0L; var so = -1L; var sbc = -1L
    var e = 0
    while (e < n) {
      val off = ifd + 2 + e * 12
      val tag = u16(off); val typ = u16(off + 2); val cnt = u32(off + 4)
      val v: Long = if (typ == 3) u16(off + 8).toLong else u32(off + 8)
      if (cnt == 1) tag match {
        case 256 => w = v
        case 257 => htL = v
        case 258 => bits = v
        case 259 => comp = v
        case 262 => photo = v
        case 273 => so = v
        case 279 => sbc = v
        case _ => ()
      }
      e += 1
    }
    if (w <= 0 || htL <= 0 || so < 0 || sbc < 0) return hdr
    if (w > (1 << 20) || htL > (1 << 20))
      return hdr.copy(status = "unsupported")
    val meta = hdr.copy(width = Some(w.toInt), height = Some(htL.toInt))
    if (bits != 8 || comp != 1 || photo > 1)
      return meta.copy(status = "unsupported")
    val need = w * htL
    if (sbc < need) return meta.copy(status = "bad_header")
    if (so + need > p.length) return meta.copy(status = "truncated")
    var sum = 0L; var trs = 0L; var mn = 255; var mx = 0
    var i = 0L
    while (i < need) {
      val px = p((so + i).toInt) & 0xff
      sum += px
      if (i < w) trs += px
      if (px < mn) mn = px
      if (px > mx) mx = px
      i += 1
    }
    meta.copy(status = "ok", px_sum = Some(sum), px_min = Some(mn),
      px_max = Some(mx), top_row_sum = Some(trs))
  }

  /** The typed TIFF decode stage over [[parseTiff]]. */
  def decodeTiff(ds: Dataset[BinaryDoc]): Dataset[TiffMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(d => parseTiff(d.doc_id, d.payload)))
  }

  /** Synthesize a REAL QOI image (qoiformat.org spec — public domain)
    * from a doc's md5 hex: a genuine 14-byte big-endian header and a
    * genuinely COMPRESSED chunk stream produced by a from-scratch
    * spec-faithful encoder (run-length with the prev-pixel rule,
    * 64-entry color index with the r·3+g·5+b·7+a·11 hash, 2-bit DIFF
    * and LUMA deltas with mod-256 wraparound, RGB literals, 8-byte end
    * marker). The LOGICAL pixels are a pure function of the md5 bytes
    * — color blocks of 3 pixels cycling (c0, c0+1, c0, c3) — chosen so
    * every op class the encoder can emit actually occurs: intra-block
    * repeats take RUN, the +1 block takes DIFF, c0's return takes
    * INDEX, c3 takes RGB. The oracle recomputes the stats from that
    * pure function and never sees the compressed bytes, so ANY
    * encoder/decoder disagreement — a wrong index hash, an unbiased
    * delta, a run miscount — breaks the hash gate. Arms: corrupted
    * magic (~6%), channels = 4 header (unsupported, ~12.5%), stream
    * truncated one byte + end marker dropped (~12.5%). */
  private[graft] def qoiBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(12) % 16 == 0
    val badChan = b(14) % 8 == 0
    val trunc = b(15) % 8 == 1
    val w = 1 + b(0) % 4
    val ht = 1 + b(1) % 3
    val n = w * ht
    def blockColor(bi: Int): (Int, Int, Int) = (bi % 4) match {
      case 0 => (b(2), b(3), b(4))
      case 1 => ((b(2) + 1) % 256, (b(3) + 1) % 256, (b(4) + 1) % 256)
      case 2 => (b(2), b(3), b(4))
      case _ => (b(5), b(6), b(7))
    }
    val out = new java.io.ByteArrayOutputStream(96)
    def w32be(v: Int): Unit = { out.write((v >>> 24) & 255)
      out.write((v >>> 16) & 255); out.write((v >>> 8) & 255)
      out.write(v & 255) }
    out.write(if (badMagic) 'x' else 'q')
    out.write('o'); out.write('i'); out.write('f')
    w32be(w); w32be(ht)
    out.write(if (badChan) 4 else 3); out.write(0)
    val header = out.size()
    var pr = 0; var pg = 0; var pb = 0 // spec initial prev (a = 255)
    val idx = Array.fill(64 * 3)(-1)
    var run = 0
    def flushRun(): Unit = if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
    def sd(x: Int): Int = { val v = x & 0xff; if (v > 127) v - 256 else v }
    var i = 0
    while (i < n) {
      val (r, g, bl) = blockColor(i / 3)
      if (r == pr && g == pg && bl == pb) {
        run += 1
        if (run == 62) flushRun()
      } else {
        flushRun()
        val hi = (r * 3 + g * 5 + bl * 7 + 255 * 11) % 64
        if (idx(hi * 3) == r && idx(hi * 3 + 1) == g && idx(hi * 3 + 2) == bl)
          out.write(hi) // QOI_OP_INDEX
        else {
          idx(hi * 3) = r; idx(hi * 3 + 1) = g; idx(hi * 3 + 2) = bl
          val (dr, dg, db) = (sd(r - pr), sd(g - pg), sd(bl - pb))
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else if (dg >= -32 && dg <= 31 &&
              dr - dg >= -8 && dr - dg <= 7 && db - dg >= -8 && db - dg <= 7) {
            out.write(0x80 | (dg + 32))
            out.write(((dr - dg + 8) << 4) | (db - dg + 8))
          } else {
            out.write(0xFE); out.write(r); out.write(g); out.write(bl)
          }
        }
        pr = r; pg = g; pb = bl
      }
      i += 1
    }
    flushRun()
    val full = out.toByteArray
    if (trunc) full.take(math.max(header, full.length - 1))
    else {
      (0 until 7).foreach(_ => out.write(0)); out.write(1)
      out.toByteArray
    }
  }

  /** REAL from-scratch QOI decoder — the fourth honest decode path and
    * the first over a genuinely COMPRESSED stream: magic + big-endian
    * header, then the op walk (RGB/RGBA literals, INDEX with the spec
    * hash table, DIFF/LUMA with biased wraparound deltas, RUN
    * expansion), every read bounds-checked, the pixel count capped by
    * the declared dims, and the 8-byte end marker required. Exact
    * integer stats over the DECODED pixels; `n_run_px` counts pixels
    * materialized by RUN chunks — evidence in the hash gate that the
    * compressed path, not a literal path, produced the image.
    * Malformed input degrades to a status ROW (`bad_magic`,
    * `bad_header`, `unsupported`, `truncated`), never a throw — the
    * property that keeps a 100 TB decode stage alive. */
  private[llm] def parseQoi(id: Long, p: Array[Byte]): QoiMeta = {
    val none = QoiMeta(id, "bad_magic", None, None, None, None, None,
      None, None, None)
    if (p == null || p.length < 4 || p(0) != 'q' || p(1) != 'o' ||
      p(2) != 'i' || p(3) != 'f') return none
    if (p.length < 14) return none.copy(status = "bad_header")
    def u32be(i: Int): Long = ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    val w = u32be(4); val ht = u32be(8)
    val ch = p(12) & 0xff; val cs = p(13) & 0xff
    // The per-dim cap alone is not enough: 65536×65536 makes the Long
    // product 2^32, whose Int truncation is 0 (or negative for nearby
    // dims), so a header+trailer-only payload would skip the op walk and
    // report `ok` with zero pixels. Reject any product that does not fit
    // an Int before entering the walk.
    if (w <= 0 || ht <= 0 || w > (1 << 16) || ht > (1 << 16) ||
      w * ht > Int.MaxValue.toLong)
      return none.copy(status = "bad_header")
    val meta = none.copy(width = Some(w.toInt), height = Some(ht.toInt))
    if (ch != 3 || cs > 1) return meta.copy(status = "unsupported")
    val n = (w * ht).toInt
    val idx = new Array[Int](64 * 4)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var rs = 0L; var gs = 0L; var bs = 0L; var nRun = 0L
    var mn = 255; var mx = 0
    var produced = 0
    var off = 14
    def emit(k: Int): Unit = {
      rs += pr.toLong * k; gs += pg.toLong * k; bs += pb.toLong * k
      mn = math.min(mn, math.min(pr, math.min(pg, pb)))
      mx = math.max(mx, math.max(pr, math.max(pg, pb)))
      val hi = (pr * 3 + pg * 5 + pb * 7 + pa * 11) % 64
      idx(hi * 4) = pr; idx(hi * 4 + 1) = pg; idx(hi * 4 + 2) = pb
      idx(hi * 4 + 3) = pa
      produced += k
    }
    while (produced < n) {
      if (off >= p.length) return meta.copy(status = "truncated")
      val op = p(off) & 0xff; off += 1
      if (op == 0xFE) { // RGB literal
        if (off + 3 > p.length) return meta.copy(status = "truncated")
        pr = p(off) & 0xff; pg = p(off + 1) & 0xff; pb = p(off + 2) & 0xff
        off += 3; emit(1)
      } else if (op == 0xFF) { // RGBA literal (spec-complete)
        if (off + 4 > p.length) return meta.copy(status = "truncated")
        pr = p(off) & 0xff; pg = p(off + 1) & 0xff; pb = p(off + 2) & 0xff
        pa = p(off + 3) & 0xff; off += 4; emit(1)
      } else (op >> 6) match {
        case 0 => // INDEX
          pr = idx(op * 4); pg = idx(op * 4 + 1); pb = idx(op * 4 + 2)
          pa = idx(op * 4 + 3); emit(1)
        case 1 => // DIFF
          pr = (pr + ((op >> 4) & 3) - 2) & 0xff
          pg = (pg + ((op >> 2) & 3) - 2) & 0xff
          pb = (pb + (op & 3) - 2) & 0xff
          emit(1)
        case 2 => // LUMA
          if (off >= p.length) return meta.copy(status = "truncated")
          val dg = (op & 0x3f) - 32
          val b2 = p(off) & 0xff; off += 1
          pr = (pr + dg + ((b2 >> 4) & 15) - 8) & 0xff
          pg = (pg + dg) & 0xff
          pb = (pb + dg + (b2 & 15) - 8) & 0xff
          emit(1)
        case _ => // RUN
          val k = (op & 0x3f) + 1
          if (produced + k > n) return meta.copy(status = "truncated")
          nRun += k; emit(k)
      }
    }
    // spec trailer: exactly 7 zero bytes then 0x01
    if (p.length - off != 8 || (0 until 7).exists(j => p(off + j) != 0) ||
      p(off + 7) != 1) return meta.copy(status = "truncated")
    meta.copy(status = "ok", r_sum = Some(rs), g_sum = Some(gs),
      b_sum = Some(bs), px_min = Some(mn), px_max = Some(mx),
      n_run_px = Some(nRun))
  }

  def decodeQoi(ds: Dataset[BinaryDoc]): Dataset[QoiMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.map(d => parseQoi(d.doc_id, d.payload))
    }
  }

  /** Interlaced GIFs store rows in four passes (GIF87a appendix E):
    * every 8th from 0, every 8th from 4, every 4th from 2, every 2nd
    * from 1. Returns the STORAGE order of logical row indices. */
  private def interlaceOrder(h: Int): Array[Int] =
    Array((0, 8), (4, 8), (2, 4), (1, 2))
      .flatMap { case (start, step) => start until h by step }

  /** Synthesize a REAL GIF87a file (CompuServe spec — public) from a
    * doc's md5 hex: logical screen descriptor, 4-entry global color
    * table, image descriptor, and a genuinely LZW-COMPRESSED index
    * stream (variable-width codes starting at 3 bits, clear/EOI codes,
    * LSB-first bit packing, 255-byte sub-blocks) from a from-scratch
    * spec-faithful encoder. Logical pixels are a pure function of the
    * md5 bytes (3-pixel blocks sharing one palette index, so LZW run
    * entries genuinely fire); the oracle recomputes stats from that
    * pure function and never sees the compressed bytes — the hash gate
    * proves the LZW encoder→decoder round trip bit-exact. Arms:
    * corrupted magic (~6%), INTERLACED row order (~25% — the pass
    * permutation a correct decoder must invert; row0_sum pins it), and
    * the trailer byte dropped (~12.5% → `truncated`). */
  private[llm] def gifBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(11) % 16 == 0
    val interlaced = b(13) % 4 == 0
    val trunc = b(15) % 8 == 3
    val w = 1 + b(0) % 4
    val ht = 1 + b(1) % 4
    val idx = Array.tabulate(w * ht)(i => b(5 + (i / 3) % 8) % 4)
    val out = new java.io.ByteArrayOutputStream(128)
    def w16(v: Int): Unit = { out.write(v & 255); out.write((v >> 8) & 255) }
    out.write((if (badMagic) "XIF87a" else "GIF87a").getBytes("US-ASCII"))
    w16(w); w16(ht)
    out.write(0xF1) // GCT present, 8-bit color res, size 2^(1+1) = 4
    out.write(0); out.write(0) // bg index, aspect
    (0 until 4).foreach { j =>
      out.write((b(2) + 7 * j) % 256)
      out.write((b(3) + 11 * j) % 256)
      out.write((b(4) + 13 * j) % 256)
    }
    out.write(0x2C); w16(0); w16(0); w16(w); w16(ht)
    out.write(if (interlaced) 0x40 else 0x00)
    // storage-order index stream: interlace permutation of logical rows
    val order = if (interlaced) interlaceOrder(ht) else (0 until ht).toArray
    val stream = order.flatMap(r => (0 until w).map(c => idx(r * w + c)))
    out.write(2) // LZW minimum code size
    val lzw = lzwEncode(stream, minCode = 2)
    var off = 0
    while (off < lzw.length) { // 255-byte sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    val full = out.toByteArray
    if (trunc) full.dropRight(1) else full
  }

  /** From-scratch GIF-variant LZW encoder: clear code emitted first,
    * dictionary keyed (prefixCode, symbol), EOI last, LSB-first
    * packing. The width bump is checked after EVERY emitted code
    * against the next-free counter (`next >= 2^width`, the giflib
    * discipline) — NOT only when an entry is added: the decoder adds
    * one entry per data code it READS, so after the encoder's final
    * data code (which adds no entry) the decoder may still cross a
    * power of two and read the EOI one bit wider. Tying the check to
    * emission keeps the two trajectories identical including that
    * final code. */
  private[llm] def lzwEncode(syms: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(64)
    var acc = 0L; var nbits = 0
    var width = minCode + 1
    var next = eoi + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { out.write((acc & 255).toInt); acc >>>= 8; nbits -= 8 }
      if (next >= (1 << width) && width < 12) width += 1
    }
    var dict = Map.empty[(Int, Int), Int]
    emit(clear)
    if (syms.nonEmpty) {
      var cur = syms(0)
      var i = 1
      while (i < syms.length) {
        val s = syms(i)
        dict.get((cur, s)) match {
          case Some(c) => cur = c
          case None =>
            emit(cur)
            if (next < 4096) {
              dict += ((cur, s)) -> next; next += 1
            } else { // dictionary full: reset (never hit by ≤16-px fixtures)
              emit(clear); dict = Map.empty; next = eoi + 1; width = minCode + 1
            }
            cur = s
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (nbits > 0) out.write((acc & 255).toInt) // flush partial byte
    out.toByteArray
  }

  /** REAL from-scratch GIF87a decoder — the fifth honest decode path
    * and the first DICTIONARY-coded one: header + logical screen
    * descriptor, global color table, extension-block skipping (real
    * GIFs carry GCE/comment blocks — a correct walk skips what it
    * doesn't know), image descriptor with the interlace flag, then the
    * LZW walk: sub-block reassembly, LSB-first variable-width code
    * reading, clear/EOI handling, the KwKwK `code == next` case, the
    * decoder-side width bump at `next == 2^width`, every read
    * bounds-checked and the output capped at the declared pixel count.
    * Interlaced images are de-permuted to LOGICAL rows before stats —
    * row0_sum is the observable that catches a skipped de-interlace.
    * Malformed input degrades to a status ROW (`bad_magic`,
    * `bad_header`, `unsupported`, `truncated`, `bad_data`), never a
    * throw — the 100 TB survival property shared by the whole family. */
  private[llm] def parseGif(id: Long, p: Array[Byte]): GifMeta = {
    val none = GifMeta(id, "bad_magic", None, None, None, None, None,
      None, None, None, None, None)
    if (p == null || p.length < 6 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F')
      return none
    val ver = new String(p, 3, 3, "US-ASCII")
    if (ver != "87a" && ver != "89a") return none.copy(status = "bad_header")
    if (p.length < 13) return none.copy(status = "bad_header")
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    val w = u16(6); val ht = u16(8)
    val packed = p(10) & 0xff
    if (w <= 0 || ht <= 0) return none.copy(status = "bad_header")
    val nColors = 1 << ((packed & 7) + 1)
    if ((packed & 0x80) == 0) // no global color table: can't resolve pixels
      return none.copy(status = "unsupported",
        width = Some(w), height = Some(ht))
    val meta = none.copy(width = Some(w), height = Some(ht),
      n_colors = Some(nColors))
    var i = 13
    if (i + 3 * nColors > p.length) return meta.copy(status = "truncated")
    val pal = Array.tabulate(3 * nColors)(j => p(i + j) & 0xff)
    i += 3 * nColors
    // block walk to the image descriptor, skipping extensions
    var guard = true
    while (guard) {
      if (i >= p.length) return meta.copy(status = "truncated")
      (p(i) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          var sz = if (i < p.length) p(i) & 0xff else -1
          while (sz > 0) {
            i += 1 + sz
            sz = if (i < p.length) p(i) & 0xff else -1
          }
          if (sz < 0) return meta.copy(status = "truncated")
          i += 1 // terminator
        case 0x2C => guard = false
        case 0x3B => return meta.copy(status = "bad_data") // trailer, no image
        case _ => return meta.copy(status = "bad_data")
      }
    }
    if (i + 10 > p.length) return meta.copy(status = "truncated")
    val iw = u16(i + 5); val ih = u16(i + 7)
    val ipacked = p(i + 9) & 0xff
    if ((ipacked & 0x80) != 0) // local color table — out of scope
      return meta.copy(status = "unsupported")
    val interlaced = (ipacked & 0x40) != 0
    val m2 = meta.copy(interlaced = Some(if (interlaced) 1 else 0))
    if (iw != w || ih != ht || iw.toLong * ih > Int.MaxValue)
      return m2.copy(status = "bad_header")
    i += 10
    if (i >= p.length) return m2.copy(status = "truncated")
    val minCode = p(i) & 0xff; i += 1
    if (minCode < 1 || minCode > 8) return m2.copy(status = "bad_data")
    // reassemble the LZW stream from sub-blocks
    val data = new java.io.ByteArrayOutputStream(64)
    var sz = if (i < p.length) p(i) & 0xff else -1
    while (sz > 0) {
      if (i + 1 + sz > p.length) return m2.copy(status = "truncated")
      data.write(p, i + 1, sz)
      i += 1 + sz
      sz = if (i < p.length) p(i) & 0xff else -1
    }
    if (sz < 0) return m2.copy(status = "truncated")
    i += 1 // sub-block terminator
    val lzw = data.toByteArray
    val n = iw * ih
    val px = new Array[Int](n)
    // LZW decode: prefix/suffix tables, KwKwK case, width bump at 2^width
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    var width = minCode + 1
    var acc = 0L; var nbits = 0; var pos = 0
    var produced = 0
    var prev = -1
    val stack = new Array[Int](4096)
    def readCode(): Int = {
      while (nbits < width) {
        if (pos >= lzw.length) return -1
        acc |= (lzw(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      val c = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nbits -= width
      c
    }
    var done = false
    while (!done) {
      val c = readCode()
      if (c < 0) return m2.copy(status = "truncated")
      if (c == clear) { next = eoi + 1; width = minCode + 1; prev = -1 }
      else if (c == eoi) done = true
      else {
        if (c > next || (c == next && prev < 0)) return m2.copy(status = "bad_data")
        var top = 0
        var cc = if (c == next) prev else c // KwKwK: expand prev, append first
        val kwk = c == next
        while (cc >= clear + 2) { stack(top) = suffix(cc); top += 1; cc = prefix(cc) }
        if (cc >= clear) return m2.copy(status = "bad_data")
        val first = cc
        stack(top) = cc; top += 1
        // KwKwK: the entry is prev-string + its own first symbol — emit
        // the expanded prev-string, then `first` once more at the end.
        val count = top + (if (kwk) 1 else 0)
        if (produced + count > n) return m2.copy(status = "bad_data")
        while (top > 0) { top -= 1; px(produced) = stack(top); produced += 1 }
        if (kwk) { px(produced) = first; produced += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = c
        if (produced == n) {
          // image complete: next code must be EOI (or stream may clear)
          val e = readCode()
          if (e != eoi) return m2.copy(status = "bad_data")
          done = true
        }
      }
    }
    if (produced < n) return m2.copy(status = "truncated")
    var j = 0
    while (j < n) { if (px(j) >= nColors) return m2.copy(status = "bad_data"); j += 1 }
    // de-interlace: storage row k holds logical row order(k)
    val logical =
      if (!interlaced) px
      else {
        val order = interlaceOrder(ih)
        val out2 = new Array[Int](n)
        var k = 0
        while (k < ih) {
          System.arraycopy(px, k * iw, out2, order(k) * iw, iw)
          k += 1
        }
        out2
      }
    if (i >= p.length || (p(i) & 0xff) != 0x3B) // trailer required
      return m2.copy(status = "truncated")
    var rs = 0L; var gs = 0L; var bs = 0L; var r0 = 0L
    var mn = 255; var mx = 0
    j = 0
    while (j < n) {
      val ci = logical(j)
      val rr = pal(3 * ci); val gg = pal(3 * ci + 1); val bb = pal(3 * ci + 2)
      rs += rr; gs += gg; bs += bb
      if (j < iw) r0 += rr + gg + bb
      if (rr < mn) mn = rr; if (gg < mn) mn = gg; if (bb < mn) mn = bb
      if (rr > mx) mx = rr; if (gg > mx) mx = gg; if (bb > mx) mx = bb
      j += 1
    }
    m2.copy(status = "ok", r_sum = Some(rs), g_sum = Some(gs),
      b_sum = Some(bs), px_min = Some(mn), px_max = Some(mx),
      row0_sum = Some(r0))
  }

  /** The typed GIF decode stage over [[parseGif]] — same per-partition
    * shape as the rest of the decode family. */
  def decodeGif(ds: Dataset[BinaryDoc]): Dataset[GifMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.map(d => parseGif(d.doc_id, d.payload))
    }
  }

  // ---------------------------------------------------------------------
  // PNG: chunk container + CRC-32, zlib wrapper + adler32, and a full
  // from-scratch RFC 1951 INFLATE (stored, fixed-Huffman and
  // dynamic-Huffman blocks, LZ77 length/distance pairs) — the first
  // ENTROPY coder in the decode family. All public specs: RFC 1950/1951
  // (Deutsch 1996) and the PNG spec (W3C). The fixture encoder below
  // emits stored and fixed-Huffman streams with genuine back-references;
  // the dynamic-Huffman decode path is exercised in MultimodalSpec
  // against java.util.zip.Deflater (an independent reference encoder).
  // ---------------------------------------------------------------------

  /** CRC-32 (polynomial 0xEDB88320, PNG/zip convention) over the
    * concatenation of the given byte arrays. Bitwise, table-free —
    * fixture chunks are tens of bytes. */
  private[llm] def crc32Png(bs: Array[Byte]*): Int = {
    var c = 0xffffffff
    bs.foreach(_.foreach { x =>
      c ^= (x & 0xff)
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
    })
    ~c
  }

  /** RFC 1950 adler32 over a byte array. */
  private[llm] def adler32(b: Array[Byte]): Int = {
    var a = 1; var s = 0; var i = 0
    while (i < b.length) {
      a = (a + (b(i) & 0xff)) % 65521
      s = (s + a) % 65521
      i += 1
    }
    (s << 16) | a
  }

  /** Paeth predictor (PNG spec §9.4): the filter-4 prediction from
    * left / up / upper-left neighbours. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** DEFLATE length-code table (codes 257..285): base lengths + extra
    * bit counts (RFC 1951 §3.2.5). */
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)

  /** DEFLATE distance-code table (codes 0..29). */
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  /** LSB-first bit writer (RFC 1951 §3.1.1: header/extra fields fill
    * bytes from the least-significant bit; Huffman CODES are packed
    * most-significant-code-bit first — [[huff]] handles the reversal). */
  private final class DeflateBitWriter {
    private val out = new java.io.ByteArrayOutputStream(128)
    private var acc = 0L; private var n = 0
    def bits(v: Int, k: Int): Unit = {
      acc |= (v.toLong & ((1L << k) - 1)) << n; n += k
      while (n >= 8) { out.write((acc & 255).toInt); acc >>>= 8; n -= 8 }
    }
    def huff(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((code >> i) & 1, 1); i -= 1 }
    }
    def result(): Array[Byte] = {
      if (n > 0) { out.write((acc & 255).toInt); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  /** Fixed-Huffman literal/length code for symbol `s` (RFC 1951
    * §3.2.6): (code value, code length). */
  private def fixedLitCode(s: Int): (Int, Int) =
    if (s <= 143) (0x30 + s, 8)
    else if (s <= 255) (0x190 + (s - 144), 9)
    else if (s <= 279) (s - 256, 7)
    else (0xC0 + (s - 280), 8)

  /** From-scratch DEFLATE encoder, one final fixed-Huffman block, with
    * a real greedy LZ77 matcher (window 32, min match 3) so the
    * decoder's length/distance path genuinely fires — filtered PNG rows
    * repeat often enough (runs → distance 1, repeated rows → distance
    * = stride) that fixtures carry true back-references. */
  private[llm] def deflateFixed(raw: Array[Byte]): Array[Byte] = {
    val bw = new DeflateBitWriter
    bw.bits(1, 1); bw.bits(1, 2) // BFINAL=1, BTYPE=01 (fixed)
    var i = 0
    while (i < raw.length) {
      var bestL = 0; var bestD = 0
      var d = 1
      while (d <= 32 && d <= i) {
        var l = 0
        while (l < 258 && i + l < raw.length && raw(i + l) == raw(i - d + l))
          l += 1
        if (l > bestL) { bestL = l; bestD = d }
        d += 1
      }
      if (bestL >= 3) {
        var lc = 28
        while (LenBase(lc) > bestL) lc -= 1
        val (c, len) = fixedLitCode(257 + lc)
        bw.huff(c, len); bw.bits(bestL - LenBase(lc), LenExtra(lc))
        var dc = 29
        while (DistBase(dc) > bestD) dc -= 1
        bw.huff(dc, 5) // fixed distance codes: 5-bit, value = code number
        bw.bits(bestD - DistBase(dc), DistExtra(dc))
        i += bestL
      } else {
        val (c, len) = fixedLitCode(raw(i) & 0xff)
        bw.huff(c, len)
        i += 1
      }
    }
    val (c, len) = fixedLitCode(256) // end of block
    bw.huff(c, len)
    bw.result()
  }

  /** DEFLATE stored (BTYPE=00) encoding: one final block, LEN/NLEN,
    * verbatim bytes. */
  private[llm] def deflateStored(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length + 5)
    out.write(1) // BFINAL=1, BTYPE=00, rest of byte padding
    val len = raw.length
    out.write(len & 255); out.write((len >> 8) & 255)
    out.write(~len & 255); out.write((~len >> 8) & 255)
    out.write(raw, 0, raw.length)
    out.toByteArray
  }

  /** Synthesize a REAL PNG file from a doc's md5 hex: signature, IHDR
    * (8-bit RGB, non-interlaced), an optional tEXt chunk a correct walk
    * must skip, the zlib-wrapped DEFLATE stream split across one or two
    * IDAT chunks, IEND — every chunk CRC-32'd. Logical pixels are the
    * same pure md5 function the GIF fixtures use (the CONTAINER and
    * CODEC differ — which is exactly what the hash gate then proves
    * round-trips). Each row is filtered with type `b(6+r%8) % 5`, so
    * all five PNG filters appear across the corpus. Arms: corrupted
    * signature (~6%), corrupted IHDR CRC (~6% → `bad_header`), file
    * truncated mid-IDAT (~12.5% → `truncated`), corrupted zlib adler32
    * (~6% → `bad_data`); independently, stored-vs-fixed-Huffman
    * compression (50/50) and the one-vs-two IDAT split (~25%). */
  private[llm] def pngBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(12) % 16 == 0
    val badCrc = b(8) % 16 == 7
    val trunc = b(14) % 8 == 3
    val badAdler = b(15) % 16 == 5
    val splitIdat = b(10) % 4 == 0
    val textChunk = b(9) % 4 == 1
    val fixedHuff = b(13) % 2 == 0
    val w = 1 + b(0) % 4; val ht = 1 + b(1) % 4
    val stride = 3 * w
    val px = Array.tabulate(ht, stride) { (r, x) =>
      val i = r * w + x / 3
      val idx = b(5 + (i / 3) % 8) % 4
      ((x % 3) match {
        case 0 => (b(2) + 7 * idx) % 256
        case 1 => (b(3) + 11 * idx) % 256
        case _ => (b(4) + 13 * idx) % 256
      }).toByte
    }
    val raw = new Array[Byte](ht * (1 + stride))
    var r = 0
    while (r < ht) {
      val ft = b(6 + r % 8) % 5
      raw(r * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = px(r)(x) & 0xff
        val left = if (x >= 3) px(r)(x - 3) & 0xff else 0
        val up = if (r > 0) px(r - 1)(x) & 0xff else 0
        val ul = if (r > 0 && x >= 3) px(r - 1)(x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case _ => paeth(left, up, ul)
        }
        raw(r * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    val defl = if (fixedHuff) deflateFixed(raw) else deflateStored(raw)
    val ad = adler32(raw)
    val zlib = new Array[Byte](2 + defl.length + 4)
    zlib(0) = 0x78.toByte; zlib(1) = 0x01 // CM=8, check bits: 30721 % 31 == 0
    System.arraycopy(defl, 0, zlib, 2, defl.length)
    zlib(defl.length + 2) = ((ad >>> 24) & 255).toByte
    zlib(defl.length + 3) = ((ad >>> 16) & 255).toByte
    zlib(defl.length + 4) = ((ad >>> 8) & 255).toByte
    zlib(defl.length + 5) = (ad & 255).toByte
    if (badAdler) zlib(zlib.length - 1) = (zlib(zlib.length - 1) ^ 0x55).toByte
    val out = new java.io.ByteArrayOutputStream(256)
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 255); out.write((v >>> 16) & 255)
      out.write((v >>> 8) & 255); out.write(v & 255)
    }
    def chunk(typ: String, data: Array[Byte], corrupt: Boolean = false): Unit = {
      be32(data.length)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = crc32Png(t, data)
      be32(if (corrupt) crc ^ 0x55 else crc)
    }
    out.write((if (badMagic) 0x88 else 0x89))
    out.write('P'); out.write('N'); out.write('G')
    out.write(0x0d); out.write(0x0a); out.write(0x1a); out.write(0x0a)
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte // width fits a byte here; high bytes stay 0
    ihdr(7) = ht.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    chunk("IHDR", ihdr, corrupt = badCrc)
    if (textChunk) chunk("tEXt", "origin\u0000synthetic".getBytes("US-ASCII"))
    if (splitIdat) {
      val m = zlib.length / 2
      chunk("IDAT", zlib.take(m)); chunk("IDAT", zlib.drop(m))
    } else chunk("IDAT", zlib)
    chunk("IEND", Array.emptyByteArray)
    val full = out.toByteArray
    // drop IEND (12 bytes) plus the final IDAT's CRC and last data byte
    if (trunc) full.dropRight(17) else full
  }

  /** Control-flow signals for the inflate walk — caught in
    * [[parsePng]] and converted to status ROWS, never escaping to the
    * task (the 100 TB survival property shared by the decode family). */
  private object PngTrunc extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private object PngBad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** LSB-first bit reader over `p[from, until)`; running out of input
    * signals [[PngTrunc]]. */
  private final class InflateBitReader(p: Array[Byte], var pos: Int,
      until: Int) {
    private var acc = 0; private var n = 0
    def bits(k: Int): Int = {
      while (n < k) {
        if (pos >= until) throw PngTrunc
        acc |= (p(pos) & 0xff) << n; pos += 1; n += 8
      }
      val v = acc & ((1 << k) - 1)
      acc >>>= k; n -= k; v
    }
    def alignByte(): Unit = { val d = n % 8; acc >>>= d; n -= d }
  }

  /** Canonical-Huffman decoder from a code-length array (RFC 1951
    * §3.2.2): symbols ordered by (length, symbol value), decoded by
    * walking lengths 1..15 with the running first-code counter. */
  private final class InflateHuff(lengths: Array[Int]) {
    private val count = new Array[Int](16)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    private val syms = new Array[Int](count.sum)
    locally {
      val offs = new Array[Int](16)
      var sum = 0
      var l = 1
      while (l <= 15) { offs(l) = sum; sum += count(l); l += 1 }
      var s = 0
      while (s < lengths.length) {
        val ln = lengths(s)
        if (ln > 0) { syms(offs(ln)) = s; offs(ln) += 1 }
        s += 1
      }
    }
    def decode(br: InflateBitReader): Int = {
      var code = 0; var first = 0; var index = 0
      var len = 1
      while (len <= 15) {
        code |= br.bits(1)
        val c = count(len)
        if (code - first < c) return syms(index + (code - first))
        index += c
        first = (first + c) << 1
        code <<= 1
        len += 1
      }
      throw PngBad // over-long / incomplete code
    }
  }

  private lazy val FixedLitHuff = new InflateHuff(
    Array.tabulate(288)(s =>
      if (s <= 143) 8 else if (s <= 255) 9 else if (s <= 279) 7 else 8))
  private lazy val FixedDistHuff = new InflateHuff(Array.fill(30)(5))

  /** Code-length-code transmission order (RFC 1951 §3.2.7). */
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  /** Read a dynamic-Huffman block's table definitions: the
    * code-length code, then the literal/length and distance code
    * lengths with 16/17/18 repeat codes. */
  private def dynamicTables(br: InflateBitReader): (InflateHuff, InflateHuff) = {
    val hlit = br.bits(5) + 257
    val hdist = br.bits(5) + 1
    val hclen = br.bits(4) + 4
    if (hlit > 286 || hdist > 30) throw PngBad
    val clLens = new Array[Int](19)
    var i = 0
    while (i < hclen) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
    val clHuff = new InflateHuff(clLens)
    val lens = new Array[Int](hlit + hdist)
    i = 0
    while (i < lens.length) {
      val s = clHuff.decode(br)
      if (s < 16) { lens(i) = s; i += 1 }
      else {
        var rep = 0; var v = 0
        if (s == 16) {
          if (i == 0) throw PngBad
          v = lens(i - 1); rep = 3 + br.bits(2)
        } else if (s == 17) rep = 3 + br.bits(3)
        else if (s == 18) rep = 11 + br.bits(7)
        else throw PngBad
        if (i + rep > lens.length) throw PngBad
        var k = 0
        while (k < rep) { lens(i) = v; i += 1; k += 1 }
      }
    }
    if (lens(256) == 0) throw PngBad // the end-of-block code must exist
    (new InflateHuff(java.util.Arrays.copyOfRange(lens, 0, hlit)),
      new InflateHuff(java.util.Arrays.copyOfRange(lens, hlit, lens.length)))
  }

  /** Full RFC 1951 INFLATE over `p[from, until)`: stored, fixed- and
    * dynamic-Huffman blocks, LZ77 length/distance copies (including
    * the overlapping distance-1 run case). Output is capped at
    * `maxOut` — a stream that tries to write more is [[PngBad]];
    * running out of input is [[PngTrunc]]. */
  private[llm] def inflate(p: Array[Byte], from: Int, until: Int,
      maxOut: Int): Array[Byte] = {
    val br = new InflateBitReader(p, from, until)
    val out = new Array[Byte](maxOut)
    var w = 0
    def put(v: Int): Unit = {
      if (w >= maxOut) throw PngBad
      out(w) = v.toByte; w += 1
    }
    var fin = false
    while (!fin) {
      fin = br.bits(1) == 1
      val btype = br.bits(2)
      if (btype == 3) throw PngBad
      if (btype == 0) {
        br.alignByte()
        val len = br.bits(16); val nlen = br.bits(16)
        if ((len ^ 0xffff) != nlen) throw PngBad
        var k = 0
        while (k < len) { put(br.bits(8)); k += 1 } // aligned: bits(8)=byte
      } else {
        val (lit, dist) =
          if (btype == 1) (FixedLitHuff, FixedDistHuff) else dynamicTables(br)
        var stop = false
        while (!stop) {
          val sym = lit.decode(br)
          if (sym < 256) put(sym)
          else if (sym == 256) stop = true
          else {
            if (sym > 285) throw PngBad
            val lc = sym - 257
            val length = LenBase(lc) + br.bits(LenExtra(lc))
            val dsym = dist.decode(br)
            if (dsym > 29) throw PngBad
            val d = DistBase(dsym) + br.bits(DistExtra(dsym))
            if (d > w) throw PngBad
            var k = 0
            while (k < length) { put(out(w - d) & 0xff); k += 1 }
          }
        }
      }
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** RFC 1950 zlib wrapper around [[inflate]]: header check (method 8,
    * check bits, no preset dictionary), then the trailing adler32
    * verified against the decoded output. Returns (data, adlerOk). */
  private[llm] def zlibInflate(p: Array[Byte], from: Int, until: Int,
      maxOut: Int): (Array[Byte], Boolean) = {
    if (until - from < 6) throw PngTrunc
    val cmf = p(from) & 0xff; val flg = p(from + 1) & 0xff
    if ((cmf & 0x0f) != 8 || ((cmf << 8) | flg) % 31 != 0) throw PngBad
    if ((flg & 0x20) != 0) throw PngBad // FDICT unsupported
    val out = inflate(p, from + 2, until - 4, maxOut)
    val ad = ((p(until - 4) & 0xff) << 24) | ((p(until - 3) & 0xff) << 16) |
      ((p(until - 2) & 0xff) << 8) | (p(until - 1) & 0xff)
    (out, adler32(out) == ad)
  }

  /** REAL from-scratch PNG decoder — the sixth honest decode path and
    * the first ENTROPY-coded one: signature, chunk walk with CRC-32
    * verification (IHDR integrity failure → `bad_header`; ancillary
    * chunks like tEXt skipped — real PNGs carry them), multi-IDAT
    * zlib-stream reassembly, full DEFLATE inflate (stored / fixed /
    * dynamic blocks, LZ77 copies), adler32 verification (mismatch →
    * `bad_data`), then per-row UNFILTERING (None/Sub/Up/Average/Paeth
    * inverses with the bpp=3 left neighbour) before exact pixel stats.
    * Malformed input degrades to a status ROW, never a throw. */
  private[llm] def parsePng(id: Long, p: Array[Byte]): PngMeta = {
    val none = PngMeta(id, "bad_magic", None, None, None, None, None, None,
      None, None, None, None)
    var w = -1; var ht = -1; var colorType = -1
    try {
      if (p == null || p.length < 8) return none
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      var i = 0
      while (i < 8) { if ((p(i) & 0xff) != sig(i)) return none; i += 1 }
      def be32(o: Int): Int =
        ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
          ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
      var off = 8
      val idat = new java.io.ByteArrayOutputStream(256)
      var nIdat = 0
      var sawEnd = false
      var headerOk = false
      while (!sawEnd) {
        if (off + 8 > p.length) throw PngTrunc
        val len = be32(off)
        if (len < 0 || off.toLong + 12 + len > p.length) throw PngTrunc
        val typ = new String(p, off + 4, 4, "US-ASCII")
        val crc = be32(off + 8 + len)
        val calc = crc32Png(java.util.Arrays.copyOfRange(p, off + 4, off + 8 + len))
        if (crc != calc)
          return if (headerOk) {
            val m = none.copy(status = "bad_data", width = Some(w),
              height = Some(ht), color_type = Some(colorType))
            m
          } else none.copy(status = "bad_header")
        typ match {
          case "IHDR" =>
            if (len != 13) return none.copy(status = "bad_header")
            val iw = be32(off + 8); val ih = be32(off + 12)
            val bitDepth = p(off + 16) & 0xff
            colorType = p(off + 17) & 0xff
            val interlace = p(off + 20) & 0xff
            if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 24))
              return none.copy(status = "bad_header")
            w = iw; ht = ih
            if (bitDepth != 8 || colorType != 2 || interlace != 0)
              return none.copy(status = "unsupported", width = Some(w),
                height = Some(ht), color_type = Some(colorType))
            headerOk = true
          case "IDAT" =>
            if (!headerOk) return none.copy(status = "bad_header")
            idat.write(p, off + 8, len); nIdat += 1
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunk: skipped by design
        }
        off += 12 + len
      }
      if (!headerOk || nIdat == 0) return none.copy(status = "bad_header")
      val stride = 3 * w
      val z = idat.toByteArray
      val (raw, adOk) = zlibInflate(z, 0, z.length, ht * (1 + stride))
      val withDims = none.copy(width = Some(w), height = Some(ht),
        color_type = Some(colorType), n_idat = Some(nIdat))
      if (!adOk || raw.length != ht * (1 + stride))
        return withDims.copy(status = "bad_data")
      val recon = Array.ofDim[Byte](ht, stride)
      var r = 0
      while (r < ht) {
        val ft = raw(r * (1 + stride)) & 0xff
        if (ft > 4) return withDims.copy(status = "bad_data")
        var x = 0
        while (x < stride) {
          val fx = raw(r * (1 + stride) + 1 + x) & 0xff
          val left = if (x >= 3) recon(r)(x - 3) & 0xff else 0
          val up = if (r > 0) recon(r - 1)(x) & 0xff else 0
          val ul = if (r > 0 && x >= 3) recon(r - 1)(x - 3) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) >> 1
            case _ => paeth(left, up, ul)
          }
          recon(r)(x) = ((fx + pred) & 0xff).toByte
          x += 1
        }
        r += 1
      }
      var rs = 0L; var gs = 0L; var bs = 0L; var r0 = 0L
      var mn = 255; var mx = 0
      r = 0
      while (r < ht) {
        var c = 0
        while (c < w) {
          val rr = recon(r)(3 * c) & 0xff
          val gg = recon(r)(3 * c + 1) & 0xff
          val bb = recon(r)(3 * c + 2) & 0xff
          rs += rr; gs += gg; bs += bb
          if (r == 0) r0 += rr + gg + bb
          if (rr < mn) mn = rr; if (gg < mn) mn = gg; if (bb < mn) mn = bb
          if (rr > mx) mx = rr; if (gg > mx) mx = gg; if (bb > mx) mx = bb
          c += 1
        }
        r += 1
      }
      PngMeta(id, "ok", Some(w), Some(ht), Some(colorType), Some(nIdat),
        Some(rs), Some(gs), Some(bs), Some(mn), Some(mx), Some(r0))
    } catch {
      case e: RuntimeException if e eq PngTrunc =>
        if (w > 0) none.copy(status = "truncated", width = Some(w),
          height = Some(ht), color_type = Some(colorType))
        else none.copy(status = "truncated")
      case e: RuntimeException if e eq PngBad =>
        if (w > 0) none.copy(status = "bad_data", width = Some(w),
          height = Some(ht), color_type = Some(colorType))
        else none.copy(status = "bad_data")
    }
  }

  /** The typed PNG decode stage over [[parsePng]] — same per-partition
    * shape as the rest of the decode family. */
  def decodePng(ds: Dataset[BinaryDoc]): Dataset[PngMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.map(d => parsePng(d.doc_id, d.payload))
    }
  }

  // ---------------------------------------------------------------------
  // gzip (RFC 1952): the wrapper a web crawl actually arrives in —
  // WARC/CDX payloads are gzip members. Header with optional
  // FEXTRA/FNAME fields a correct walk must skip, DEFLATE body
  // (reusing the PNG family's inflate), CRC-32 + ISIZE footer both
  // verified. The decoded payload is TEXT, so the stats are the
  // text-ingest ones: exact byte count / byte sum / separator count.
  // ---------------------------------------------------------------------

  /** Synthesize a REAL RFC 1952 gzip member from a doc's md5: the
    * payload text is `(h ++ " " ++ reverse(h) ++ " ") × k` (repetition
    * makes LZ77 back-references genuinely fire at distance 66), the
    * body is the from-scratch DEFLATE encoder (stored or
    * fixed-Huffman, md5-driven), the footer carries real CRC-32 and
    * ISIZE. Arms: corrupted magic (~6%), FNAME header field (~25% — a
    * skip path), FEXTRA field (~25%), footer truncation (~12.5%),
    * corrupted CRC-32 (~6% → `bad_data`). */
  private[llm] def gzipBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(12) % 16 == 1
    val hasName = b(9) % 4 == 2
    val hasExtra = b(10) % 4 == 1
    val trunc = b(14) % 8 == 5
    val badCrc = b(15) % 16 == 9
    val fixedHuff = b(13) % 2 == 1
    val k = 1 + b(2) % 3
    val text = (h + " " + h.reverse + " ") * k
    val data = text.getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(256)
    out.write(if (badMagic) 0x2f else 0x1f); out.write(0x8b)
    out.write(8) // CM = deflate
    out.write((if (hasExtra) 4 else 0) | (if (hasName) 8 else 0)) // FLG
    out.write(b(3)); out.write(b(4)); out.write(b(5)); out.write(b(6)) // MTIME
    out.write(0); out.write(255) // XFL, OS = unknown
    if (hasExtra) {
      out.write(4); out.write(0) // XLEN = 4, little-endian
      out.write(b(7)); out.write(b(8)); out.write(b(9)); out.write(b(10))
    }
    if (hasName) {
      out.write("f.txt".getBytes("US-ASCII"), 0, 5); out.write(0)
    }
    val headerLen = out.size()
    val defl = if (fixedHuff) deflateFixed(data) else deflateStored(data)
    out.write(defl, 0, defl.length)
    val crc = crc32Png(data)
    def le32(v: Int): Unit = {
      out.write(v & 255); out.write((v >>> 8) & 255)
      out.write((v >>> 16) & 255); out.write((v >>> 24) & 255)
    }
    le32(if (badCrc) crc ^ 0x5500 else crc)
    le32(data.length)
    val full = out.toByteArray
    // truncation cuts to 5 body bytes — deterministically below the
    // 8-byte footer minimum, so the arm is `truncated` for EVERY doc
    // (a cut that leaves a near-complete bitstream could otherwise
    // surface as bad_data on md5-unlucky rows and split the oracle)
    if (trunc) full.take(headerLen + 5) else full
  }

  /** REAL from-scratch gzip decoder — the crawl-decompression stage:
    * RFC 1952 header walk (magic, CM=8, FLG with FEXTRA/FNAME/
    * FCOMMENT/FHCRC skip paths), DEFLATE body through the shared
    * [[inflate]], CRC-32 and ISIZE footer both verified, then exact
    * text-ingest stats over the decoded payload. Malformed input
    * degrades to a status ROW — decode-family contract. */
  private[llm] def parseGzip(id: Long, p: Array[Byte]): GzipMeta = {
    val none = GzipMeta(id, "bad_magic", None, None, None, None, None)
    gunzip(p) match {
      case (status, hasName, None) =>
        none.copy(status = status, has_name = hasName)
      case (_, hasName, Some(data)) =>
        var sum = 0L; var seps = 0L
        var j = 0
        while (j < data.length) {
          val v = data(j) & 0xff
          sum += v
          if (v == ' ') seps += 1
          j += 1
        }
        GzipMeta(id, "ok", hasName, Some(data.length), Some(sum),
          Some(seps), Some(if (data.isEmpty) 0 else data(0) & 0xff))
    }
  }

  /** The shared RFC 1952 member walk: (status, FNAME flag once the
    * optional-field walk has run, decoded payload iff status "ok").
    * Factored out of [[parseGzip]] so the WARC ingest stage reuses the
    * IDENTICAL header/inflate/footer discipline on its records. */
  private[llm] def gunzip(
      p: Array[Byte]): (String, Option[Int], Option[Array[Byte]]) = {
    try {
      if (p == null || p.length < 10 ||
        (p(0) & 0xff) != 0x1f || (p(1) & 0xff) != 0x8b)
        return ("bad_magic", None, None)
      if ((p(2) & 0xff) != 8) return ("unsupported", None, None)
      val flg = p(3) & 0xff
      if ((flg & 0xe0) != 0) return ("bad_header", None, None)
      var i = 10
      def need(n: Int): Unit = if (i + n > p.length) throw PngTrunc
      if ((flg & 4) != 0) { // FEXTRA
        need(2)
        val xlen = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
        i += 2; need(xlen); i += xlen
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (i < p.length && p(i) != 0) i += 1
        need(1); i += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (i < p.length && p(i) != 0) i += 1
        need(1); i += 1
      }
      if ((flg & 2) != 0) { need(2); i += 2 } // FHCRC
      if (p.length - i < 8) throw PngTrunc // body + 8-byte footer minimum
      // ISIZE bounds the output buffer; sanity-capped so a corrupt
      // field can't allocate unbounded memory
      val until = p.length - 8
      val isize = ((p(p.length - 4) & 0xffL) | ((p(p.length - 3) & 0xffL) << 8) |
        ((p(p.length - 2) & 0xffL) << 16) | ((p(p.length - 1) & 0xffL) << 24))
      if (isize > (1L << 24)) return ("bad_header", None, None)
      val data = inflate(p, i, until, isize.toInt)
      val hasName = Some(if ((flg & 8) != 0) 1 else 0)
      if (data.length.toLong != isize) return ("bad_data", hasName, None)
      val crc = ((p(until) & 0xff) | ((p(until + 1) & 0xff) << 8) |
        ((p(until + 2) & 0xff) << 16) | ((p(until + 3) & 0xff) << 24))
      if (crc != crc32Png(data)) return ("bad_data", hasName, None)
      ("ok", hasName, Some(data))
    } catch {
      case e: RuntimeException if e eq PngTrunc => ("truncated", None, None)
      case e: RuntimeException if e eq PngBad => ("bad_data", None, None)
    }
  }

  /** Scala mirror of [[Dedup.urlSynthSql]] — the SAME messy-URL
    * synthesis from the doc's md5 hex digits, needed in the JVM so the
    * URL can be embedded INSIDE the gzip-compressed WARC record. The
    * q_warc_ingest hash gate proves the two implementations agree: the
    * Spark side extracts this string back out of the decoded bytes
    * while the DuckDB twin recomputes it with the SQL expression. */
  private[llm] def urlSynth(h: String): String = {
    def hd(i: Int): Int = {
      val c = h.charAt(i - 1); if (c >= 'a') c - 87 else c - 48
    }
    val scheme = if (hd(1) % 2 == 0) "HTTP" else "https"
    val host =
      if (hd(3) % 2 == 0) s"EX${hd(2) % 8}.COM" else s"ex${hd(2) % 8}.com"
    val port = (hd(4) % 4) match {
      case 0 => ":80"; case 1 => ":443"; case 2 => ":8080"; case _ => ""
    }
    val path = s"/p${hd(5)}" + (if (hd(6) % 2 == 0) "/" else "")
    val qs = (hd(7) % 4) match {
      case 0 => s"?a=${hd(8) % 4}&b=${hd(9) % 4}&utm_src=x"
      case 1 => s"?b=${hd(9) % 4}&a=${hd(8) % 4}"
      case 2 => s"?utm_src=x&b=${hd(9) % 4}&a=${hd(8) % 4}"
      case _ => ""
    }
    val frag = if (hd(10) % 2 == 0) "#sec" else ""
    scheme + "://" + host + port + path + qs + frag
  }

  /** Synthesize a WARC-shaped crawl record as a REAL gzip member: the
    * decompressed payload is `WARC/1.0\nWARC-Target-URI: <messy url>`
    * + blank line + a repeated text body (66·k bytes, k ∈ 1..3 —
    * repetition makes the LZ77 back-references genuinely fire).
    * Failure arms share the gzip family's md5 bits — corrupted magic
    * (b12), footer truncation (b14), corrupted CRC-32 (b15) — so a
    * fixed fraction of the crawl genuinely fails decode, which is
    * what the funnel exists to count. */
  private[graft] def warcBytes(h: String): Array[Byte] = {
    val k = 1 + Integer.parseInt(h.substring(4, 6), 16) % 3
    warcMemberBytes(h, (h + " " + h.reverse + " ") * k)
  }

  /** [[warcBytes]] with the record BODY supplied by the caller — the
    * crawl pipeline ships the document's own (PII-laced) text through
    * the real gzip round trip; failure arms and the URI header stay
    * md5-derived exactly as in the funnel query. */
  private[graft] def warcMemberBytes(h: String, body: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(12) % 16 == 1
    val trunc = b(14) % 8 == 5
    val badCrc = b(15) % 16 == 9
    val fixedHuff = b(13) % 2 == 1
    val record = "WARC/1.0\nWARC-Target-URI: " + urlSynth(h) + "\n\n" + body
    val data = record.getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(256)
    out.write(if (badMagic) 0x2f else 0x1f); out.write(0x8b)
    out.write(8) // CM = deflate
    out.write(0) // no optional header fields: the gzip query owns those arms
    out.write(b(3)); out.write(b(4)); out.write(b(5)); out.write(b(6)) // MTIME
    out.write(0); out.write(255) // XFL, OS = unknown
    val headerLen = out.size()
    val defl = if (fixedHuff) deflateFixed(data) else deflateStored(data)
    out.write(defl, 0, defl.length)
    val crc = crc32Png(data)
    def le32(v: Int): Unit = {
      out.write(v & 255); out.write((v >>> 8) & 255)
      out.write((v >>> 16) & 255); out.write((v >>> 24) & 255)
    }
    le32(if (badCrc) crc ^ 0x5500 else crc)
    le32(data.length)
    val full = out.toByteArray
    // below the 8-byte footer minimum, so the arm is `truncated` for
    // every doc (the gzipBytes reasoning)
    if (trunc) full.take(headerLen + 5) else full
  }

  /** WARC-record parse over the shared [[gunzip]] walk: decode the
    * member, require the `WARC/1.0` version line, and pull the
    * `WARC-Target-URI` header — the crawl front-door stage that turns
    * raw fetched bytes into (url, body) rows. Malformed input degrades
    * to a status ROW (decode-family contract); a member that decodes
    * but is not a WARC record is `bad_record`, not a throw. */
  private[graft] def parseWarc(id: Long, p: Array[Byte]): WarcMeta = {
    gunzip(p) match {
      case (status, _, None) => WarcMeta(id, status, None, None, None)
      case (_, _, Some(data)) =>
        val text = new String(data, "US-ASCII")
        val sep = text.indexOf("\n\n")
        val hdr = if (sep >= 0) text.substring(0, sep) else text
        val body = if (sep >= 0) text.substring(sep + 2) else ""
        val tag = "WARC-Target-URI: "
        val uri = hdr.linesIterator.collectFirst {
          case l if l.startsWith(tag) => l.substring(tag.length)
        }
        if (!hdr.startsWith("WARC/1.0") || uri.isEmpty)
          WarcMeta(id, "bad_record", None, Some(data.length), None)
        else WarcMeta(id, "ok", uri, Some(data.length), Some(body.length))
    }
  }

  /** [[parseWarc]] keeping the decoded body text — same status arms,
    * same header contract; the crawl pipeline's ingest row. */
  private[graft] def parseWarcDoc(id: Long, p: Array[Byte]): WarcDoc = {
    gunzip(p) match {
      case (status, _, None) => WarcDoc(id, status, None, None)
      case (_, _, Some(data)) =>
        val text = new String(data, "US-ASCII")
        val sep = text.indexOf("\n\n")
        val hdr = if (sep >= 0) text.substring(0, sep) else text
        val body = if (sep >= 0) text.substring(sep + 2) else ""
        val tag = "WARC-Target-URI: "
        val uri = hdr.linesIterator.collectFirst {
          case l if l.startsWith(tag) => l.substring(tag.length)
        }
        if (!hdr.startsWith("WARC/1.0") || uri.isEmpty)
          WarcDoc(id, "bad_record", None, None)
        else WarcDoc(id, "ok", uri, Some(body))
    }
  }

  /** The typed gzip decode stage over [[parseGzip]]. */
  def decodeGzip(ds: Dataset[BinaryDoc]): Dataset[GzipMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.map(d => parseGzip(d.doc_id, d.payload))
    }
  }

  // ---------------------------------------------------------------------
  // ZIP (PKWARE APPNOTE): the archive CONTAINER — the first 1→N
  // decoder: one blob carries many members, the many-files-per-blob
  // shape crawl dumps and dataset drops actually arrive in. Local
  // file headers + central directory + EOCD, stored and DEFLATE
  // members through the shared [[inflate]], CRC-32 per member.
  // ---------------------------------------------------------------------

  /** Synthesize a REAL ZIP archive from a doc's md5: n ∈ 1..3 members,
    * each `(h ++ ":" ++ m ++ " ") × k` text (k ∈ 1..3 — repetition
    * makes the DEFLATE members' LZ77 back-references genuinely fire),
    * stored-vs-deflate per member (md5-driven), true CRC-32s, a full
    * central directory, and a comment-free EOCD. Arms: archive
    * truncation below the EOCD minimum (~12.5% → `truncated`),
    * corrupted EOCD signature (~6% → `bad_eocd`), EOCD entry count
    * inflated by one so the CD walk runs off its end (~12.5% →
    * `bad_cd`), member-0 CRC corrupted in BOTH the local header and
    * the CD so only the DATA check can catch it (~12.5% → that one
    * member `bad_data`, its siblings still `ok`). */
  private[graft] def zipBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val n = 1 + b(0) % 3
    val trunc = b(12) % 8 == 6
    val badEocd = b(11) % 16 == 3
    val badCd = b(13) % 8 == 2
    val badData = b(14) % 8 == 1
    val out = new java.io.ByteArrayOutputStream(512)
    def le16(v: Int): Unit = { out.write(v & 255); out.write((v >>> 8) & 255) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    final case class Ent(name: Array[Byte], method: Int, crc: Int,
        csize: Int, usize: Int, off: Int)
    val entries = (0 until n).map { m =>
      val k = 1 + b(5 + m) % 3
      val defl = b(2 + m) % 2 == 1
      val data = ((h + ":" + m + " ") * k).getBytes("US-ASCII")
      val comp = if (defl) deflateFixed(data) else data
      val crc0 = crc32Png(data)
      val crc = if (badData && m == 0) crc0 ^ 0x55 else crc0
      val name = s"m$m.txt".getBytes("US-ASCII")
      val off = out.size()
      le32(0x04034b50) // local file header signature "PK\3\4"
      le16(20); le16(0) // version needed, flags
      le16(if (defl) 8 else 0)
      le16(b(3) | (b(4) << 8)); le16(b(5) | (b(6) << 8)) // mod time/date
      le32(crc); le32(comp.length); le32(data.length)
      le16(name.length); le16(0) // name len, extra len
      out.write(name, 0, name.length)
      out.write(comp, 0, comp.length)
      Ent(name, if (defl) 8 else 0, crc, comp.length, data.length, off)
    }
    val cdOff = out.size()
    entries.foreach { e =>
      le32(0x02014b50) // central directory signature "PK\1\2"
      le16(20); le16(20); le16(0) // made-by, needed, flags
      le16(e.method)
      le16(b(3) | (b(4) << 8)); le16(b(5) | (b(6) << 8))
      le32(e.crc); le32(e.csize); le32(e.usize)
      le16(e.name.length); le16(0); le16(0) // name/extra/comment len
      le16(0); le16(0); le32(0) // disk start, internal + external attrs
      le32(e.off)
      out.write(e.name, 0, e.name.length)
    }
    val cdSize = out.size() - cdOff
    le32(if (badEocd) 0x07054b50 else 0x06054b50) // EOCD "PK\5\6"
    le16(0); le16(0) // disk numbers
    val cnt = if (badCd) n + 1 else n
    le16(cnt); le16(cnt)
    le32(cdSize); le32(cdOff)
    le16(0) // comment length
    val full = out.toByteArray
    // deterministically below the 22-byte EOCD minimum, so the arm is
    // `truncated` for EVERY doc (the gzipBytes reasoning)
    if (trunc) full.take(12) else full
  }

  /** REAL from-scratch ZIP walk — the archive-ingest stage: EOCD
    * located by backward scan with the spec's comment-length
    * disambiguation (a candidate signature is real only if its
    * comment field spans exactly to end-of-file — a spurious match
    * inside compressed member bytes fails it), central-directory walk
    * cross-checked against each local file header, stored + DEFLATE
    * members through the shared [[inflate]], CRC-32 and size verified
    * per member, then exact text-ingest stats. Malformed input
    * degrades to STATUS ROWS, never a throw (decode-family contract);
    * a healthy archive is the family's first 1→N generator. */
  private[graft] def parseZip(id: Long, p: Array[Byte]): Seq[ZipMember] =
    zipWalk(id, p).map(_._1)

  /** [[parseZip]] with the decoded member TEXT kept (ok members only)
    * — the member grain the streamed archive dedup screens. */
  private[graft] def parseZipText(id: Long, p: Array[Byte]): Seq[ZipTextMember] =
    zipWalk(id, p).map { case (zm, t) =>
      ZipTextMember(zm.doc_id, zm.member, zm.status, Option(t)) }

  private def zipWalk(id: Long, p: Array[Byte]): Seq[(ZipMember, String)] = {
    def fail(st: String) =
      Seq((ZipMember(id, -1, st, None, None, None, None, None), null: String))
    if (p == null || p.length < 22) return fail("truncated")
    def u16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int) = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    var e = p.length - 22
    val lo = math.max(0, p.length - 22 - 65535)
    var eocd = -1
    while (e >= lo && eocd < 0) {
      if (u32(e) == 0x06054b50L && u16(e + 20) == p.length - (e + 22))
        eocd = e
      e -= 1
    }
    if (eocd < 0) return fail("bad_eocd")
    val n = u16(eocd + 10)
    // a legal EOCD-only archive (n == 0) still yields one row — the
    // decode-family "failure is a row, never silent" accounting holds
    // for EVERY input blob, empty archives included
    if (n == 0)
      return Seq((ZipMember(id, -1, "empty", None, None, None, None, None),
        null: String))
    // offsets stay Long until bounds-validated: a crafted u32 near
    // 2^31 would wrap an Int comparison negative and bypass the guard
    val cdOff = u32(eocd + 16)
    val members = scala.collection.mutable.ArrayBuffer[(ZipMember, String)]()
    var pos: Long = cdOff
    var m = 0
    while (m < n) {
      if (pos < 0 || pos + 46 > p.length || u32(pos.toInt) != 0x02014b50L)
        return fail("bad_cd")
      val cd = pos.toInt // validated above: 0 <= pos <= p.length - 46
      val method = u16(cd + 10)
      val crc = u32(cd + 16)
      val csizeL = u32(cd + 20)
      val usizeL = u32(cd + 24)
      val nameLen = u16(cd + 28)
      val extraLen = u16(cd + 30)
      val cmtLen = u16(cd + 32)
      val lhOffL = u32(cd + 42)
      if (pos + 46 + nameLen > p.length) return fail("bad_cd")
      val name = new String(p, cd + 46, nameLen, "US-ASCII")
      val mstr = if (method == 8) "deflate" else "stored"
      members +=
        (if (lhOffL < 0 || lhOffL + 30 > p.length ||
            u32(lhOffL.toInt) != 0x04034b50L ||
            u16(lhOffL.toInt + 8) != method)
          (ZipMember(id, m, "bad_local", Some(name), None, None, None, None),
            null: String)
        else {
          val lhOff = lhOffL.toInt // validated: 0 <= lhOff <= len - 30
          val dataStart: Long =
            lhOffL + 30 + u16(lhOff + 26) + u16(lhOff + 28)
          val csize = csizeL.toInt; val usize = usizeL.toInt
          // usize bounds the inflate buffer; sanity-capped so a
          // corrupt field can't allocate unbounded memory (the Long
          // comparisons reject any u32 a .toInt would have wrapped)
          if (csizeL > Int.MaxValue || usizeL > (1 << 24) ||
              dataStart + csizeL > p.length)
            (ZipMember(id, m, "bad_data", Some(name), Some(mstr),
              None, None, None), null: String)
          else try {
            val d0 = dataStart.toInt // validated: dataStart + csize <= len
            val data = method match {
              case 0 =>
                if (csize != usize) throw PngBad
                java.util.Arrays.copyOfRange(p, d0, d0 + csize)
              case 8 => inflate(p, d0, d0 + csize, usize)
              case _ => throw PngBad
            }
            if (data.length != usize ||
                (crc32Png(data) & 0xffffffffL) != crc)
              (ZipMember(id, m, "bad_data", Some(name), Some(mstr),
                None, None, None), null: String)
            else {
              var sum = 0L; var seps = 0L; var j = 0
              while (j < data.length) {
                val v = data(j) & 0xff
                sum += v
                if (v == ' ') seps += 1
                j += 1
              }
              (ZipMember(id, m, "ok", Some(name), Some(mstr),
                Some(data.length), Some(sum), Some(seps)),
                new String(data, "US-ASCII"))
            }
          } catch {
            case ex: RuntimeException if (ex eq PngBad) || (ex eq PngTrunc) =>
              (ZipMember(id, m, "bad_data", Some(name), Some(mstr),
                None, None, None), null: String)
          }
        })
      pos += 46 + nameLen + extraLen + cmtLen
      m += 1
    }
    members.toSeq
  }

  /** The typed 1→N archive-ingest stage over [[parseZip]]: one input
    * blob row fans out to one row per member — `flatMap` inside the
    * per-partition batch, so the generator fuses into the scan. */
  def decodeZip(ds: Dataset[BinaryDoc]): Dataset[ZipMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.flatMap(d => parseZip(d.doc_id, d.payload))
    }
  }

  /** The text-bearing member fan-out — same scan-fused stateless
    * flatMap, feeding the member grain into downstream text stages
    * (the archive-member dedup screen). */
  def decodeZipText(ds: Dataset[BinaryDoc]): Dataset[ZipTextMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap(d => parseZipText(d.doc_id, d.payload))
    }
  }

  /** `.jsonl.zst` blob → record fan-out — the transport stage of
    * q_zstd_jsonl, factored so the streamed front door
    * ([[graft.streaming.Streams.zstdJsonlIngest]]) runs the SAME
    * function per micro-batch: the multi-frame walk (skippable
    * frames skipped, dictionary frames resolved against the fixture
    * registry), the JSONL line split, and codegen JSON field
    * extraction. One row per record on ok blobs; one null-line
    * status row on malformed transport (decode-family contract).
    * Stateless — a flatMap fused into the scan, so the plan streams
    * unchanged. */
  def zstdJsonlFanout(blobs: Dataset[BinaryDoc]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs
      .mapPartitions(_.flatMap { bd =>
        val (st, content, nf) =
          Zstd.decodeFrames(bd.payload, dicts = Zstd.fixtureDicts)
        if (st == "ok")
          new String(content, "ISO-8859-1").split("\n").iterator
            .filter(_.nonEmpty).map(l => (bd.doc_id, st, nf, l))
        else Iterator((bd.doc_id, st, nf, null: String))
      })
      .toDF("doc_id", "status", "nf", "line")
      .withColumn("rid",
        expr("cast(get_json_object(line, '$.id') as int)"))
      .withColumn("rtext", expr("get_json_object(line, '$.text')"))
  }

  // ---------------------------------------------------------------------
  // TAR (POSIX ustar) — the SECOND 1→N container, and the shape public
  // corpora are actually distributed in (The Pile / RedPajama
  // tarballs): fixed 512-byte headers with octal size fields and a
  // space-normalized header checksum, data padded to 512-byte blocks,
  // terminated by two zero blocks. Positional like ppm_pipe — there is
  // no central directory to cross-check, so header failures stop the
  // walk with a row.
  // ---------------------------------------------------------------------

  /** Synthesize a REAL ustar archive from a doc's md5: n ∈ 1..3
    * members, member m's payload `(h ++ ":" ++ m ++ " ") × k`
    * (k ∈ 1..3 — the SAME text shape as [[zipBytes]], so both
    * containers share the oracle's stats arithmetic), genuine header
    * checksums, member 1 exercising the ustar prefix field (~25% —
    * name split as `d<digit>/m1.txt`). Arms (container precedence):
    * archive truncated below one header block (~12.5% → `truncated`),
    * member-0 header checksum corrupted (~6% → `bad_checksum`, walk
    * stops), LAST member's data cut mid-payload with the trailer
    * dropped (~12.5% → `short_data` on that member, earlier members
    * still `ok`). */
  private[graft] def tarBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val n = 1 + b(0) % 3
    val trunc = b(12) % 8 == 6
    val badChk = b(11) % 16 == 3
    val shortData = b(14) % 8 == 1
    val usePfx = b(15) % 4 == 0
    val out = new java.io.ByteArrayOutputStream(2048)
    def field(dst: Array[Byte], off: Int, s: String): Unit = {
      val bs = s.getBytes("US-ASCII")
      System.arraycopy(bs, 0, dst, off, math.min(bs.length, 99))
    }
    def octal(dst: Array[Byte], off: Int, len: Int, v: Long): Unit =
      field(dst, off, ("%0" + (len - 1) + "o").format(v))
    var cut = -1
    (0 until n).foreach { m =>
      val k = 1 + b(5 + m) % 3
      val data = ((h + ":" + m + " ") * k).getBytes("US-ASCII")
      val hdr = new Array[Byte](512)
      if (m == 1 && usePfx) {
        field(hdr, 0, "m1.txt")
        field(hdr, 345, "d" + (b(15) % 10))
      } else field(hdr, 0, s"m$m.txt")
      octal(hdr, 100, 8, 420) // mode 0644
      octal(hdr, 108, 8, 0); octal(hdr, 116, 8, 0) // uid, gid
      octal(hdr, 124, 12, data.length.toLong)
      octal(hdr, 136, 12, (b(3) | (b(4) << 8)).toLong) // mtime
      hdr(156) = '0' // typeflag: regular file
      field(hdr, 257, "ustar"); hdr(263) = 0
      hdr(264) = '0'; hdr(265) = '0' // version "00"
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0; var i = 0
      while (i < 512) { sum += hdr(i) & 0xff; i += 1 }
      octal(hdr, 148, 7, (if (badChk && m == 0) sum + 1 else sum).toLong)
      hdr(155) = ' '
      out.write(hdr, 0, 512)
      if (shortData && m == n - 1) {
        cut = out.size() + (data.length + 1) / 2
        out.write(data, 0, data.length)
      } else {
        out.write(data, 0, data.length)
        val pad = (512 - data.length % 512) % 512
        out.write(new Array[Byte](pad), 0, pad)
      }
    }
    if (cut < 0) out.write(new Array[Byte](1024), 0, 1024) // end blocks
    val full = out.toByteArray
    if (trunc) full.take(100)
    else if (cut >= 0) full.take(cut)
    else full
  }

  /** REAL from-scratch ustar walk — see [[TarMember]] for the row
    * contract. All offsets and sizes stay Long until bounds-validated
    * (the [[parseZip]] overflow rule); a size octal that fails to
    * parse is `bad_header`, a checksum mismatch is `bad_checksum` —
    * both STOP the walk with their row, because a positional
    * container with an untrusted header has no resync point. Spec:
    * POSIX.1-1988 ustar (header layout, space-normalized checksum,
    * two-zero-block trailer). */
  private[graft] def parseTar(id: Long, p: Array[Byte]): Seq[TarMember] = {
    def one(m: Int, st: String, name: Option[String] = None) =
      Seq(TarMember(id, m, st, name, None, None, None))
    if (p == null || p.length < 512) return one(-1, "truncated")
    val members = scala.collection.mutable.ArrayBuffer[TarMember]()
    var pos: Long = 0
    var m = 0
    while (true) {
      if (pos + 512 > p.length)
        return (members += TarMember(id, m, "truncated",
          None, None, None, None)).toSeq
      val h0 = pos.toInt // validated: pos <= p.length - 512
      var allZero = true
      var i = 0
      while (allZero && i < 512) { if (p(h0 + i) != 0) allZero = false; i += 1 }
      if (allZero) // trailer (second zero block not required to parse)
        return if (members.isEmpty) one(-1, "empty") else members.toSeq
      if (!(p(h0 + 257) == 'u' && p(h0 + 258) == 's' && p(h0 + 259) == 't' &&
          p(h0 + 260) == 'a' && p(h0 + 261) == 'r'))
        return (members += TarMember(id, m, "bad_magic",
          None, None, None, None)).toSeq
      // space-normalized checksum: stored octal vs sum with the
      // checksum field itself read as 8 spaces
      var sum = 0L; i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else p(h0 + i) & 0xff)
        i += 1
      }
      def octalAt(off: Int, len: Int): Long = {
        var j = off
        // historic/BSD tar writers pad octal fields with LEADING
        // spaces ("  1750 ") — skip them, then stop at the first
        // trailing space/NUL (GNU/libarchive parse discipline)
        while (j < off + len && p(h0 + j) == ' ') j += 1
        var v = 0L; var seen = false
        while (j < off + len && p(h0 + j) != 0 && p(h0 + j) != ' ') {
          val c = p(h0 + j) - '0'
          if (c < 0 || c > 7 || v > (Long.MaxValue >> 3)) return -1L
          v = (v << 3) + c; seen = true; j += 1
        }
        if (seen) v else -1L
      }
      // Pre-POSIX tars summed header bytes as SIGNED chars; accept
      // that sum as a fallback the way GNU tar and libarchive do.
      var ssum = 0L; i = 0
      while (i < 512) {
        ssum += (if (i >= 148 && i < 156) ' '.toInt else p(h0 + i).toLong)
        i += 1
      }
      val stored = octalAt(148, 8)
      if (stored != sum && stored != ssum)
        return (members += TarMember(id, m, "bad_checksum",
          None, None, None, None)).toSeq
      val size = octalAt(124, 12)
      if (size < 0)
        return (members += TarMember(id, m, "bad_header",
          None, None, None, None)).toSeq
      def str(off: Int, len: Int): String = {
        var e = off
        while (e < off + len && p(h0 + e) != 0) e += 1
        new String(p, h0 + off, e - off, "US-ASCII")
      }
      val nm = str(0, 100)
      val pfx = str(345, 155)
      val name = if (pfx.isEmpty) nm else pfx + "/" + nm
      if (pos + 512 + size > p.length)
        return (members += TarMember(id, m, "short_data",
          Some(name), None, None, None)).toSeq
      val d0 = (pos + 512).toInt // validated: d0 + size <= p.length
      var bsum = 0L; var seps = 0L
      var j = 0
      while (j < size) {
        val v = p(d0 + j) & 0xff
        bsum += v
        if (v == ' ') seps += 1
        j += 1
      }
      members += TarMember(id, m, "ok", Some(name),
        Some(size.toInt), Some(bsum), Some(seps))
      pos += 512 + ((size + 511) / 512) * 512
      m += 1
    }
    members.toSeq // unreachable
  }

  /** The typed 1→N TAR ingest stage — same scan-fused flatMap shape
    * as [[decodeZip]]. */
  def decodeTar(ds: Dataset[BinaryDoc]): Dataset[TarMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap(d => parseTar(d.doc_id, d.payload))
    }
  }

  // ---------------------------------------------------------------------
  // BASELINE JPEG (ITU-T T.81, SOF0) — the image format that dominates
  // real crawls, and this family's first full TRANSFORM codec: marker
  // walk, DQT/DHT parsing, MSB-first Huffman entropy decode with FF00
  // byte unstuffing, dequantization, de-zigzag, a fixed-point 8×8
  // IDCT, level shift, and the JFIF integer YCbCr→RGB.
  //
  // Exactness design (the QOI/PNG oracle discipline adapted to a
  // LOSSY codec): the fixture generator picks each 8×8 block's
  // content IN THE FREQUENCY DOMAIN — only the DC coefficient and the
  // (4,4) AC coefficient are non-zero, both multiples of 8. For that
  // coefficient pair the true IDCT is exactly integer-valued:
  // s(x,y) = S00/8 + (S44/8)·σ(x)σ(y), with σ = [+,−,−,+,+,−,−,+]
  // (cos((2x+1)π/4) = σ(x)/√2, and C(4)=1, so the two 1/√2 factors
  // square to 1/2). The decoder still runs a GENERIC 64-term
  // fixed-point IDCT (13-bit StrictMath cos table, 2^28 final scale);
  // on these inputs its absolute error is < 0.01 ≪ 0.5, so rounding
  // recovers the exact integers and the DuckDB twin can recompute the
  // pixels as a pure md5 function without ever running an IDCT. On
  // real JPEGs the same IDCT is a standard approximate integer IDCT.
  // ---------------------------------------------------------------------

  /** Zigzag position k → natural raster index (v·8 + u) of the 8×8
    * coefficient array (T.81 Figure A.6). */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Zigzag index of the (u=4, v=4) coefficient (natural 36). */
  private val JpegZ44: Int = JpegZigzag.indexOf(36)

  /** cos table: idctT(x)(u) = round(C(u)·cos((2x+1)uπ/16)·8192),
    * C(0) = 1/√2 — StrictMath for bit-identical values on any JVM. */
  private lazy val jpegIdctT: Array[Array[Long]] = Array.tabulate(8, 8) {
    (x, u) =>
      val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      StrictMath.round(
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0) * c * 8192.0)
  }

  private object JpegTrunc extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private object JpegBad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** MSB-first entropy-segment bit writer with T.81 byte stuffing
    * (an 0xFF data byte is followed by 0x00) and 1-padding flush. */
  private final class JpegBitWriter {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var acc = 0; private var n = 0
    def bits(v: Int, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc & 255)
          if ((acc & 255) == 0xff) out.write(0)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) {
      while (n < 8) { acc = (acc << 1) | 1; n += 1 }
      out.write(acc & 255)
      if ((acc & 255) == 0xff) out.write(0)
      acc = 0; n = 0
    }
    /** Byte-align, then emit RSTm — markers are raw, never stuffed. */
    def restartMarker(m: Int): Unit = {
      flush()
      out.write(0xff); out.write(0xd0 + (m & 7))
    }
    def result(): Array[Byte] = out.toByteArray
  }

  /** MSB-first entropy-segment bit reader: unstuffs FF00, signals
    * [[JpegTrunc]] at EOF and [[JpegBad]] on a bare marker mid-scan
    * (no DRI is ever emitted, so a restart marker is corruption). */
  private final class JpegBitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= p.length) throw JpegTrunc
        val v = p(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= p.length) throw JpegTrunc
          if ((p(pos) & 0xff) == 0) pos += 1 else throw JpegBad
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Consume an expected RSTm at an MCU-restart boundary: drop the
      * current byte's padding bits, read the raw FF Dm pair, return m
      * (0..7). Anything else is corruption. */
    def restart(): Int = {
      n = 0 // discard 1-padding to the byte boundary
      if (pos + 1 >= p.length) throw JpegTrunc
      if ((p(pos) & 0xff) != 0xff) throw JpegBad
      val m = p(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) throw JpegBad
      pos += 2
      m - 0xd0
    }
  }

  /** Canonical JPEG Huffman decoder from a DHT's BITS/HUFFVAL —
    * the same first-code/count walk as the DEFLATE decoder, fed
    * MSB-first. */
  private final class JpegHuff(bits: Array[Int], vals: Array[Int]) {
    def decode(br: JpegBitReader): Int = {
      var code = 0; var first = 0; var index = 0
      var len = 1
      while (len <= 16) {
        code |= br.bit()
        val c = bits(len)
        if (code - first < c) return vals(index + (code - first))
        index += c
        first = (first + c) << 1
        code <<= 1
        len += 1
      }
      throw JpegBad
    }
  }

  /** Magnitude category of a DC diff / AC value (T.81 F.1.2.1.1). */
  private def jpegCat(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Extend a `t`-bit received magnitude to its signed value. */
  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** JFIF integer YCbCr→RGB (the libjpeg 2^16 fixed-point constants),
    * written as round-half-up FLOOR division with a 2^30 offset so
    * the DuckDB twin's `//` (truncating, and floor on the always-
    * positive offset operand) computes the identical integer. */
  private def jpegYcc2Rgb(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def fd(x: Long): Int =
      (((x + 32768L + (1L << 30)) >> 16) - 16384L).toInt
    def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    (cl(yv + fd(91881L * (cr - 128))),
      cl(yv - fd(22554L * (cb - 128) + 46802L * (cr - 128))),
      cl(yv + fd(116130L * (cb - 128))))
  }

  /** Per-doc block content — the md5-pure "logical pixels" both the
    * encoder and the DuckDB twin derive: component `c`'s block `bi`
    * decodes to 128 + d0 + d4·σ(x)σ(y). */
  private def jpegD0(b: Array[Int], c: Int, bi: Int): Int =
    b((2 + 3 * c + bi) % 16) % 48 - 24
  private def jpegD4(b: Array[Int], c: Int, bi: Int): Int =
    b((7 + 2 * c + bi) % 16) % 32 - 16

  /** Synthesize a REAL baseline JPEG from a doc's md5: SOI, one DQT
    * segment carrying BOTH quant tables (luma 0, chroma 1 — the
    * multi-table walk), SOF0 (8-bit, 3 components, 4:4:4), one DHT
    * segment with optimized DC+AC tables (two-pass, canonical — the
    * real optimized-Huffman encoder shape), SOS, the stuffed entropy
    * segment, EOI. Dimensions 8 or 16 per axis (1–4 MCUs). Arms:
    * corrupted SOI (~6% → `bad_magic`), REAL progressive SOF2 frame
    * (~6% → fully decoded, see the scan-plan note below), 12-bit
    * precision (~12.5% → `unsupported`, dims still read — the
    * libjpeg header-probe behavior), file cut 3 bytes short
    * (~12.5% → `truncated`). */
  private object PdfBad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private object PdfObjBad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Spec-faithful PDF 1.4 fixture from a doc's md5: %PDF header,
    * catalog → pages → per-page /Contents graph, zlib-wrapped
    * FlateDecode content streams (the [[deflateFixed]]/[[adler32]]
    * machinery PNG/gzip already exercise) carrying `BT … (…) Tj ET`
    * and `BT [ (…) kern (…) ] TJ ET` text operators, a byte-exact
    * xref table (20-byte entries), trailer, startxref. Arms
    * (exclusive, precedence order): corrupted header magic; file
    * truncation that cuts the trailer (the mid-flight crawl shape —
    * a PDF reader finds no startxref); startxref pointing into junk;
    * a corrupt CATALOG xref entry (offset off by 2 — the object
    * header check must catch it); a reserved-BTYPE Flate first byte
    * (detected unconditionally — a random bit-flip could silently
    * decode to wrong text and break the oracle); a SUPPORTED
    * /ASCIIHexDecode stream (whitespace + odd-final-digit rules
    * exercised); a SUPPORTED [/AHx /Fl] filter CHAIN (the zlib bytes
    * hex-wrapped, aliases accepted, filters applied in listed
    * order); a genuinely ASCII85-encoded /ASCII85Decode stream (a
    * real filter outside the decode surface → `unsupported`). The
    * independent escape arm
    * embeds `\(`, `\)`, `\\` in a literal string; the TJ array's
    * -250 kern is a word break the extractor must reproduce. */
  private[graft] def pdfBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(11) % 16 == 7
    val trunc = !badMagic && b(13) % 8 == 6
    val badXref = !badMagic && !trunc && b(12) % 8 == 5
    val badObj = !badMagic && !trunc && !badXref && b(15) % 8 == 1
    val badFlate = !badMagic && !trunc && !badXref && !badObj &&
      b(14) % 8 == 3
    // SUPPORTED §7.4.2 single filter (r18): page 0's raw ops
    // hex-encoded — whitespace inside the hex run and an odd final
    // digit (the implied-trailing-0 rule) both exercised.
    val hexFilter = !badMagic && !trunc && !badXref && !badObj &&
      !badFlate && b(9) % 8 == 2
    // FILTER CHAIN [/AHx /Fl] — the §7.4 composition real PDFs ship
    // (filters applied in listed order): the zlib stream hex-encoded,
    // spelled with the inline-image ALIASES to pin alias acceptance.
    val hexFlateChain = !badMagic && !trunc && !badXref && !badObj &&
      !badFlate && b(9) % 8 == 4
    // The honest `unsupported` arm, moved to a genuinely
    // unimplemented filter: real ASCII85 bytes (4→5 base-85 groups,
    // 'z' zero shorthand, ~> EOD) — the extractor must gate on the
    // NAME and never misread the bytes.
    val a85Filter = !badMagic && !trunc && !badXref && !badObj &&
      !badFlate && b(9) % 8 == 5
    val esc = b(10) % 4 == 1
    val nPages = 1 + b(0) % 2
    def pageOps(pg: Int): String = {
      val s1 = s"Page $pg: ${h.substring(2 * pg, 2 * pg + 8)}" +
        (if (esc) " \\(\\)\\\\" else "")
      val p1 = h.substring(8, 12); val p2 = h.substring(12, 16)
      s"BT /F1 12 Tf 72 720 Td ($s1) Tj ET\n" +
        s"BT [ ($p1) -250 ($p2) ] TJ ET\n"
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    def wr(str: String): Unit = out.write(str.getBytes("ISO-8859-1"))
    wr(if (badMagic) "%QDF-1.4\n" else "%PDF-1.4\n")
    val nObj = 3 + 2 * nPages
    val offs = new Array[Int](nObj + 1)
    def obj(n: Int)(body: => Unit): Unit = {
      offs(n) = out.size()
      wr(s"$n 0 obj\n"); body; wr("endobj\n")
    }
    obj(1) { wr("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) {
      val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R")
        .mkString(" ")
      wr(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\n")
    }
    for (i <- 0 until nPages) {
      obj(3 + 2 * i) {
        wr(s"<< /Type /Page /Parent 2 0 R /Contents ${4 + 2 * i} 0 R >>\n")
      }
      val raw = pageOps(i).getBytes("ISO-8859-1")
      val defl = deflateFixed(raw)
      val ad = adler32(raw)
      val z = new Array[Byte](2 + defl.length + 4)
      z(0) = 0x78.toByte; z(1) = 0x01
      System.arraycopy(defl, 0, z, 2, defl.length)
      z(defl.length + 2) = ((ad >>> 24) & 255).toByte
      z(defl.length + 3) = ((ad >>> 16) & 255).toByte
      z(defl.length + 4) = ((ad >>> 8) & 255).toByte
      z(defl.length + 5) = (ad & 255).toByte
      if (badFlate && i == 0) z(2) = 0x06.toByte // BFINAL=0, BTYPE=3
      if (hexFilter && i == 0) {
        // raw ops as hex pairs, a line break every 64 digits, and the
        // final byte emitted as ONE odd digit ("2" → 0x20 under the
        // implied-trailing-0 rule: a harmless content-stream space)
        val hex = (raw.map(x => f"${x & 0xff}%02x").mkString
          .grouped(64).mkString("\n") + "\n2>").getBytes("ISO-8859-1")
        obj(4 + 2 * i) {
          wr(s"<< /Length ${hex.length} /Filter /ASCIIHexDecode >>" +
            "\nstream\n")
          out.write(hex, 0, hex.length)
          wr("\nendstream\n")
        }
      } else if (hexFlateChain && i == 0) {
        val hex = (z.map(x => f"${x & 0xff}%02x").mkString + ">")
          .getBytes("ISO-8859-1")
        obj(4 + 2 * i) {
          wr(s"<< /Length ${hex.length} /Filter [ /AHx /Fl ] >>" +
            "\nstream\n")
          out.write(hex, 0, hex.length)
          wr("\nendstream\n")
        }
      } else if (a85Filter && i == 0) {
        val a85 = ascii85(raw).getBytes("ISO-8859-1")
        obj(4 + 2 * i) {
          wr(s"<< /Length ${a85.length} /Filter /ASCII85Decode >>" +
            "\nstream\n")
          out.write(a85, 0, a85.length)
          wr("\nendstream\n")
        }
      } else obj(4 + 2 * i) {
        wr(s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n")
        out.write(z, 0, z.length)
        wr("\nendstream\n")
      }
    }
    val xrefOff = out.size()
    wr(s"xref\n0 ${nObj + 1}\n")
    wr("0000000000 65535 f \n")
    for (n <- 1 to nObj) {
      val o = if (badObj && n == 1) offs(n) + 2 else offs(n)
      wr(f"$o%010d 00000 n \n")
    }
    wr(s"trailer\n<< /Size ${nObj + 1} /Root 1 0 R >>\n")
    wr(s"startxref\n${if (badXref) xrefOff + 3 else xrefOff}\n%%EOF\n")
    val full = out.toByteArray
    if (trunc) full.take(full.length * 3 / 5) else full
  }

  /** Genuine ASCII85 (§7.4.3) for the unsupported-filter arm: 4-byte
    * big-endian groups to 5 base-85 chars (+33), 'z' for an all-zero
    * full group, partial tails emit n+1 chars, `~>` EOD — honest
    * bytes for a filter the decode surface intentionally gates on. */
  private def ascii85(data: Array[Byte]): String = {
    val sb = new StringBuilder(data.length * 5 / 4 + 4)
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (i + j < data.length) data(i + j) & 0xff else 0)
        j += 1
      }
      if (n == 4 && v == 0L) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var x = v
        var k = 4
        while (k >= 0) { cs(k) = ((x % 85) + 33).toChar; x /= 85; k -= 1 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += 4
    }
    sb.append("~>").toString
  }

  /** §7.4.2 ASCIIHexDecode: hex digit pairs with PDF whitespace
    * skipped anywhere, `>` EOD (required — a hex stream that runs out
    * without it is malformed), an odd final digit carrying an implied
    * trailing 0 nibble. None on any non-hex non-whitespace byte. */
  private def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return Some(out.toByteArray)
      }
      if (c != ' ' && c != '\n' && c != '\r' && c != '\t' &&
          c != '\f' && c != 0) {
        val v = Character.digit(c, 16)
        if (v < 0) return None
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    None
  }

  /** CONTENT-carrying PDF: the same spec-faithful structure as
    * [[pdfBytes]] but embedding the DOC'S OWN TEXT — one paragraph
    * per page (the [[htmlOf]] word-halves split, so the same article
    * rendered as PDF and as HTML extracts to the same blocks), each
    * a literal Tj string with `\ ( )` escaped. No failure arms: this
    * is the post-front-door payload cross-format dedup consumes. */
  private[graft] def pdfBytesOf(text: String, h: String): Array[Byte] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val n1 = (toks.length + 1) / 2
    val paras = Seq(toks.take(n1).mkString(" "), toks.drop(n1).mkString(" "))
    def escPdf(s: String): String = s.replace("\\", "\\\\")
      .replace("(", "\\(").replace(")", "\\)")
    val out = new java.io.ByteArrayOutputStream(text.length + 1024)
    def wr(str: String): Unit = out.write(str.getBytes("ISO-8859-1"))
    wr("%PDF-1.4\n")
    val nObj = 3 + 2 * paras.length
    val offs = new Array[Int](nObj + 1)
    def obj(n: Int)(body: => Unit): Unit = {
      offs(n) = out.size()
      wr(s"$n 0 obj\n"); body; wr("endobj\n")
    }
    obj(1) { wr("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) {
      val kids = paras.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      wr(s"<< /Type /Pages /Kids [ $kids ] /Count ${paras.length} >>\n")
    }
    for ((para, i) <- paras.zipWithIndex) {
      obj(3 + 2 * i) {
        wr(s"<< /Type /Page /Parent 2 0 R /Contents ${4 + 2 * i} 0 R >>\n")
      }
      val raw = s"BT /F1 12 Tf 72 720 Td (${escPdf(para)}) Tj ET\n"
        .getBytes("ISO-8859-1")
      val defl = deflateFixed(raw)
      val ad = adler32(raw)
      val z = new Array[Byte](2 + defl.length + 4)
      z(0) = 0x78.toByte; z(1) = 0x01
      System.arraycopy(defl, 0, z, 2, defl.length)
      z(defl.length + 2) = ((ad >>> 24) & 255).toByte
      z(defl.length + 3) = ((ad >>> 16) & 255).toByte
      z(defl.length + 4) = ((ad >>> 8) & 255).toByte
      z(defl.length + 5) = (ad & 255).toByte
      obj(4 + 2 * i) {
        wr(s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n")
        out.write(z, 0, z.length)
        wr("\nendstream\n")
      }
    }
    val xrefOff = out.size()
    wr(s"xref\n0 ${nObj + 1}\n")
    wr("0000000000 65535 f \n")
    for (n <- 1 to nObj) wr(f"${offs(n)}%010d 00000 n \n")
    wr(s"trailer\n<< /Size ${nObj + 1} /Root 1 0 R >>\n")
    wr(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** REAL from-scratch PDF text extraction — the twelfth decoder and
    * the biggest remaining real-crawl format beside HTML: header
    * check, startxref scan in the document tail, xref-table walk
    * (20-byte entries, free/in-use types), trailer /Root, then the
    * catalog → /Pages → /Kids → /Contents object graph, each content
    * stream inflated through the SHARED RFC 1950/1951 machinery
    * ([[zlibInflate]] — the same code path PNG and gzip gate), and a
    * genuine content-stream tokenizer: literal strings with escape
    * sequences (\( \) \\ \n \r \t \b \f, octal \ddd, line
    * continuations, balanced nested parens), arrays, BT/ET text
    * blocks, and the Tj / TJ show operators. Statuses: bad_magic,
    * truncated (no trailer in the tail), bad_xref, bad_object (xref
    * points at a non-object), bad_flate (stream fails to inflate or
    * its adler32 lies), unsupported (a filter name outside
    * {FlateDecode/Fl, ASCIIHexDecode/AHx} — gated on the NAME before
    * any byte work; chains apply in listed §7.4 order), bad_data
    * (anything else malformed, incl. a corrupt hex stream). Total on
    * arbitrary bytes
    * (DecoderFuzzSpec). Map-only, scan-fused like every decoder. */
  /** [[parsePdf]] + the extracted text itself (`None` unless status
    * is "ok") — the form content-keyed consumers use
    * (q_dedup_cross_format's canonicalizer needs the blocks, not just
    * their md5). */
  private[graft] def parsePdfText(id: Long,
      p: Array[Byte]): (PdfMeta, Option[String]) = {
    val sink = new StringBuilder
    val m = parsePdf(id, p, sink)
    (m, if (m.status == "ok") Some(sink.toString) else None)
  }

  private[graft] def parsePdf(id: Long, p: Array[Byte],
      textSink: StringBuilder = null): PdfMeta = {
    def fail(st: String, np: Option[Int] = None, no: Option[Int] = None) =
      PdfMeta(id, st, np, no, None, None, None)
    var nPages: Option[Int] = None
    var nObjects: Option[Int] = None
    try {
      if (p == null || p.length < 16) return fail("bad_magic")
      val hdr = "%PDF-"
      var k = 0
      while (k < 5) {
        if ((p(k) & 0xff) != hdr.charAt(k)) return fail("bad_magic")
        k += 1
      }
      val s = new String(p, "ISO-8859-1")
      // startxref lives in the document tail (readers scan the last
      // ~1 KiB); its absence is the torn-download shape
      val tailFrom = math.max(0, s.length - 2048)
      val sxAt = s.lastIndexOf("startxref")
      if (sxAt < tailFrom) return fail("truncated")
      val xrefOff = ("""startxref\s+(\d{1,9})""".r
        .findFirstMatchIn(s.substring(sxAt)) match {
        case Some(m) => m.group(1).toInt
        case None => return fail("truncated")
      })
      if (xrefOff < 0 || xrefOff >= s.length ||
          !s.startsWith("xref", xrefOff)) return fail("bad_xref")
      var pos = xrefOff + 4
      def skipWs(): Unit =
        while (pos < s.length && " \r\n\t".indexOf(s.charAt(pos)) >= 0)
          pos += 1
      def readInt(): Int = {
        skipWs(); var v = 0L; var any = false
        while (pos < s.length && s.charAt(pos).isDigit) {
          v = v * 10 + (s.charAt(pos) - '0'); pos += 1; any = true
          if (v > Int.MaxValue) throw PdfBad
        }
        if (!any) throw PdfBad
        v.toInt
      }
      val first = readInt(); val cnt = readInt()
      if (first != 0 || cnt < 1 || cnt > 100000) return fail("bad_xref")
      skipWs()
      val offs = new Array[Int](cnt)
      var e = 0
      while (e < cnt) {
        if (pos + 20 > s.length) return fail("bad_xref")
        val off = s.substring(pos, pos + 10)
        if (!off.forall(_.isDigit)) return fail("bad_xref")
        val typ = s.charAt(pos + 17)
        if (typ != 'n' && typ != 'f') return fail("bad_xref")
        val ov = off.toLong
        if (ov > Int.MaxValue) return fail("bad_xref")
        offs(e) = ov.toInt
        pos += 20
        e += 1
      }
      skipWs()
      if (!s.startsWith("trailer", pos)) return fail("bad_xref")
      val trailer = s.substring(pos,
        math.min(s.length, pos + 400))
      def dictRef(d: String, key: String): Option[Int] =
        (key + """\s+(\d{1,9})\s+0\s+R""").r.findFirstMatchIn(d)
          .map(_.group(1).toInt)
      def dictInt(d: String, key: String): Option[Int] =
        (key + """\s+(\d{1,9})""").r.findFirstMatchIn(d)
          .map(_.group(1).toInt)
      val root = dictRef(trailer, "/Root") match {
        case Some(r) => r
        case None => return fail("bad_xref")
      }
      val size = dictInt(trailer, "/Size") match {
        case Some(v) => v
        case None => return fail("bad_xref")
      }
      nObjects = Some(size - 1) // object 0 is the free-list head
      /** The dict of object `num` at its xref offset: the `N 0 obj`
        * header must sit exactly there (a misaligned entry is a
        * bad_object, the arm the off-by-2 fixture pins). */
      def dictAt(num: Int): (String, Int) = {
        if (num <= 0 || num >= cnt) throw PdfObjBad
        val o = offs(num)
        if (o < 0 || o >= s.length || !s.startsWith(s"$num 0 obj", o))
          throw PdfObjBad
        val d0 = s.indexOf("<<", o)
        val d1 = if (d0 < 0) -1 else s.indexOf(">>", d0)
        if (d0 < 0 || d1 < 0 || d0 > o + 40) throw PdfObjBad
        (s.substring(d0, d1 + 2), d1 + 2)
      }
      val (cat, _) = dictAt(root)
      val pagesRef = dictRef(cat, "/Pages").getOrElse(throw PdfObjBad)
      val (pagesD, _) = dictAt(pagesRef)
      val kidsStr = """/Kids\s*\[([^\]]*)\]""".r
        .findFirstMatchIn(pagesD).map(_.group(1))
        .getOrElse(throw PdfObjBad)
      val kids = """(\d{1,9})\s+0\s+R""".r.findAllMatchIn(kidsStr)
        .map(_.group(1).toInt).toSeq
      val count = dictInt(pagesD, "/Count").getOrElse(throw PdfObjBad)
      if (count != kids.length) throw PdfObjBad
      nPages = Some(count)
      var ops = 0
      val doc = new StringBuilder
      var pg = 0
      for (kid <- kids) {
        val (pageD, _) = dictAt(kid)
        val cRef = dictRef(pageD, "/Contents").getOrElse(throw PdfObjBad)
        val (contD, dEnd) = dictAt(cRef)
        val len = dictInt(contD, "/Length").getOrElse(throw PdfObjBad)
        // /Filter: a single name or an array of names applied in
        // listed order (§7.4); the inline-image aliases /Fl and /AHx
        // are accepted beside the full names. A name outside the
        // decode surface gates the page BEFORE any byte work.
        // Name-boundary anchored (§7.3.5): the trailing \b stops a
        // LONGER key like /Filterette from matching as /Filter. No
        // lookbehind before the solidus — '/' is itself a delimiter,
        // so `8 0 R/Filter` and `/Length 12/Filter` are valid common
        // dicts a preceding-alnum guard would silently break (the
        // substring '/Filter' can never occur inside another NAME,
        // because a name's own solidus terminates the previous
        // token).
        val filters: Seq[String] =
          """/Filter\b\s*(\[[^\]]*\]|/[A-Za-z0-9]+)""".r
            .findFirstMatchIn(contD).map(_.group(1)) match {
            case None => Seq.empty // raw (unfiltered) stream
            case Some(x) if x.startsWith("[") =>
              """/([A-Za-z0-9]+)""".r.findAllMatchIn(x)
                .map(_.group(1)).toSeq
            case Some(x) => Seq(x.drop(1))
          }
        if (filters.exists(f => f != "FlateDecode" && f != "Fl" &&
            f != "ASCIIHexDecode" && f != "AHx"))
          return fail("unsupported", nPages, nObjects)
        var st = s.indexOf("stream", dEnd)
        if (st < 0 || st > dEnd + 8) throw PdfObjBad
        st += 6
        if (st < s.length && s.charAt(st) == '\r') st += 1
        if (st < s.length && s.charAt(st) == '\n') st += 1
        if (len < 0 || st + len > p.length)
          return fail("truncated", nPages, nObjects)
        var data = java.util.Arrays.copyOfRange(p, st, st + len)
        for (f <- filters) f match {
          case "FlateDecode" | "Fl" =>
            val (raw, adOk) =
              try zlibInflate(data, 0, data.length, 1 << 16)
              catch {
                case PngBad | PngTrunc =>
                  return fail("bad_flate", nPages, nObjects)
              }
            if (!adOk) return fail("bad_flate", nPages, nObjects)
            data = raw
          case _ => // ASCIIHexDecode | AHx
            data = asciiHexDecode(data) match {
              case Some(d) => d
              case None => return fail("bad_data", nPages, nObjects)
            }
        }
        val (pOps, pText) = pdfTextOps(new String(data, "ISO-8859-1"))
        ops += pOps
        if (pg > 0) doc.append('\n')
        doc.append(pText)
        pg += 1
      }
      val txt = doc.toString
      if (textSink != null) textSink.append(txt)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(txt.getBytes("ISO-8859-1"))
        .map(x => f"${x & 0xff}%02x").mkString
      PdfMeta(id, "ok", nPages, nObjects, Some(ops),
        Some(txt.length), Some(md))
    } catch {
      case PdfObjBad => fail("bad_object", nPages, nObjects)
      case PdfBad => fail("bad_xref", nPages, nObjects)
      case _: IndexOutOfBoundsException => fail("bad_data")
      case _: NumberFormatException => fail("bad_data")
    }
  }

  /** Content-stream text-operator scan: (n_show_ops, extracted text).
    * Tokenizes literal strings (escapes, octal, continuations,
    * balanced nested parens), `[ … ]` arrays, and the BT/ET/Tj/TJ
    * operators; strings shown outside a BT…ET block are ignored (the
    * spec makes them meaningless there). */
  private def pdfTextOps(c: String): (Int, String) = {
    val out = new StringBuilder
    var ops = 0
    var i = 0
    var inBT = false
    var pendStr: String = null   // last literal string (Tj operand)
    var arr: StringBuilder = null // accumulating [ … ] string parts
    def readString(from: Int): (String, Int) = {
      val sb = new StringBuilder
      var j = from
      var depth = 1
      while (j < c.length && depth > 0) {
        val ch = c.charAt(j)
        if (ch == '\\' && j + 1 < c.length) {
          val n = c.charAt(j + 1)
          n match {
            case 'n' => sb.append('\n'); j += 2
            case 'r' => sb.append('\r'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'b' => sb.append('\b'); j += 2
            case 'f' => sb.append('\f'); j += 2
            case '(' => sb.append('('); j += 2
            case ')' => sb.append(')'); j += 2
            case '\\' => sb.append('\\'); j += 2
            case '\n' => j += 2 // line continuation
            case '\r' =>
              j += 2; if (j < c.length && c.charAt(j) == '\n') j += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var nd = 0; j += 1
              while (nd < 3 && j < c.length && c.charAt(j) >= '0' &&
                  c.charAt(j) <= '7') {
                v = v * 8 + (c.charAt(j) - '0'); j += 1; nd += 1
              }
              sb.append((v & 0xff).toChar)
            case other => sb.append(other); j += 2 // spec: drop the \
          }
        } else if (ch == '(') { depth += 1; sb.append(ch); j += 1 }
        else if (ch == ')') {
          depth -= 1; if (depth > 0) sb.append(ch); j += 1
        } else { sb.append(ch); j += 1 }
      }
      (sb.toString, j)
    }
    def isReg(ch: Char): Boolean =
      !(" \t\r\n()[]<>/%".indexOf(ch) >= 0)
    while (i < c.length) {
      val ch = c.charAt(i)
      if (ch == '(') {
        val (str, ni) = readString(i + 1)
        if (arr != null) arr.append(str) else pendStr = str
        i = ni
      } else if (ch == '[') { arr = new StringBuilder; i += 1 }
      else if (ch == ']') { i += 1 }
      else if (isReg(ch)) {
        var j = i
        while (j < c.length && isReg(c.charAt(j))) j += 1
        c.substring(i, j) match {
          case "BT" => inBT = true; pendStr = null; arr = null
          case "ET" => inBT = false; pendStr = null; arr = null
          case "Tj" =>
            if (inBT && pendStr != null) { out.append(pendStr); ops += 1 }
            pendStr = null
          case "TJ" =>
            if (inBT && arr != null) { out.append(arr); ops += 1 }
            arr = null
          case t if arr != null && t.length > 1 && t.charAt(0) == '-' &&
              t.drop(1).forall(_.isDigit) &&
              t.drop(1).length < 10 && t.drop(1).toLong >= 180 =>
            // TJ kerning: a large negative displacement between array
            // strings is a WORD BREAK (the pdftotext/pdfminer rule;
            // threshold 180 thousandths of an em) — without it,
            // kerned words would concatenate and the extracted text
            // would diverge from what the page displays
            arr.append(' ')
          case _ => // Tf/Td/positive numbers/names: not text-showing
        }
        i = j
      } else i += 1
    }
    (ops, out.toString)
  }

  private[graft] def jpegBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val badMagic = b(11) % 16 == 9
    // PROGRESSIVE arm (~6%): a REAL multi-scan SOF2 stream — DC first
    // pass (Al=1, interleaved) → DC refinement (raw bits) → per
    // component: the 1..20 spectral band (pure EOBRUN), the 21..63
    // band at Al=1, and its Al=0 refinement (correction bits, newly
    // nonzero values, buffered-bit EOB runs). The FINAL coefficients
    // equal the baseline arm's, so the pixel oracle is unchanged — a
    // hash-green row proves the whole successive-approximation chain.
    val prog = !badMagic && b(12) % 16 == 11
    // 12-BIT PRECISION arm (~12.5%): SOF precision 12 (the extended
    // DCT shape medical/scientific JPEGs ship) — out of the 8-bit
    // decode surface, reported `unsupported` with the header dims.
    val prec12 = !badMagic && b(7) % 8 == 3
    val trunc = !badMagic && !prog && b(13) % 8 == 5
    // RESTART-INTERVAL arm (~25%): DRI with Ri = 1 MCU, an RSTm
    // between consecutive MCUs, DC predictors reset at each — the
    // shape real camera JPEGs ship. Pixels are unchanged, so the
    // oracle is unchanged: a hash-green row proves the restart
    // machinery (byte realign, modulo-8 sequence, predictor reset)
    // decodes to identical stats. Composes with the progressive arm:
    // there Ri applies PER SCAN — restarts land between MCUs in the
    // interleaved DC scans and between BLOCKS in the non-interleaved
    // AC scans, the modulo-8 counter resets at each scan start, and
    // an EOB run (with its buffered correction bits) flushes before
    // every restart boundary (T.81 E.2.4 applied to Annex G scans).
    val dri = b(10) % 4 == 3
    // COLOR-STRUCTURE arms: grayscale (1 component, ~12.5%), 4:2:0
    // chroma subsampling (~22%: Y at 2×2, chroma 1×1 per MCU — the
    // layout real camera JPEGs dominate in; dims scale ×2 so every
    // axis is a whole number of 16-px MCUs), and 4:2:2 (~19%: Y at
    // 2×1, chroma halved horizontally only — the broadcast/video
    // production layout; width scales ×2, height stays 8-granular).
    // Content stays the same pure md5 function per block, so the
    // oracle follows exactly.
    val gray = b(9) % 8 == 6
    val sub420 = !gray && b(8) % 4 == 2
    val sub422 = !gray && !sub420 && b(8) % 4 == 1
    val wScale = if (sub420 || sub422) 16 else 8
    val hScale = if (sub420) 16 else 8
    val w = wScale * (1 + b(0) % 2); val hgt = hScale * (1 + b(1) % 2)
    val nbx = w / 8; val nb = nbx * (hgt / 8)
    val nComps = if (gray) 1 else 3
    val mcuBlocksPerRow = if (sub420 || sub422) w / 16 else nbx
    val nMcu =
      if (sub420) (w / 16) * (hgt / 16)
      else if (sub422) (w / 16) * (hgt / 8)
      else nb
    /** MCU m → its (component, image-grain block index) sequence in
      * interleaved scan order. Y's index is the IMAGE block raster
      * (so pixel content is layout-independent); chroma's is the MCU
      * index (one chroma block covers the whole MCU). */
    def mcuBlocks(m: Int): Seq[(Int, Int)] =
      if (gray) Seq((0, m))
      else if (sub420) {
        val mrow = m / mcuBlocksPerRow; val mcol = m % mcuBlocksPerRow
        (for (by <- 0 to 1; bx <- 0 to 1)
          yield (0, (mrow * 2 + by) * nbx + (mcol * 2 + bx))) ++
          Seq((1, m), (2, m))
      } else if (sub422) {
        val mrow = m / mcuBlocksPerRow; val mcol = m % mcuBlocksPerRow
        (0 to 1).map(bx => (0, mrow * nbx + mcol * 2 + bx)) ++
          Seq((1, m), (2, m))
      } else (0 to 2).map(c => (c, m))
    // zigzag-order quant tables: DC and the (4,4) slot divide the
    // fixture coefficients exactly; every other slot is a plausible
    // 16 (its coefficient is always 0)
    val q0 = Array.fill(64)(16); q0(0) = 2; q0(JpegZ44) = 4
    val q1 = Array.fill(64)(16); q1(0) = 4; q1(JpegZ44) = 8
    def qdc(c: Int, bi: Int) =
      8 * jpegD0(b, c, bi) / (if (c == 0) q0(0) else q1(0))
    def qac(c: Int, bi: Int) =
      8 * jpegD4(b, c, bi) / (if (c == 0) q0(JpegZ44) else q1(JpegZ44))
    // PROGRESSIVE scan plan (T.81 Annex G): two interleaved DC scans
    // (first pass Al=1, then the one-raw-bit refinement), then per
    // component three non-interleaved AC scans — the all-zero 1..20
    // band (pure EOBRUN), the 21..63 band at Al=1, and its Al=0
    // refinement. (comps, Ss, Se, Ah, Al, comp-for-AC)
    val progPlan: Seq[(Seq[Int], Int, Int, Int, Int)] =
      if (!prog) Nil
      else Seq((0 until nComps: Seq[Int], 0, 0, 0, 1),
        (0 until nComps: Seq[Int], 0, 0, 1, 0)) ++
        (0 until nComps).flatMap(c => Seq(
          (Seq(c), 1, 20, 0, 0), (Seq(c), 21, 63, 0, 1),
          (Seq(c), 21, 63, 1, 0)))
    /** Blocks of component c in non-interleaved raster order — the
      * content index IS the raster index for every layout (Y's grain
      * is the image block raster; chroma's is the MCU raster, which
      * equals the block raster at 4:4:4). */
    def compBlockCount(c: Int): Int = if (c == 0) nb else nMcu
    /** One scan's entropy coding, parameterized over the symbol/bit
      * sinks so pass 1 (alphabet collection) and pass 2 (emission)
      * run the identical walk. */
    def runProgScan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int,
        sym: (Boolean, Int) => Unit, put: (Int, Int) => Unit,
        rst: Int => Unit): Unit = {
      if (ss == 0 && ah == 0) { // DC first pass: diffs of dc >> Al
        val pr = new Array[Int](3)
        for (m <- 0 until nMcu) {
          // restart between MCUs (Ri = 1): predictors reset per T.81
          // E.2.4 — the marker itself is emitted by the sink (no-op
          // in the collect pass)
          if (dri && m > 0) { rst((m - 1) % 8); java.util.Arrays.fill(pr, 0) }
          for ((c, bi) <- mcuBlocks(m)) {
            val v = qdc(c, bi) >> al
            val diff = v - pr(c); pr(c) = v
            val t = jpegCat(diff); sym(true, t)
            if (t > 0) put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          }
        }
      } else if (ss == 0) { // DC refinement: one raw bit per block
        for (m <- 0 until nMcu) {
          if (dri && m > 0) rst((m - 1) % 8) // realign only; no predictor
          for ((c, bi) <- mcuBlocks(m)) put((qdc(c, bi) >> al) & 1, 1)
        }
      } else { // AC band scan over ONE component (T.81: ns must be 1)
        val c = comps.head
        var eobrun = 0
        val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushEob(): Unit = if (eobrun > 0) {
          var r = 0
          while ((2 << r) <= eobrun) r += 1
          sym(false, r << 4)
          if (r > 0) put(eobrun - (1 << r), r)
          pending.foreach(put(_, 1)); pending.clear()
          eobrun = 0
        }
        val inBand = ss <= JpegZ44 && JpegZ44 <= se
        val run = JpegZ44 - ss // zero slots before the coefficient
        for (bi <- 0 until compBlockCount(c)) {
          // non-interleaved scans restart between BLOCKS; an EOB run
          // (and its buffered correction bits) must not span a
          // restart boundary, so flush first
          if (dri && bi > 0) { flushEob(); rst((bi - 1) % 8) }
          val a = if (inBand) qac(c, bi) else 0
          if (ah == 0) { // first pass: code a >> Al (toward zero)
            val a1 = if (a < 0) -((-a) >> al) else a >> al
            if (a1 == 0) eobrun += 1
            else {
              flushEob()
              (1 to run / 16).foreach(_ => sym(false, 0xF0))
              val s = jpegCat(a1)
              sym(false, ((run % 16) << 4) | s)
              put(if (a1 < 0) a1 + (1 << s) - 1 else a1, s)
              eobrun += 1 // the zero tail after the coefficient
            }
          } else { // refinement at Al
            val av = math.abs(a)
            if ((av >> al) == 0) eobrun += 1 // zero at this precision
            else if ((av >> (al + 1)) != 0) {
              // history nonzero: one buffered correction bit, read
              // back during the decoder's EOB sweep of this block
              pending += (av >> al) & 1; eobrun += 1
            } else {
              // newly nonzero at this Al: run over zero-history slots
              flushEob()
              (1 to run / 16).foreach(_ => sym(false, 0xF0))
              sym(false, ((run % 16) << 4) | 1)
              put(if (a > 0) 1 else 0, 1)
              eobrun += 1
            }
          }
        }
        flushEob()
      }
    }
    // pass 1: collect the emitted symbol alphabets (optimized tables)
    val dcSyms = scala.collection.mutable.SortedSet[Int]()
    val acSyms = scala.collection.mutable.SortedSet[Int]()
    val pred = new Array[Int](3)
    if (prog)
      progPlan.foreach { case (cs, ss, se, ah, al) =>
        runProgScan(cs, ss, se, ah, al,
          (d, s) => { if (d) dcSyms += s else acSyms += s; () },
          (_, _) => (), _ => ())
      }
    else for (m <- 0 until nMcu) {
      if (dri && m > 0) java.util.Arrays.fill(pred, 0) // restart resets DC
      for ((c, bi) <- mcuBlocks(m)) {
        val diff = qdc(c, bi) - pred(c); pred(c) = qdc(c, bi)
        dcSyms += jpegCat(diff)
        val ac = qac(c, bi)
        if (ac != 0) {
          acSyms += 0xF0
          acSyms += (((JpegZ44 - 1) % 16) << 4) | jpegCat(ac)
        }
        acSyms += 0x00 // EOB always follows (z44 < 63)
      }
    }
    if (prog && acSyms.isEmpty) acSyms += 0x00 // a DHT needs ≥1 symbol
    // canonical single-length tables: n symbols at length L with
    // 2^L > n (code space never full — the all-ones code stays free)
    def table(syms: Seq[Int]): (Array[Int], Map[Int, (Int, Int)]) = {
      var l = 1
      while ((1 << l) <= syms.size) l += 1
      val bitsArr = new Array[Int](17); bitsArr(l) = syms.size
      (bitsArr, syms.zipWithIndex.map { case (s, i) => s -> (i, l) }.toMap)
    }
    val (dcBits, dcCode) = table(dcSyms.toSeq)
    val (acBits, acCode) = table(acSyms.toSeq)
    // pass 2: the entropy segment(s)
    val progBodies: Seq[Array[Byte]] = progPlan.map {
      case (cs, ss, se, ah, al) =>
        val pbw = new JpegBitWriter
        runProgScan(cs, ss, se, ah, al,
          (d, s) => { val (c, l) = if (d) dcCode(s) else acCode(s)
            pbw.bits(c, l) },
          (v, k) => pbw.bits(v, k),
          m => pbw.restartMarker(m))
        pbw.flush()
        pbw.result()
    }
    val bw = new JpegBitWriter
    java.util.Arrays.fill(pred, 0)
    if (!prog) for (m <- 0 until nMcu) {
      if (dri && m > 0) {
        bw.restartMarker((m - 1) % 8)
        java.util.Arrays.fill(pred, 0)
      }
      for ((c, bi) <- mcuBlocks(m)) {
        val diff = qdc(c, bi) - pred(c); pred(c) = qdc(c, bi)
        val t = jpegCat(diff)
        val (dc, dl) = dcCode(t)
        bw.bits(dc, dl)
        if (t > 0) bw.bits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        val ac = qac(c, bi)
        if (ac != 0) {
          // JpegZ44 − 1 zeros precede the coded slot: ⌊run/16⌋ ZRLs,
          // then the residual run rides in the coefficient's symbol
          val run = JpegZ44 - 1
          val (zc, zl) = acCode(0xF0)
          (1 to run / 16).foreach(_ => bw.bits(zc, zl))
          val s = jpegCat(ac)
          val (cc, cl) = acCode(((run % 16) << 4) | s)
          bw.bits(cc, cl)
          bw.bits(if (ac < 0) ac + (1 << s) - 1 else ac, s)
        }
        val (ec, el) = acCode(0x00)
        bw.bits(ec, el) // EOB
      }
    }
    bw.flush()
    val scan = bw.result()
    val out = new java.io.ByteArrayOutputStream(512)
    def u8(v: Int): Unit = out.write(v & 255)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(if (badMagic) 0x88 else 0xd8) // SOI
    marker(0xdb); u16(2 + 2 * 65)        // DQT: both tables, one segment
    u8(0x00); q0.foreach(u8)             // Pq=0 (8-bit), Tq=0
    u8(0x01); q1.foreach(u8)
    marker(if (prog) 0xc2 else 0xc0)     // SOF0 (or the SOF2 arm)
    u16(8 + 3 * nComps); u8(if (prec12) 12 else 8); u16(hgt); u16(w)
    u8(nComps)
    u8(1)
    u8(if (sub420) 0x22 else if (sub422) 0x21 else 0x11) // Y sampling
    u8(0)                                // Y, qtable 0
    if (!gray) {
      u8(2); u8(0x11); u8(1)             // Cb: qtable 1
      u8(3); u8(0x11); u8(1)             // Cr: qtable 1
    }
    def dht(tcth: Int, bitsArr: Array[Int], syms: Seq[Int]): Unit = {
      u8(tcth); (1 to 16).foreach(l => u8(bitsArr(l))); syms.foreach(u8)
    }
    val dcS = dcSyms.toSeq; val acS = acSyms.toSeq
    marker(0xc4); u16(2 + (1 + 16 + dcS.size) + (1 + 16 + acS.size))
    dht(0x00, dcBits, dcS)               // DC table 0
    dht(0x10, acBits, acS)               // AC table 0
    if (dri) { marker(0xdd); u16(4); u16(1) } // DRI: restart every MCU
    if (prog) {
      // one SOS header + entropy segment per planned scan
      progPlan.zip(progBodies).foreach {
        case ((cs, ss, se, ah, al), body) =>
          marker(0xda); u16(6 + 2 * cs.size); u8(cs.size)
          cs.foreach { c => u8(c + 1); u8(0x00) }
          u8(ss); u8(se); u8((ah << 4) | al)
          out.write(body, 0, body.length)
      }
    } else {
      marker(0xda); u16(6 + 2 * nComps); u8(nComps) // SOS
      u8(1); u8(0x00)
      if (!gray) { u8(2); u8(0x00); u8(3); u8(0x00) }
      u8(0); u8(63); u8(0)               // Ss, Se, Ah/Al (baseline)
      out.write(scan, 0, scan.length)
    }
    marker(0xd9)                         // EOI
    val full = out.toByteArray
    if (trunc) full.dropRight(3) else full
  }

  /** Synthesize [[jpegBytes]]'s file with an APP1/Exif segment
    * inserted after SOI (~87.5% of docs): "Exif\\0\\0" around a
    * genuine TIFF block — II or MM byte order (~50/50, the dual-endian
    * walk witnessed), magic 42, IFD0 at offset 8 with two entries:
    * Make (ASCII, count 4 = 3 chars + NUL, inline — the ≤4-byte
    * inline-value rule) and Orientation (SHORT 1..8). Arms: no APP1
    * (~12.5% → `no_exif`), corrupt TIFF byte-order mark inside an
    * APP1 (~12.5% → `bad_exif`); the base JPEG's own arms compose
    * (bad SOI stays `bad_magic`; the SOF2/truncation arms don't touch
    * the header region, so Exif still reads). */
  private[graft] def jpegExifBytes(h: String): Array[Byte] = {
    val base = jpegBytes(h)
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    if (b(6) % 8 == 1) return base // no-APP1 arm
    val badTiff = b(5) % 8 == 2
    val big = b(4) % 2 == 0
    val orient = 1 + b(3) % 8
    // GPS arm (~50%): a GPSInfo sub-IFD pointer (tag 0x8825) whose IFD
    // carries GPSLatitude as RATIONAL×3 — 24 bytes, so the entry's
    // 4-byte slot holds an OFFSET (the out-of-line value rule real
    // Exif exercises constantly) and the walk must chase BOTH
    // indirections. Denominators are drawn from {1,2,4,5} so the
    // milli-arcsecond conversion is exact integer division.
    val hasGps = b(7) % 2 == 0
    val gpsDeg = b(0) % 90; val gpsMin = b(1) % 60
    val gpsSecN = b(2); val gpsSecD = Seq(1, 2, 4, 5)(b(3) % 4)
    val make3 = h.substring(0, 3).toUpperCase(java.util.Locale.ROOT)
    val t = new java.io.ByteArrayOutputStream(64)
    def u16(v: Int): Unit =
      if (big) { t.write(v >> 8); t.write(v & 255) }
      else { t.write(v & 255); t.write(v >> 8) }
    def u32(v: Int): Unit =
      if (big) { t.write(v >>> 24); t.write((v >> 16) & 255)
        t.write((v >> 8) & 255); t.write(v & 255) }
      else { t.write(v & 255); t.write((v >> 8) & 255)
        t.write((v >> 16) & 255); t.write(v >>> 24) }
    if (badTiff) { t.write('X'); t.write('X') }
    else if (big) { t.write('M'); t.write('M') }
    else { t.write('I'); t.write('I') }
    u16(42); u32(8) // magic, IFD0 offset
    val nEntries = if (hasGps) 3 else 2
    u16(nEntries)
    u16(271); u16(2); u32(4) // Make, ASCII, count 4 → inline
    t.write(make3.charAt(0)); t.write(make3.charAt(1))
    t.write(make3.charAt(2)); t.write(0)
    u16(274); u16(3); u32(1) // Orientation, SHORT, count 1
    // a SHORT value sits LEFT-JUSTIFIED in its 4-byte slot (the
    // classic writer rule the TIFF decoder already pins)
    if (big) { t.write(0); t.write(orient); t.write(0); t.write(0) }
    else { t.write(orient); t.write(0); t.write(0); t.write(0) }
    if (hasGps) {
      val gpsIfd = 8 + 2 + 3 * 12 + 4 // right after IFD0's next ptr
      u16(0x8825); u16(4); u32(1); u32(gpsIfd) // GPSInfo sub-IFD ptr
      u32(0) // IFD0 next-IFD pointer: none
      u16(1) // GPS IFD: one entry
      val dataOff = gpsIfd + 2 + 12 + 4
      u16(2); u16(5); u32(3); u32(dataOff) // GPSLatitude RATIONAL×3
      u32(0) // GPS IFD next pointer
      u32(gpsDeg); u32(1); u32(gpsMin); u32(1) // deg/1, min/1
      u32(gpsSecN); u32(gpsSecD)               // sec as num/den
    } else u32(0) // next-IFD pointer: none
    val tiff = t.toByteArray
    val out = new java.io.ByteArrayOutputStream(base.length + 80)
    out.write(base, 0, 2) // SOI (or the corrupted-magic arm bytes)
    out.write(0xff); out.write(0xe1)
    val len = 2 + 6 + tiff.length
    out.write(len >> 8); out.write(len & 255)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(tiff, 0, tiff.length)
    out.write(base, 2, base.length - 2)
    out.toByteArray
  }

  /** REAL Exif extraction — the metadata pass before pixel decode:
    * marker walk to APP1 ("Exif\\0\\0" payloads only; other
    * APP1s skip like any APPn), a dual-endian TIFF IFD0 walk reading
    * Make (inline ASCII) and Orientation (left-justified SHORT), then
    * onward to the first SOF for dimensions. Never decodes entropy
    * data — the cheap pass that decides rotation before the expensive
    * one. Total on arbitrary bytes: status rows, never throws. */
  private[graft] def parseJpegExif(id: Long, p: Array[Byte]): ExifMeta = {
    def fail(st: String) =
      ExifMeta(id, st, None, None, None, None, None, None, None)
    if (p == null || p.length < 4 ||
        (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return fail("bad_magic")
    var pos = 2
    var exifStatus = "no_exif"
    var bo: Option[String] = None
    var orient: Option[Int] = None
    var make: Option[String] = None
    var nIfd: Option[Int] = None
    var gpsLat: Option[Long] = None
    def parseTiffBlock(t0: Int, tEnd: Int): Unit = {
      val big = t0 + 1 < tEnd && p(t0) == 'M' && p(t0 + 1) == 'M'
      val lit = t0 + 1 < tEnd && p(t0) == 'I' && p(t0 + 1) == 'I'
      def u16(i: Int): Int =
        if (i < t0 || i + 1 >= tEnd) -1
        else if (big) ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
        else (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      def u32(i: Int): Long =
        if (i < t0 || i + 3 >= tEnd) -1L
        else if (big) ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
          ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
        else (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
          ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
      if ((!big && !lit) || u16(t0 + 2) != 42) { exifStatus = "bad_exif"; return }
      val ifd = u32(t0 + 4)
      if (ifd < 0 || t0 + ifd + 2 > tEnd) { exifStatus = "bad_exif"; return }
      val n = u16(t0 + ifd.toInt)
      if (n < 0 || t0 + ifd + 2 + n * 12L > tEnd) {
        exifStatus = "bad_exif"; return
      }
      var e = 0
      while (e < n) {
        val off = t0 + ifd.toInt + 2 + e * 12
        val tag = u16(off); val typ = u16(off + 2); val cnt = u32(off + 4)
        if (tag == 274 && typ == 3 && cnt == 1)
          orient = Some(u16(off + 8))
        if (tag == 271 && typ == 2 && cnt >= 1 && cnt <= 4) {
          // inline ASCII value, NUL-terminated within the 4-byte slot
          val bs = (0 until cnt.toInt)
            .map(j => p(off + 8 + j)).takeWhile(_ != 0)
          make = Some(new String(bs.toArray, "US-ASCII"))
        }
        if (tag == 0x8825 && typ == 4 && cnt == 1) {
          // GPSInfo sub-IFD pointer: chase it, then the latitude
          // entry's RATIONAL×3 value — 24 bytes, so the slot holds an
          // OFFSET (both offsets relative to the TIFF header, the
          // out-of-line rule). A malformed sub-IFD degrades to a
          // missing GPS value, never a throw — the libexif shape.
          val g = u32(off + 8)
          // Mirror the IFD0 guard: the sub-IFD's entry table must fit
          // inside the APP1 payload, else skip the walk entirely (a
          // malformed count could otherwise drive up to 65535 wasted,
          // bounds-checked-but-pointless iterations per document).
          val gn0 = if (g < 0) -1 else u16(t0 + g.toInt)
          val gn =
            if (gn0 < 0 || t0 + g + 2 + gn0 * 12L > tEnd) -1 else gn0
          var ge = 0
          while (ge < gn) {
            val goff = t0 + g.toInt + 2 + ge * 12
            if (u16(goff) == 2 && u16(goff + 2) == 5 &&
                u32(goff + 4) == 3) {
              val d = u32(goff + 8)
              if (d >= 0) {
                val vs = (0 until 6).map(j => u32(t0 + d.toInt + 4 * j))
                if (vs.forall(_ >= 0) && vs(1) > 0 && vs(3) > 0 &&
                    vs(5) > 0)
                  gpsLat = Some(vs(0) * 3600000L / vs(1) +
                    vs(2) * 60000L / vs(3) + vs(4) * 1000L / vs(5))
              }
            }
            ge += 1
          }
        }
        e += 1
      }
      bo = Some(if (big) "MM" else "II")
      nIfd = Some(n)
      exifStatus = "ok"
    }
    try {
      while (true) {
        if (pos + 1 >= p.length) return fail("truncated")
        if ((p(pos) & 0xff) != 0xff) return fail("bad_data")
        var m = p(pos + 1) & 0xff; pos += 2
        while (m == 0xff) { if (pos >= p.length) return fail("truncated")
          m = p(pos) & 0xff; pos += 1 }
        if (m == 0xd9 || m == 0xda) // EOI / SOS before any SOF
          return fail("bad_data")
        if (pos + 1 >= p.length) return fail("truncated")
        val len = ((p(pos) & 0xff) << 8) | (p(pos + 1) & 0xff)
        if (len < 2 || pos + len > p.length) return fail("truncated")
        if (m == 0xe1 && len >= 8 &&
            p(pos + 2) == 'E' && p(pos + 3) == 'x' && p(pos + 4) == 'i' &&
            p(pos + 5) == 'f' && p(pos + 6) == 0 && p(pos + 7) == 0)
          parseTiffBlock(pos + 8, pos + len)
        else if (m >= 0xc0 && m <= 0xc3) {
          // SOF0..SOF3: dims end the metadata pass
          val h0 = ((p(pos + 3) & 0xff) << 8) | (p(pos + 4) & 0xff)
          val w0 = ((p(pos + 5) & 0xff) << 8) | (p(pos + 6) & 0xff)
          return ExifMeta(id, exifStatus, bo, orient, make, nIfd,
            Some(w0), Some(h0), gpsLat)
        }
        pos += len
      }
      fail("truncated") // unreachable
    } catch {
      case _: ArrayIndexOutOfBoundsException => fail("bad_data")
    }
  }

  /** Decode → APPLY Exif orientation — the rotate/flip stage between
    * metadata read and pixel work (q_jpeg_exif only EXTRACTS the tag;
    * real pipelines must act on it before dHash/resize or mirrored
    * shots dodge dedup). The 8 tag values are exact index maps from
    * stored (x, y) to displayed (x', y') (TIFF 6.0 §Orientation /
    * the libexif convention):
    *   1 identity · 2 flip-H · 3 rot180 · 4 flip-V · 5 transpose ·
    *   6 rot90 CW · 7 transverse · 8 rot270 CW (5-8 swap the dims).
    * The transform is fused into the decode's pixel stream via
    * [[JpegPixelSink]] — one pass, no raster buffer, the oriented
    * position-weighted sums folding as pixels arrive. Orientation
    * defaults to 1 when the tag is absent or the TIFF block is
    * unreadable (every viewer's behavior). Total on arbitrary bytes:
    * both underlying walks are. */
  private[graft] def parseJpegOriented(id: Long,
      p: Array[Byte]): JpegOriented = {
    val orient = parseJpegExif(id, p).orientation.getOrElse(1)
    var w0 = 0; var h0 = 0
    var chk = 0L; var row0w = 0L
    val sink = new JpegPixelSink {
      def dims(w: Int, h: Int): Unit = { w0 = w; h0 = h }
      def emit(x: Int, y: Int, r: Int, g: Int, b: Int): Unit = {
        val ox = orient match {
          case 2 | 3 => w0 - 1 - x
          case 5 | 8 => y
          case 6 | 7 => h0 - 1 - y
          case _ => x
        }
        val oy = orient match {
          case 3 | 4 => h0 - 1 - y
          case 5 | 6 => x
          case 7 | 8 => w0 - 1 - x
          case _ => y
        }
        val ow = if (orient >= 5) h0 else w0
        chk += (r + 2L * g + 3L * b) * ((oy.toLong * ow + ox) % 997L)
        if (oy == 0) row0w += (ox + 1L) * (r + g + b)
      }
    }
    val m = parseJpeg(id, p, sink)
    val oriented = m.status == "ok"
    JpegOriented(id, m.status, orient,
      if (orient >= 5) m.height else m.width,
      if (orient >= 5) m.width else m.height,
      if (oriented) Some(chk) else None,
      if (oriented) Some(row0w) else None,
      if (oriented) m.r_sum else None)
  }

  /** Decode → orient → dHash, the full chain real image dedup runs
    * (mirrored/rotated re-uploads normalize to one hash BEFORE the
    * perceptual compare — without the orient step every flipped copy
    * dodges dedup): the raster collects through [[JpegPixelSink]],
    * the Exif tag's INVERSE index map samples the 9×8 dHash grid in
    * ORIENTED coordinates (nearest sample — the [[dhashPpm]] rule),
    * and the 64 horizontal comparisons pack as the usual two 32-bit
    * halves. Raster memory is O(W·H) — the same order the decode
    * itself holds (a progressive file's coefficient store), and what
    * any dHash implementation keeps anyway. */
  private[graft] def jpegOrientedDhash(id: Long,
      p: Array[Byte]): PhashMeta = {
    val orient = parseJpegExif(id, p).orientation.getOrElse(1)
    var w0 = 0; var h0 = 0
    var gray: Array[Int] = null
    val sink = new JpegPixelSink {
      def dims(w: Int, h: Int): Unit = {
        w0 = w; h0 = h; gray = new Array[Int](w * h)
      }
      def emit(x: Int, y: Int, r: Int, g: Int, b: Int): Unit =
        gray(y * w0 + x) = r + g + b
    }
    val m = parseJpeg(id, p, sink)
    if (m.status != "ok") return PhashMeta(id, m.status, None, None)
    val ow = if (orient >= 5) h0 else w0
    val oh = if (orient >= 5) w0 else h0
    def og(ox: Int, oy: Int): Int = {
      val sx = orient match {
        case 2 | 3 => w0 - 1 - ox
        case 5 | 6 => oy
        case 7 | 8 => w0 - 1 - oy
        case _ => ox
      }
      val sy = orient match {
        case 3 | 4 => h0 - 1 - oy
        case 5 | 8 => ox
        case 6 | 7 => h0 - 1 - ox
        case _ => oy
      }
      gray(sy * w0 + sx)
    }
    val gs = Array.tabulate(72)(k => og((k % 9) * ow / 9, (k / 9) * oh / 8))
    var hi = 0L; var lo = 0L
    var k = 0
    while (k < 64) {
      val r = k / 8; val c = k % 8
      if (gs(r * 9 + c) < gs(r * 9 + c + 1)) {
        if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
      }
      k += 1
    }
    PhashMeta(id, "ok", Some(hi), Some(lo))
  }

  /** Optional per-pixel tap on the JPEG decode — `dims` fires once
    * (post-SOF, pre-pixels), then `emit` once per ABSOLUTE (x, y) in
    * decode order. O(1) added state: the consumer folds pixels as
    * they stream (q_jpeg_oriented's position-weighted sums), the
    * raster is never materialized — the same streaming discipline as
    * the decoder's own stats. */
  private[graft] trait JpegPixelSink {
    def dims(w: Int, h: Int): Unit
    def emit(x: Int, y: Int, r: Int, g: Int, b: Int): Unit
  }

  /** REAL from-scratch JPEG decode, baseline (SOF0) AND progressive
    * (SOF2) — see [[JpegMeta]] for the row contract. Total on
    * arbitrary bytes (DecoderFuzzSpec): failure is always a status
    * row, never a throw. Progressive runs the full T.81 Annex G
    * machinery: multi-scan walk, DC first/refinement passes, AC
    * spectral-selection bands with EOBRUN, successive-approximation
    * refinement with correction bits — accumulated in a whole-image
    * zigzag coefficient store and transformed once at EOI (the
    * standard progressive memory cost, bounded here like a production
    * decoder bounds decode memory). Non-8-bit precision reports
    * `unsupported` with the header dims (the libjpeg header-probe
    * behavior); any sampling beyond 4:4:4 / 4:2:0 / grayscale
    * likewise stays out of the decode surface. */
  private[graft] def parseJpeg(id: Long, p: Array[Byte],
      sink: JpegPixelSink = null): JpegMeta = {
    def fail(st: String, w: Option[Int] = None, h: Option[Int] = None) =
      JpegMeta(id, st, w, h, None, None, None, None, None, None, None)
    if (p == null || p.length < 4 ||
        (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return fail("bad_magic")
    try {
      var pos = 2
      def u8(): Int = {
        if (pos >= p.length) throw JpegTrunc
        val v = p(pos) & 0xff; pos += 1; v
      }
      def u16(): Int = { val a = u8(); (a << 8) | u8() }
      val qt = Array.ofDim[Int](4, 64)
      val dcH = new Array[JpegHuff](4)
      val acH = new Array[JpegHuff](4)
      var width = -1; var height = -1
      // per component: id, (qTable, sampling, dcTable, acTable)
      var compId: Array[Int] = null
      var compQ: Array[Int] = null
      var compH: Array[Int] = null
      var compV: Array[Int] = null
      var compDc: Array[Int] = null
      var compAc: Array[Int] = null
      var restartInterval = 0
      var progressive = false
      // geometry, validated at the FIRST SOS (shared by both modes)
      var maxH = 1; var maxV = 1; var mcuW = 8; var mcuH = 8
      var nmx = 0; var nmy = 0
      var compBW: Array[Int] = null
      // progressive whole-image coefficient store (zigzag order)
      var pCoefs: Array[Array[Array[Int]]] = null
      var sawScan = false
      var inScan = false // baseline: the walk stops at its single SOS
      var eoi = false    // progressive: the walk stops at EOI
      def geometry(): Option[JpegMeta] = {
        maxH = compH.max; maxV = compV.max
        mcuW = 8 * maxH; mcuH = 8 * maxV
        if (width <= 0 || height <= 0 ||
            width % mcuW != 0 || height % mcuH != 0)
          return Some(fail("unsupported", Some(width), Some(height)))
        nmx = width / mcuW; nmy = height / mcuH
        val nc = compQ.length
        compBW = Array.tabulate(nc)(c => nmx * compH(c))
        if (progressive) {
          // every coefficient is held until EOI — bound the buffer
          // the way a production decoder bounds per-image memory
          var tot = 0L
          var c = 0
          while (c < nc) {
            tot += compBW(c).toLong * (nmy * compV(c)); c += 1
          }
          if (tot > (1L << 16))
            return Some(fail("unsupported", Some(width), Some(height)))
          pCoefs = Array.tabulate(nc)(c =>
            Array.ofDim[Int](compBW(c) * nmy * compV(c), 64))
        }
        None
      }
      /** One progressive scan (T.81 G.1.2): `scomp` are component
        * indexes in scan order; `sDc`/`sAc` the scan's table ids. */
      def decodeProgScan(scomp: Array[Int], sDc: Array[Int],
          sAc: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
        if (ss > se || se > 63 || al > 13) throw JpegBad
        if (ss == 0 && se != 0) throw JpegBad // DC scans carry DC only
        if (ss > 0 && scomp.length != 1) throw JpegBad
        val br = new JpegBitReader(p, pos)
        val pred = new Array[Int](compQ.length)
        var eobrun = 0
        var unit = 0 // MCUs (interleaved) or blocks (single component)
        def maybeRestart(): Unit =
          if (restartInterval > 0 && unit > 0 &&
              unit % restartInterval == 0) {
            val m = br.restart()
            if (m != (unit / restartInterval - 1) % 8) throw JpegBad
            java.util.Arrays.fill(pred, 0); eobrun = 0
          }
        def dcBlock(c: Int, huff: JpegHuff, arr: Array[Int]): Unit =
          if (ah == 0) {
            val t = huff.decode(br)
            pred(c) += jpegExtend(br.bits(t), t)
            arr(0) = pred(c) << al
          } else if (br.bit() == 1) arr(0) |= (1 << al) // raw-bit refine
        def acFirst(huff: JpegHuff, arr: Array[Int]): Unit = {
          if (eobrun > 0) { eobrun -= 1; return }
          var k = ss
          while (k <= se) {
            val rs = huff.decode(br)
            val r = rs >> 4; val s = rs & 15
            if (s != 0) {
              k += r
              if (k > se) throw JpegBad
              arr(k) = jpegExtend(br.bits(s), s) << al
              k += 1
            } else if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.bits(r)
              return // this block's tail is the run's first member
            }
          }
        }
        def acRefine(huff: JpegHuff, arr: Array[Int]): Unit = {
          val p1 = 1 << al; val m1 = -1 << al
          var k = ss
          def correct(kk: Int): Unit =
            if (br.bit() == 1 && (arr(kk) & p1) == 0)
              arr(kk) += (if (arr(kk) >= 0) p1 else m1)
          if (eobrun == 0) {
            var brk = false
            while (!brk && k <= se) {
              val rs = huff.decode(br)
              var r = rs >> 4; val s = rs & 15
              var newval = 0
              if (s != 0) {
                if (s != 1) throw JpegBad // refinement codes ±1 only
                newval = if (br.bit() == 1) p1 else m1
              } else if (r != 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += br.bits(r)
                brk = true
              }
              if (!brk) {
                // advance over r zero-HISTORY slots, reading one
                // correction bit at every nonzero-history slot passed
                var adv = true
                while (adv && k <= se) {
                  if (arr(k) != 0) { correct(k); k += 1 }
                  else {
                    r -= 1
                    if (r < 0) adv = false else k += 1
                  }
                }
                if (s != 0) {
                  if (adv || k > se) throw JpegBad
                  arr(k) = newval
                }
                k += 1
              }
            }
          }
          if (eobrun > 0) { // EOB sweep: corrections only
            while (k <= se) { if (arr(k) != 0) correct(k); k += 1 }
            eobrun -= 1
          }
        }
        def block(c: Int, dh: JpegHuff, ach: JpegHuff, idx: Int): Unit = {
          val arr = pCoefs(c)(idx)
          if (ss == 0) dcBlock(c, dh, arr)
          else if (ah == 0) acFirst(ach, arr)
          else acRefine(ach, arr)
        }
        if (scomp.length == 1) { // non-interleaved: component raster
          val c = scomp(0)
          val dh = if (ss == 0 && ah == 0) dcH(sDc(0)) else null
          val ach = if (ss > 0) acH(sAc(0)) else null
          if ((ss == 0 && ah == 0 && dh == null) ||
              (ss > 0 && ach == null)) throw JpegBad
          val n = compBW(c) * (nmy * compV(c))
          var bi = 0
          while (bi < n) {
            maybeRestart()
            block(c, dh, ach, bi)
            unit += 1; bi += 1
          }
        } else { // interleaved (DC scans): MCU order
          val dhs = Array.tabulate(scomp.length)(i =>
            if (ah == 0) dcH(sDc(i)) else null)
          if (ah == 0 && dhs.exists(_ == null)) throw JpegBad
          var my = 0
          while (my < nmy) {
            var mx = 0
            while (mx < nmx) {
              maybeRestart()
              var i = 0
              while (i < scomp.length) {
                val c = scomp(i)
                var by = 0
                while (by < compV(c)) {
                  var bx = 0
                  while (bx < compH(c)) {
                    block(c, dhs(i), null,
                      (my * compV(c) + by) * compBW(c) +
                        (mx * compH(c) + bx))
                    bx += 1
                  }
                  by += 1
                }
                i += 1
              }
              unit += 1
              mx += 1
            }
            my += 1
          }
        }
        pos = br.pos
      }
      while (!inScan && !eoi) {
        if (u8() != 0xff) throw JpegBad
        var m = u8()
        while (m == 0xff) m = u8() // fill bytes are legal
        m match {
          case 0xd9 => // EOI: ends a progressive file, else premature
            if (progressive && sawScan) eoi = true else throw JpegBad
          case 0xdb =>
            val len = u16() // read BEFORE pos is captured for `end`
            val end = pos + len - 2
            if (end > p.length) throw JpegTrunc
            while (pos < end) {
              val pqtq = u8()
              if ((pqtq >> 4) != 0) throw JpegBad // 16-bit tables: out of scope
              val tq = pqtq & 15
              var k = 0
              while (k < 64) { qt(tq)(k) = u8(); k += 1 }
            }
          case 0xc4 =>
            val len = u16()
            val end = pos + len - 2
            if (end > p.length) throw JpegTrunc
            while (pos < end) {
              val tcth = u8()
              val bits = new Array[Int](17)
              var n = 0
              var l = 1
              while (l <= 16) { bits(l) = u8(); n += bits(l); l += 1 }
              val vals = Array.fill(n)(u8())
              val hd = new JpegHuff(bits, vals)
              if ((tcth >> 4) == 0) dcH(tcth & 15) = hd
              else acH(tcth & 15) = hd
            }
          case 0xc0 | 0xc2 =>
            val len = u16()
            val end = pos + len - 2
            val prec = u8()
            height = u16(); width = u16()
            val nc = u8()
            progressive = m == 0xc2
            if (prec != 8) // 12-bit extended DCT: out of the surface
              return fail("unsupported", Some(width), Some(height))
            if (nc != 1 && nc != 3) throw JpegBad
            compId = new Array[Int](nc); compQ = new Array[Int](nc)
            compH = new Array[Int](nc); compV = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compId(c) = u8()
              val hv = u8()
              compH(c) = (hv >> 4) & 15; compV(c) = hv & 15
              // decode surface: 1×1 everywhere (4:4:4 / grayscale),
              // Y at 2×2 (4:2:0), or Y at 2×1 (4:2:2) — the nearest
              // (floor-map) upsampler handles any of these grids
              if (!((compH(c) == 1 && compV(c) == 1) ||
                  (c == 0 && compH(c) == 2 &&
                    (compV(c) == 2 || compV(c) == 1))))
                return fail("unsupported", Some(width), Some(height))
              compQ(c) = u8() & 3
              c += 1
            }
            if (pos != end) throw JpegBad
          case 0xda =>
            u16()
            val ns = u8()
            if (width < 0 || compQ == null) throw JpegBad
            if (!progressive) {
              if (ns != compQ.length) throw JpegBad
              compDc = new Array[Int](ns); compAc = new Array[Int](ns)
              var c = 0
              while (c < ns) {
                u8() // component selector (positional order)
                val t = u8()
                compDc(c) = (t >> 4) & 3; compAc(c) = t & 3
                c += 1
              }
              u8(); u8(); u8() // Ss, Se, Ah/Al — baseline fixed
              geometry() match {
                case Some(r) => return r
                case None =>
              }
              inScan = true
            } else {
              if (ns < 1 || ns > compQ.length) throw JpegBad
              val scomp = new Array[Int](ns)
              val sDc = new Array[Int](ns); val sAc = new Array[Int](ns)
              var i = 0
              while (i < ns) {
                val ci = compId.indexOf(u8()) // selector is an id
                if (ci < 0) throw JpegBad
                scomp(i) = ci
                val t = u8(); sDc(i) = (t >> 4) & 3; sAc(i) = t & 3
                i += 1
              }
              val ss = u8(); val se = u8()
              val ahal = u8()
              if (!sawScan) geometry() match {
                case Some(r) => return r
                case None =>
              }
              decodeProgScan(scomp, sDc, sAc, ss, se,
                (ahal >> 4) & 15, ahal & 15)
              sawScan = true
            }
          case 0xdd => // DRI: restart interval in MCUs
            if (u16() != 4) throw JpegBad
            restartInterval = u16()
          case x if x >= 0xd0 && x <= 0xd7 => throw JpegBad // stray RSTn
          case _ => // APPn / COM / anything length-framed: skip
            val len = u16()
            if (len < 2 || pos + len - 2 > p.length) throw JpegTrunc
            pos += len - 2
        }
      }
      val nc = compQ.length
      val coef = new Array[Int](64) // natural order, one block at a time
      // per-comp block buffers for ONE MCU: compV(c)·compH(c) blocks
      val blocks = Array.tabulate(nc)(c =>
        Array.ofDim[Int](compV(c) * compH(c), 64))
      var rSum = 0L; var gSum = 0L; var bSum = 0L; var row0 = 0L
      var pxMin = 255; var pxMax = 0
      var nBlocks = 0
      /** Fixed-point IDCT + level shift + clamp of `coef` into `out`. */
      def idctInto(out: Array[Int]): Unit = {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0L
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                val sv = coef(v * 8 + u)
                if (sv != 0)
                  acc += sv * jpegIdctT(x)(u) * jpegIdctT(y)(v)
                u += 1
              }
              v += 1
            }
            val px = (((acc + (1L << 27)) >> 28) + 128L).toInt
            out(y * 8 + x) =
              if (px < 0) 0 else if (px > 255) 255 else px
            x += 1
          }
          y += 1
        }
      }
      // combine one MCU's blocks into RGB with per-component nearest
      // (floor-map) upsampling — sample (x,y) of comp c sits at
      // (x·h/maxH, y·v/maxV) of its block grid
      def sample(c: Int, x: Int, y: Int): Int = {
        val sx = x * compH(c) / maxH; val sy = y * compV(c) / maxV
        blocks(c)((sy / 8) * compH(c) + (sx / 8))((sy % 8) * 8 + (sx % 8))
      }
      def emitMcu(mx: Int, my: Int): Unit = {
        var y = 0
        while (y < mcuH) {
          var x = 0
          while (x < mcuW) {
            val yv = sample(0, x, y)
            val (r, g, bb) =
              if (nc == 1) jpegYcc2Rgb(yv, 128, 128)
              else jpegYcc2Rgb(yv, sample(1, x, y), sample(2, x, y))
            rSum += r; gSum += g; bSum += bb
            val mn = math.min(r, math.min(g, bb))
            val mxv = math.max(r, math.max(g, bb))
            if (mn < pxMin) pxMin = mn
            if (mxv > pxMax) pxMax = mxv
            if (my == 0 && y == 0) row0 += r + g + bb
            if (sink != null)
              sink.emit(mx * mcuW + x, my * mcuH + y, r, g, bb)
            x += 1
          }
          y += 1
        }
      }
      if (sink != null) sink.dims(width, height)
      if (!eoi) {
        // BASELINE: stream the single scan MCU by MCU
        val br = new JpegBitReader(p, pos)
        val pred = new Array[Int](nc)
        var mcuIdx = 0
        var my = 0
        while (my < nmy) {
          var mx = 0
          while (mx < nmx) {
            // restart boundary BEFORE this MCU (T.81 E.2.4): byte
            // realign, consume RSTm, verify the modulo-8 sequence,
            // reset every DC predictor
            if (restartInterval > 0 && mcuIdx > 0 &&
                mcuIdx % restartInterval == 0) {
              val m = br.restart()
              if (m != (mcuIdx / restartInterval - 1) % 8) throw JpegBad
              java.util.Arrays.fill(pred, 0)
            }
            var c = 0
            while (c < nc) {
              var bIdx = 0
              while (bIdx < compV(c) * compH(c)) {
                java.util.Arrays.fill(coef, 0)
                val q = qt(compQ(c))
                val t = dcH(compDc(c)).decode(br)
                pred(c) += jpegExtend(br.bits(t), t)
                coef(0) = pred(c) * q(0)
                var k = 1
                var eob = false
                while (!eob && k <= 63) {
                  val rs = acH(compAc(c)).decode(br)
                  if (rs == 0) eob = true
                  else if (rs == 0xF0) k += 16
                  else {
                    k += (rs >> 4)
                    if (k > 63) throw JpegBad
                    coef(JpegZigzag(k)) =
                      jpegExtend(br.bits(rs & 15), rs & 15) * q(k)
                    k += 1
                  }
                }
                idctInto(blocks(c)(bIdx))
                nBlocks += 1
                bIdx += 1
              }
              c += 1
            }
            emitMcu(mx, my)
            mcuIdx += 1
            mx += 1
          }
          my += 1
        }
        // a well-formed stream ends with EOI right after the (padded)
        // entropy segment — its absence is a truncation
        if (br.pos + 1 >= p.length || (p(br.pos) & 0xff) != 0xff ||
            (p(br.pos + 1) & 0xff) != 0xd9)
          return fail("truncated", Some(width), Some(height))
      } else {
        // PROGRESSIVE: dequantize the accumulated store → IDCT → emit
        var my = 0
        while (my < nmy) {
          var mx = 0
          while (mx < nmx) {
            var c = 0
            while (c < nc) {
              var by = 0
              while (by < compV(c)) {
                var bx = 0
                while (bx < compH(c)) {
                  val src = pCoefs(c)(
                    (my * compV(c) + by) * compBW(c) + (mx * compH(c) + bx))
                  java.util.Arrays.fill(coef, 0)
                  val q = qt(compQ(c))
                  var k = 0
                  while (k < 64) {
                    val v = src(k)
                    if (v != 0) coef(JpegZigzag(k)) = v * q(k)
                    k += 1
                  }
                  idctInto(blocks(c)(by * compH(c) + bx))
                  nBlocks += 1
                  bx += 1
                }
                by += 1
              }
              c += 1
            }
            emitMcu(mx, my)
            mx += 1
          }
          my += 1
        }
      }
      JpegMeta(id, "ok", Some(width), Some(height), Some(nBlocks),
        Some(rSum), Some(gSum), Some(bSum), Some(pxMin), Some(pxMax),
        Some(row0))
    } catch {
      case JpegTrunc => fail("truncated",
        if (pDims(p)._1 > 0) Some(pDims(p)._1) else None,
        if (pDims(p)._2 > 0) Some(pDims(p)._2) else None)
      case JpegBad => fail("bad_data")
      case _: ArrayIndexOutOfBoundsException => fail("bad_data")
    }
  }

  /** Best-effort dims re-probe for the truncation row: a cheap
    * side-effect-free SOF scan (a truncated file's header is usually
    * intact — report what a header probe knows, the libjpeg shape). */
  private def pDims(p: Array[Byte]): (Int, Int) = {
    var pos = 2
    while (pos + 9 < p.length) {
      if ((p(pos) & 0xff) == 0xff) {
        val m = p(pos + 1) & 0xff
        if (m == 0xc0 || m == 0xc2) {
          val h = ((p(pos + 5) & 0xff) << 8) | (p(pos + 6) & 0xff)
          val w = ((p(pos + 7) & 0xff) << 8) | (p(pos + 8) & 0xff)
          return (w, h)
        }
        if (m >= 0xc0 && m != 0xff && m != 0xd8 && m != 0x01 &&
            !(m >= 0xd0 && m <= 0xd9)) {
          val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
          pos += 2 + len
        } else pos += 2
      } else pos += 1
    }
    (-1, -1)
  }

  /** The typed JPEG decode stage — scan-fused like every decoder. */
  def decodeJpeg(ds: Dataset[BinaryDoc]): Dataset[JpegMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(d => parseJpeg(d.doc_id, d.payload)))
  }

  /** Frame-taking synthesize→extract chain for the PDF row — the
    * [[jpegDecodeStats]] shape, shared by the registered query and
    * ScaleProbe's pdf_{1,10,100}x replication harness. */
  def pdfExtractStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, h) => parsePdf(id, pdfBytes(h)) })
      .toDF()
  }

  /** Frame-taking synthesize→decode chain for the zstd transport —
    * the [[pdfExtractStats]] shape, shared by the registered query,
    * the streamed parity spec, and ScaleProbe. Unlike the md5-only
    * fixtures this one carries the TEXT into the synthesizer (the
    * frame content is the doc itself), still one scan-fused map. */
  /** Fixture `.jsonl.zst` blob for a (text, md5) pair — the
    * [[graft.llm.Zstd.zstdJsonlBytes]] synthesizer exposed at graft
    * scope so the streaming spec can feed the streamed front door
    * the exact transport bytes the batch query reads. */
  private[graft] def zstdJsonlBlob(text: String, h: String): Array[Byte] =
    Zstd.zstdJsonlBytes(text, h)

  /** The general-purpose compressor exposed at graft scope (the
    * ScaleProbe ratio leg). */
  private[graft] def zstdCompressBytes(b: Array[Byte]): Array[Byte] =
    Zstd.compress(b)

  // ---------------------------------------------------------------------
  // DICTIONARY TRAINING — the build side of the RFC 8878 §5 support:
  // real pipelines compress small-doc corpora with dictionaries
  // TRAINED on the corpus (`zstd --train`), so the engine must be able
  // to produce one, not just consume one. The trainer here is the
  // frequency-cover shape (the idea under zstd's cover/fastcover
  // algorithms, Collet's public design notes): the corpus's most
  // frequent k-grams become the dictionary content, ordered most
  // frequent LAST so the hottest bytes sit nearest the window edge
  // where back-reference offsets are cheapest.
  // ---------------------------------------------------------------------

  /** Top-16 8-byte grams by (count desc, gram asc) — the dictionary
    * candidate census. Scale shape: one corpus scan with the gram
    * explode fused into it, ONE gram-keyed partial+final aggregate,
    * TakeOrdered(16) — the wordcount shape, safe at any corpus size;
    * the result is an absolutely bounded 16-row frame. */
  private[graft] def zstdDictGrams(docs: DataFrame): DataFrame =
    docs
      .select(explode(expr(
        "case when length(text) >= 8 then transform(" +
          "sequence(1, length(text) - 7), i -> substring(text, i, 8)) " +
          "else array() end")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(16)

  /** The PERSISTED trained dictionary — the 14th IndexStore artifact:
    * one row holding the dictionary identity (dict_id, gram count,
    * content length, content md5) plus the full §5 dictionary bytes
    * as hex (magic, entropy tables, repeat offsets, content — built
    * with [[Zstd.buildDict]], parseable by [[Zstd.parseDict]] and by
    * the reference CLI). The ≤16-row collect is bounded driver
    * metadata (the DSIR ≤64-row precedent). q_zstd_dict_train stays
    * the fresh-train oracle; q_index_persist censuses this stored
    * copy each round, so train → publish → load stays content-exact
    * like every artifact. */
  private[graft] val ZstdDictId = 7002L
  private[graft] def zstdDictDurable(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    IndexStore.durableFrame(s, dir, "zstd_dict") {
      import s.implicits._
      val grams = zstdDictGrams(Tables(s, dir, "documents"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // most frequent LAST: ascending count, gram as the tiebreak
      val content = grams.sortBy { case (g, c) => (c, g) }
        .map(_._1).mkString
      // UTF-8 on BOTH hashes: Spark's md5() and DuckDB's md5() hash
      // UTF-8 bytes, so the artifact's identity must too (ISO-8859-1
      // would silently diverge on the first non-ASCII gram); content
      // bytes in the dictionary are the same UTF-8 rendering, and
      // content_len records BYTES
      require(grams.nonEmpty, "dictionary training needs at least " +
        "one 8-char gram in the corpus (every doc shorter than 8?)")
      val contentB = content.getBytes("UTF-8")
      val dict = Zstd.buildDict(ZstdDictId, contentB)
      val md5 = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]): String =
        b.map(x => f"${x & 0xff}%02x").mkString
      Seq((ZstdDictId, grams.length.toLong, contentB.length.toLong,
        hex(md5.digest(contentB)),
        hex(dict)))
        .toDF("dict_id", "n_grams", "content_len", "content_md5",
          "dict_hex")
    }

  def zstdIngestStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, h) =>
        Zstd.parseZstd(id, Zstd.zstdBytes(text, h))
      })
      .toDF()
  }

  /** Frame-taking synthesize→decode chain — the [[pngDecodeStats]]
    * shape, shared by the registered query and ScaleProbe. */
  def jpegDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val payloads = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, h) => BinaryDoc(id, jpegBytes(h)) })
    decodeJpeg(payloads).toDF()
  }

  /** Synthesize a REAL `.tar.gz` from a doc's md5: the ustar archive
    * from [[tarBytes]] (its arms intact — the two layers compose)
    * wrapped in an RFC 1952 member with genuine CRC-32 and ISIZE over
    * the INNER archive bytes. Outer arms live on md5 bytes the tar
    * synth leaves free: gzip magic corrupted (b8 % 16 == 5 → one
    * `gzip_bad_magic` row, the wrapper never opens), gzip CRC-32
    * corrupted (b9 % 16 == 7 → `gzip_bad_data` — the body inflates
    * cleanly and only the footer check catches it), stored- vs
    * fixed-Huffman DEFLATE (b10 % 2, both through the shared
    * encoders). */
  private[graft] def tgzBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val inner = tarBytes(h)
    val badMagic = b(8) % 16 == 5
    val badCrc = b(9) % 16 == 7
    val fixedHuff = b(10) % 2 == 1
    val out = new java.io.ByteArrayOutputStream(inner.length + 32)
    out.write(if (badMagic) 0x2f else 0x1f); out.write(0x8b)
    out.write(8) // CM = deflate
    out.write(0) // FLG = 0: tarball producers rarely set name fields
    out.write(b(3)); out.write(b(4)); out.write(b(5)); out.write(b(6))
    out.write(0); out.write(255) // XFL, OS = unknown
    val defl = if (fixedHuff) deflateFixed(inner) else deflateStored(inner)
    out.write(defl, 0, defl.length)
    val crc = crc32Png(inner)
    def le32(v: Int): Unit = {
      out.write(v & 255); out.write((v >>> 8) & 255)
      out.write((v >>> 16) & 255); out.write((v >>> 24) & 255)
    }
    le32(if (badCrc) crc ^ 0x330000 else crc)
    le32(inner.length)
    out.toByteArray
  }

  /** The layered `.tar.gz` walk — decompress-then-walk, the exact
    * order a corpus consumer runs (tar never sees compressed bytes).
    * A gzip-layer failure is ONE `member = -1` row carrying the gzip
    * status behind a `gzip_` prefix, so the census can attribute the
    * loss to the transport layer vs the container layer; a healthy
    * wrapper hands the inflated bytes to the UNCHANGED [[parseTar]].
    * Total on arbitrary bytes (DecoderFuzzSpec) because both layers
    * are. */
  private[graft] def parseTgz(id: Long, p: Array[Byte]): Seq[TarMember] =
    gunzip(p) match {
      case (st, _, None) =>
        Seq(TarMember(id, -1, "gzip_" + st, None, None, None, None))
      case (_, _, Some(raw)) => parseTar(id, raw)
    }

  /** The typed 1→N `.tar.gz` ingest stage — same scan-fused flatMap
    * shape as [[decodeTar]]; the inflate runs inside the same task as
    * the walk, so the uncompressed archive never crosses a shuffle. */
  def decodeTgz(ds: Dataset[BinaryDoc]): Dataset[TarMember] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap(d => parseTgz(d.doc_id, d.payload))
    }
  }

  // ---------------------------------------------------------------------
  // HTML text extraction — the crawl stage BETWEEN the WARC record and
  // the text pipeline (trafilatura/jusText's job): strip markup with a
  // real tag/script/comment state machine, decode entities, cut text
  // into block-level chunks, and drop boilerplate blocks (title, nav
  // links, footers) by the short-block rule, keeping the main content.
  // The synthesized pages are genuine HTML (doctype, head/title,
  // scripts whose bodies contain tags, comments containing tags, nav
  // anchors with attributes, the doc's text split across two <p>
  // blocks, footer) so a hash-green kept text proves the walk really
  // skipped script/comment content and reassembled the content blocks.
  // ---------------------------------------------------------------------

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Synthesize a REAL HTML page around a doc's text, md5-driven:
    * title + nav + footer boilerplate (all < 5 words — the filter's
    * prey), the text split at the token midpoint across two <p>
    * blocks inside the main div, a `<script>` whose BODY contains
    * `<p>` (~25% — the tag walk must not resurface it), an HTML
    * comment containing tags (~25% — same), a plain-text payload
    * with no markup at all (~12.5% — the dispatch arm), and a page
    * cut mid-footer with every close tag missing (~12.5% →
    * `truncated`, kept text unaffected because the footer is
    * boilerplate anyway — the arm isolates STATUS, not content). */
  private[graft] def htmlOf(text: String, h: String): String = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    // Plain-text arm PRECONDITION: the doc text must not contain '<'
    // — parseHtml dispatches on that char, so a '<' here would route
    // a "plain" payload into the tag walk and diverge from the twin
    // (which branches on the md5 arm alone). The fixture corpus is
    // alphanumeric+space text, so the precondition holds; a real
    // crawler resolves this with the Content-Type header, which this
    // synthesized corpus doesn't model.
    if (b(8) % 8 == 3) return text // plain-text payload, no markup
    val trunc = b(12) % 8 == 7
    val hasScript = b(9) % 4 == 1
    val hasComment = b(10) % 4 == 2
    // Markup arm: escape '&' then '<' when embedding — parseHtml's
    // entity decode maps them back, so extraction round-trips to the
    // verbatim doc text even if it carries markup chars, and the
    // pass-through oracle twins stay correct with no precondition.
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    val toks = text.split(" ").filter(_.nonEmpty)
    val n1 = (toks.length + 1) / 2
    val p1 = esc(toks.take(n1).mkString(" "))
    val p2 = esc(toks.drop(n1).mkString(" "))
    val sb = new StringBuilder(text.length + 256)
    sb ++= "<!DOCTYPE html><html><head><title>First &amp; Title</title>"
    if (hasScript) sb ++= "<script>var x = 'not <p> text';</script>"
    sb ++= "</head><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>"
    if (hasComment) sb ++= "<!-- hidden <p>comment</p> -->"
    sb ++= "<div class=\"main\"><p>" + p1 + "</p><p>" + p2 + "</p></div>"
    if (trunc) sb ++= "<footer>Copyright 20"
    else sb ++= "<footer>Copyright 2026 corp</footer></body></html>"
    sb.toString
  }

  /** Block-level elements: opening OR closing one flushes the current
    * text block. Inline elements (a, b, i, span, em, …) do not — nav
    * anchor texts join into one block, exactly what the boilerplate
    * filter needs to see. */
  private val HtmlBlockTags = Set("p", "div", "nav", "footer", "title",
    "head", "body", "html", "article", "section", "li", "ul", "ol",
    "table", "tr", "td", "br", "h1", "h2", "h3", "h4", "h5", "h6",
    "!doctype")

  /** REAL from-scratch HTML text extraction: a character state machine
    * over TEXT / TAG / SCRIPT / STYLE / COMMENT (script and style
    * bodies skipped to their close tag — markup inside them must
    * never resurface as text; comments skipped to `-->`), a named-
    * entity subset decoded in text, text cut into blocks at block-
    * level tag boundaries with whitespace normalized, then the
    * boilerplate filter: blocks under 5 words (titles, nav link rows,
    * footers) drop, the survivors rejoin as the page's content.
    * Total on arbitrary strings: EOF inside any construct degrades to
    * `truncated` with everything collected so far; a payload with no
    * markup routes around the walk as `no_markup`. */
  private[graft] def parseHtml(id: Long, s: String): HtmlExtract = {
    if (s == null || !s.contains('<')) {
      val t = if (s == null) ""
        else s.split("\\s+").filter(_.nonEmpty).mkString(" ")
      val nb = if (t.nonEmpty) 1 else 0
      val keep = nb == 1 && t.split(' ').length >= 5
      return HtmlExtract(id, "no_markup", nb, if (keep) 1 else 0, 0,
        if (keep) Some(md5hex(t)) else None)
    }
    val blocks = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var nScript = 0
    var sawHtmlClose = false
    var truncated = false
    def flush(): Unit = {
      val t = cur.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
      if (t.nonEmpty) blocks += t
      cur.clear()
    }
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          if (e < 0) { truncated = true; i = n } else i = e + 3
        } else {
          val e = s.indexOf('>', i + 1)
          if (e < 0) { truncated = true; i = n }
          else {
            val inner = s.substring(i + 1, e)
            val isClose = inner.startsWith("/")
            val name = (if (isClose) inner.substring(1) else inner)
              .takeWhile(ch => !ch.isWhitespace && ch != '/')
              .toLowerCase(java.util.Locale.ROOT)
            if (HtmlBlockTags.contains(name)) flush()
            if (isClose && name == "html") sawHtmlClose = true
            i = e + 1
            if (!isClose && (name == "script" || name == "style")) {
              if (name == "script") nScript += 1
              // close-tag search is CASE-INSENSITIVE (</SCRIPT> is
              // legal HTML) — a case-sensitive scan would mark real
              // pages truncated and drop their tail
              val close = "</" + name
              var se = -1
              var j = i
              while (se < 0 && j <= n - close.length) {
                if (s.regionMatches(true, j, close, 0, close.length)) se = j
                else j += 1
              }
              if (se < 0) { truncated = true; i = n }
              else {
                val se2 = s.indexOf('>', se + close.length)
                if (se2 < 0) { truncated = true; i = n } else i = se2 + 1
              }
            }
          }
        }
      } else if (c == '&') {
        val ent = Seq("&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>',
          "&quot;" -> '"', "&#39;" -> '\'', "&nbsp;" -> ' ')
          .find { case (e, _) => s.startsWith(e, i) }
        ent match {
          case Some((e, ch)) => cur += ch; i += e.length
          case None => cur += '&'; i += 1
        }
      } else { cur += c; i += 1 }
    }
    flush()
    val kept = blocks.filter(_.split(' ').length >= 5)
    HtmlExtract(id,
      if (truncated || !sawHtmlClose) "truncated" else "ok",
      blocks.length, kept.length, nScript,
      if (kept.isEmpty) None else Some(md5hex(kept.mkString(" "))))
  }

  /** The typed extraction stage — scan-fused like every decode. */
  def extractHtml(ds: Dataset[(Long, String)]): Dataset[HtmlExtract] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { case (id, page) => parseHtml(id, page) })
  }

  // ---------------------------------------------------------------------
  // VIDEO as a frame stream (netpbm ppm_pipe — ffmpeg image2pipe's
  // rawvideo-adjacent format IS concatenated P6 frames): the
  // frame-SAMPLING op a multimodal pipeline runs before feature
  // extraction. The walk reuses the single-image [[ppmHeader]] per
  // frame — one parser, two containers.
  // ---------------------------------------------------------------------

  /** Synthesize a REAL ppm_pipe stream from a doc's md5: F ∈ 2..9
    * genuine P6 frames back to back, per-frame dimensions from the
    * md5 bytes (w_f = 1 + b[(f+1)%16] % 4 etc. — dimensions CHANGE
    * mid-stream, so the sampler must re-parse every header), raster
    * byte j of frame f = b[(f+j)%16]. Arms (mutually exclusive):
    * frame 1's magic corrupted (~6% → the walk stops with a
    * `bad_magic` row mid-stream, frame 0 already emitted), or the
    * LAST frame's raster cut 2 bytes short (~12.5% → its `truncated`
    * row closes the stream). */
  private[graft] def videoBytes(h: String): Array[Byte] = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val fCnt = 2 + b(0) % 8
    val badmid = b(13) % 16 == 4
    val trunc = !badmid && b(14) % 8 == 3
    val out = new java.io.ByteArrayOutputStream(512)
    for (f <- 0 until fCnt) {
      val w = 1 + b((f + 1) % 16) % 4
      val hh = 1 + b((f + 2) % 16) % 4
      val magic = if (badmid && f == 1) "X6" else "P6"
      out.write(s"$magic\n$w $hh\n255\n".getBytes("US-ASCII"))
      val need = w * hh * 3
      val cut = if (trunc && f == fCnt - 1) 2 else 0
      var j = 0
      while (j < need - cut) { out.write(b((f + j) % 16)); j += 1 }
    }
    out.toByteArray
  }

  /** REAL frame-sampling walk: parse each frame's header with the
    * SHARED [[ppmHeader]], hop the raster, keep every k-th frame with
    * exact per-channel sums. A failed frame emits its status row and
    * STOPS — ppm_pipe is positional, and guessing a resync point
    * would attribute one frame's bytes to another. Total on arbitrary
    * bytes (DecoderFuzzSpec): failure is a row, never a throw, and
    * every iteration either stops or advances past a non-empty
    * raster. */
  private[graft] def sampleVideo(id: Long, p: Array[Byte],
      k: Int = 2): Seq[VideoFrame] = {
    if (p == null || p.isEmpty)
      return Seq(VideoFrame(id, 0, "bad_magic", None, None, None, None, None))
    val out = scala.collection.mutable.ArrayBuffer[VideoFrame]()
    var pos = 0
    var f = 0
    while (pos < p.length) {
      val slice = java.util.Arrays.copyOfRange(p, pos, p.length)
      val (st, w, hh, _, off) = ppmHeader(slice)
      if (st != "ok") {
        out += VideoFrame(id, f, st,
          if (w > 0) Some(w) else None, if (hh > 0) Some(hh) else None,
          None, None, None)
        return out.toSeq
      }
      val need = (w.toLong * hh * 3).toInt // fits: ppmHeader bounded it
      if (f % k == 0) {
        var rs = 0L; var gs = 0L; var bs = 0L
        var j = 0
        while (j < need) {
          val v = slice(off + j) & 0xff
          (j % 3: @annotation.switch) match {
            case 0 => rs += v
            case 1 => gs += v
            case _ => bs += v
          }
          j += 1
        }
        out += VideoFrame(id, f, "ok", Some(w), Some(hh),
          Some(rs), Some(gs), Some(bs))
      }
      pos += off + need
      f += 1
    }
    out.toSeq
  }

  /** The typed 1→N frame-sampling stage over [[sampleVideo]] — the
    * [[decodeZip]] shape: flatMap fused into the scan. */
  def decodeVideo(ds: Dataset[BinaryDoc], k: Int = 2): Dataset[VideoFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decode-buffer allocation would go here
      rows.flatMap(d => sampleVideo(d.doc_id, d.payload, k))
    }
  }

  /** The frame-taking WARC ingest funnel over any (doc_id, text) frame
    * — shared by the registered query and the ScaleProbe replication
    * harness. One scan, fused synthesize+decode MapPartitions, the URL
    * canonicalizer as codegen'd projections, a single 1-row aggregate,
    * a 4-row long-form explode; no join anywhere. */
  def warcFunnel(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val metas = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, h) =>
        parseWarc(id, warcBytes(h))
      }).toDF()
    // canonicalize unconditionally: url is NULL on failed decodes, so
    // canon is NULL and the conditional count-distinct ignores it
    val canon = Dedup.canonicalizeUrl(metas)
    val pass = col("status") === "ok" && col("body_bytes") >= 132
    canon.agg(
        count(lit(1)).as("fetched"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("decoded"),
        sum(when(pass, 1L).otherwise(0L)).as("min_length"),
        countDistinct(when(pass, col("canon"))).as("unique_url"))
      .select(explode(array(
        struct(lit(1).as("stage_no"), lit("fetched").as("stage"),
          col("fetched").as("n_docs")),
        struct(lit(2).as("stage_no"), lit("decoded").as("stage"),
          col("decoded").as("n_docs")),
        struct(lit(3).as("stage_no"), lit("min_length").as("stage"),
          col("min_length").as("n_docs")),
        struct(lit(4).as("stage_no"), lit("unique_url").as("stage"),
          col("unique_url").as("n_docs")))).as("s"))
      .select(col("s.stage_no"), col("s.stage"), col("s.n_docs"))
      .orderBy("stage_no")
  }

  /** Frame-taking synthesize→decode chain over any (doc_id, text)
    * frame — shared by the registered query and the ScaleProbe
    * replication harness. */
  def pngDecodeStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val payloads = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, h) => BinaryDoc(id, pngBytes(h)) })
    decodePng(payloads).toDF()
  }

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
  /** [[hv]]/[[byteAt]] with a COMPUTED md5-byte index (SQL expression,
    * e.g. a lambda variable) — the video twin's per-frame raster
    * bytes depend on the frame number. */
  private def hvE(pos: String) =
    s"(ascii(substr(h, $pos, 1)) - (CASE WHEN substr(h, $pos, 1) >= 'a' THEN 87 ELSE 48 END))"
  private def byteAtE(idx: String) =
    s"(${hvE(s"2 * (($idx) % 16) + 1")} * 16 + ${hvE(s"2 * (($idx) % 16) + 2")})"

  /** Frame-taking crawl-to-chunks funnel — shared by the registered
    * query and the ScaleProbe replication harness (replicas share
    * text, hence md5, hence URL: keeper/chunk stages must stay FLAT
    * while fetched grows — the honest-keeper echo). */
  def crawlFunnel(docs: DataFrame): DataFrame = {
    val staged = crawlStaged(docs)
    staged.agg(
        count(lit(1)).as("fetched"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("decoded"),
        sum(when(col("ok") && col("n_red") > 0, 1L).otherwise(0L))
          .as("pii_docs"),
        sum(when(col("s_gopher"), 1L).otherwise(0L)).as("gopher_keep"),
        sum(when(col("s_url"), 1L).otherwise(0L)).as("url_unique"),
        sum(when(col("s_exact"), 1L).otherwise(0L)).as("exact_unique"),
        sum(col("n_chunks")).as("chunks"))
      .select(explode(array(
        struct(lit(1).as("stage_no"), lit("fetched").as("stage"),
          col("fetched").as("n_docs")),
        struct(lit(2).as("stage_no"), lit("decoded").as("stage"),
          col("decoded").as("n_docs")),
        struct(lit(3).as("stage_no"), lit("pii_docs").as("stage"),
          col("pii_docs").as("n_docs")),
        struct(lit(4).as("stage_no"), lit("gopher_keep").as("stage"),
          col("gopher_keep").as("n_docs")),
        struct(lit(5).as("stage_no"), lit("url_unique").as("stage"),
          col("url_unique").as("n_docs")),
        struct(lit(6).as("stage_no"), lit("exact_unique").as("stage"),
          col("exact_unique").as("n_docs")),
        struct(lit(7).as("stage_no"), lit("chunks").as("stage"),
          col("chunks").as("n_docs")))).as("s"))
      .select(col("s.stage_no"), col("s.stage"), col("s.n_docs"))
      .orderBy("stage_no")
  }

  /** The per-doc staged frame behind [[crawlFunnel]] — exposed so the
    * ScaleProbe can census the window-key distribution (the NULL-key
    * salt below is exactly what it measures). */
  def crawlStaged(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    locally {
      val C = 16
      val T = graft.ops.TextOps
      val ingested = docs
        .withColumn("h", md5(col("text")))
        .select(col("doc_id"), col("h"), expr(T.piiSynthSql).as("body0"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, h, body0) =>
          parseWarcDoc(id, warcMemberBytes(h, body0)) })
        .toDF()
      val nRed = Seq(T.piiEmailRe, T.piiPhoneRe, T.piiIpRe)
        .map(re => s"size(regexp_extract_all(body, '$re', 0))")
        .mkString(" + ")
      val gop = T.gopherFlagsOn(ingested
        .withColumn("ok", col("status") === "ok" && col("url").isNotNull)
        .withColumn("n_red", when(col("ok"), expr(nRed)).otherwise(0))
        .withColumn("body_m", when(col("ok"), expr(T.piiMaskExpr("body"))))
        .withColumn("t",
          expr("filter(split(coalesce(body_m, ''), ' '), x -> x <> '')")))
      // canon and chash are NULL for every failed-decode row (~25% of
      // the corpus by the md5 arms) — partitioning on them raw would
      // funnel ALL failures through ONE window partition per exchange
      // (the NULL-key collapse c4CleanOn guards against). Salt the
      // NULL keys with a per-doc unique value: rn = 1 trivially for
      // each failed row, and s_url/s_exact already require ok, so the
      // outputs are bit-identical while the skew wall disappears.
      val wUrl = Window.partitionBy(col("k_url"))
        .orderBy(col("s_gopher").desc, col("doc_id"))
      val wTxt = Window.partitionBy(col("k_txt"))
        .orderBy(col("s_url").desc, col("doc_id"))
      Dedup.canonicalizeUrl(gop)
        .withColumn("s_gopher", col("ok") && coalesce(col("keep"), lit(false)))
        .withColumn("chash", md5(col("body_m")))
        .withColumn("k_url",
          coalesce(col("canon"), concat(lit("fail:"), col("doc_id"))))
        .withColumn("k_txt",
          coalesce(col("chash"), concat(lit("fail:"), col("doc_id"))))
        .withColumn("rn_url", row_number().over(wUrl))
        .withColumn("s_url", col("s_gopher") && col("rn_url") === 1)
        .withColumn("rn_txt", row_number().over(wTxt))
        .withColumn("s_exact", col("s_url") && col("rn_txt") === 1)
        .withColumn("n_chunks", when(col("s_exact"),
          expr(s"cast((n_tokens + ${C - 1}) div $C as bigint)")).otherwise(0L))
    }
  }

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

    // The REAL decode path (netpbm P6 needs no codec): synthesized
    // genuine PPM byte streams — ASCII header with comment/corruption
    // arms + binary RGB raster — parsed by the from-scratch
    // [[parsePpm]], exact per-channel sums and min/max out the other
    // side. The oracle recomputes the EXPECTED stats from the same md5
    // digits the synthesizer used; the Spark side actually parses the
    // bytes, so a parser bug (offset, comment handling, truncation
    // check) breaks the hash gate.
    "q_multimodal_decode_ppm" -> ((s, dir) => {
      import s.implicits._
      val docs = ppmPayload(Tables(s, dir, "documents")).as[BinaryDoc]
      decodePpm(docs).toDF().orderBy("doc_id")
    }),

    // The second REAL decode path (canonical PCM WAV needs no codec):
    // synthesized genuine RIFF/WAVE byte streams — little-endian
    // chunked header with magic/LIST/truncation arms + an 8-bit PCM
    // data chunk — parsed by the from-scratch [[parseWav]] chunk walk,
    // exact sample stats (sum/min/max/clip count) out the other side.
    // The LIST arm (~25%) only exercises the Spark-side walk: the
    // oracle recomputes expected stats from the md5 digits and is
    // blind to chunk layout, so a walk bug (skipping, alignment,
    // declared-size check) breaks the hash gate.
    "q_multimodal_decode_wav" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, wavBytes(h)) })
      decodeWav(payloads).toDF().orderBy("doc_id")
    }),

    // The third REAL decode path (uncompressed 24-bit BMP needs no
    // codec): synthesized genuine BMP byte streams — little-endian
    // dual headers, signed-height row direction, 4-byte row padding —
    // parsed by the from-scratch [[parseBmp]] walk. The oracle
    // recomputes expected stats from the md5 digits in LOGICAL image
    // space and is blind to the file layout, so a direction, stride,
    // or BGR-order bug in the walk breaks the hash gate (top_row_sum
    // pins row order specifically; the padded-stride arithmetic is
    // exercised at all four pad widths since w ∈ 1..4).
    "q_multimodal_decode_bmp" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, bmpBytes(h)) })
      decodeBmp(payloads).toDF().orderBy("doc_id")
    }),

    // The EIGHTH real decode path and the first DIRECTORY format:
    // synthesized dual-endian baseline TIFFs (see tiffBytes) decoded
    // by the one byte-order-dispatching parser; the oracle recomputes
    // stats from the md5 digits in logical pixel space and never sees
    // the IFD, so an entry-layout, endianness, or left-justification
    // bug breaks the hash gate.
    "q_multimodal_decode_tiff" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, tiffBytes(h)) })
      decodeTiff(payloads).toDF().orderBy("doc_id")
    }),

    // The fourth REAL decode path and the first over a COMPRESSED
    // stream (QOI needs no codec library, but its stream is genuinely
    // entropy-reduced): synthesized QOI files — big-endian header +
    // run/index/diff/luma/literal chunks from the from-scratch
    // spec-faithful encoder — decoded by [[parseQoi]]. The oracle
    // recomputes expected stats from the md5-keyed LOGICAL pixels and
    // never sees the compressed bytes: the hash gate therefore proves
    // the encoder→decoder round trip bit-exact, including the run
    // accounting (`n_run_px` is recomputed as the equal-to-previous
    // pixel count, which the prev-pixel rule makes identical to the
    // decoder's RUN-emitted tally).
    "q_multimodal_decode_qoi" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, qoiBytes(h)) })
      decodeQoi(payloads).toDF().orderBy("doc_id")
    }),

    // Decode → FEATURE-EXTRACT: the WAV decode's channel-0 PCM cut
    // into 4-sample frames with exact integer energy / zero-crossing /
    // sum features (the VAD + music/speech primitives). Failure-status
    // docs emit zero frames by contract. The oracle recomputes the
    // features from the md5 digits for the non-failed docs and is
    // blind to the RIFF layout — a stride bug (reading interleaved
    // stereo as mono) or an off-frame boundary breaks the hash gate.
    "q_audio_features" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, wavBytes(h)) })
      audioFrames(payloads).toDF().orderBy("doc_id", "frame")
    }),

    // The fifth REAL decode path and the first DICTIONARY-coded one:
    // synthesized genuine GIF87a files — logical screen descriptor,
    // global color table, and an LZW stream (variable-width codes,
    // clear/EOI, sub-blocks) from the from-scratch spec-faithful
    // encoder — decoded by [[parseGif]]. The oracle recomputes expected
    // stats from the md5-keyed LOGICAL pixels and never sees the
    // compressed bytes, so the hash gate proves the LZW round trip
    // bit-exact (code-width bumps, KwKwK, sub-block reassembly). The
    // interlace arm (~25%) permutes storage rows; row0_sum is computed
    // over the LOGICAL top row on both sides, so a skipped or wrong
    // de-interlace breaks the gate while whole-image sums would not.
    "q_multimodal_decode_gif" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, gifBytes(h)) })
      decodeGif(payloads).toDF().orderBy("doc_id")
    }),

    "q_multimodal_decode_png" -> ((s, dir) =>
      pngDecodeStats(Tables(s, dir, "documents")).orderBy("doc_id")),

    // REAL baseline-JPEG decode — see the codec block at [[jpegBytes]]
    // / [[parseJpeg]]: the dominant real-crawl image format, synthesized
    // spec-faithfully per doc (optimized canonical Huffman tables, two
    // DQT tables, byte stuffing) and decoded from scratch (marker walk,
    // DHT/DQT, MSB entropy decode, dequantize, de-zigzag, fixed-point
    // IDCT, integer YCbCr→RGB). The twin recomputes the pixels as a
    // pure md5 function (the frequency-domain fixture design makes the
    // lossy codec exactly invertible), so the hash gate proves the
    // whole decode chain end to end.
    "q_multimodal_decode_jpeg" -> ((s, dir) =>
      jpegDecodeStats(Tables(s, dir, "documents")).orderBy("doc_id")),

    // JPEG APP1/Exif metadata extraction — see [[parseJpegExif]]: the
    // orientation/camera pass an image pipeline runs BEFORE pixel
    // decode, composed from the JPEG marker walk and a dual-endian
    // TIFF IFD0 walk (Make inline-ASCII, Orientation left-justified
    // SHORT). Map-only single scan like every decode stage.
    "q_jpeg_exif" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) =>
          val p = jpegExifBytes(h)
          parseJpegExif(id, p)
        })
        .toDF().orderBy("doc_id")
    }),

    // APPLIED Exif orientation — see [[parseJpegOriented]]: the
    // decode→orient composition (all 8 tag values exercised across
    // the fixture arms), oriented position-weighted sums folded in
    // ONE pass through the pixel-sink tap. Map-only single scan like
    // every decode stage; closes the decode→orient→dHash chain real
    // image dedup runs.
    "q_jpeg_oriented" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) =>
          parseJpegOriented(id, jpegExifBytes(h))
        })
        .toDF().orderBy("doc_id")
    }),

    // PDF text extraction — see [[parsePdf]] / [[pdfBytes]]: the
    // twelfth decoder (xref walk → object graph → FlateDecode content
    // streams through the shared inflate → Tj/TJ tokenizer). Map-only
    // single scan like every decode stage; the oracle recomputes the
    // embedded text as a pure md5 function and never parses a byte.
    "q_pdf_extract" -> ((s, dir) =>
      pdfExtractStats(Tables(s, dir, "documents")).orderBy("doc_id")),

    // zstd transport ingest — see [[Zstd]]/[[zstdIngestStats]]: the
    // THIRTEENTH decoder (RFC 8878 frame walk → FSE/Huffman →
    // sequences with repeat-offset history → xxh64 check), the
    // `.jsonl.zst` front door. Map-only single scan like every decode
    // stage; the oracle recomputes content as pure text functions
    // (the encoding modes vary by hash, the CONTENT they must decode
    // to does not) and never parses a byte. Spec fidelity is pinned
    // both directions against zstd v1.5.7 in ZstdSpec.
    "q_zstd_ingest" -> ((s, dir) =>
      zstdIngestStats(Tables(s, dir, "documents")).orderBy("doc_id")),

    // COMPRESSION round trip — the transport's WRITE side as an
    // operator: each document compressed by the general-purpose
    // hash-chain LZ encoder (real multi-block frames, Huffman-or-raw
    // literals, predefined-FSE sequences, cross-block matches,
    // expanding blocks degraded to raw per the reference rule) and
    // immediately decoded by the full decoder; rebuilt_md5 must equal
    // md5(text), so the gate proves decode(compress(x)) == x per
    // document cross-engine — the twin never models the encoder, it
    // just hashes the original text. Compression EFFECT is pinned in
    // ZstdSpec (repetitive text shrinks) and the zstdc probe (corpus
    // ratio, stable under replication); frame fidelity against the
    // reference CLI (zstd -d reads our frames byte-exactly) is
    // dev-verified. Map-only: synthesize+decode fuse into the scan.
    "q_zstd_compress" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val raw = text.getBytes("ISO-8859-1")
          val (st, c, _, _) = Zstd.decode(Zstd.compress(raw))
          val md = if (st == "ok")
            java.security.MessageDigest.getInstance("MD5").digest(c)
              .map(x => f"${x & 0xff}%02x").mkString
          else null
          (id, st, raw.length.toLong, md)
        })
        .toDF("doc_id", "status", "orig_bytes", "rebuilt_md5")
        .orderBy("doc_id")
    }),

    // DICTIONARY TRAINING census — the fresh-train oracle for the
    // persisted zstd_dict artifact (the q_train_shards discipline):
    // the top-gram selection, the content identity (length + md5 in
    // the most-frequent-last order), and the corpus COVERAGE the
    // dictionary buys (docs containing at least one trained gram —
    // the number that says whether small-doc compression will find
    // history to reference). Plan: the gram census is one scan + one
    // keyed aggregate + TakeOrdered(16); coverage is a second scan
    // left-semi-joined against the BROADCAST 16-row gram frame with
    // the contains predicate evaluated scan-side; three 1-row frames
    // cross-join into the report row. Never a doc×doc or gram×gram
    // product.
    "q_zstd_dict_train" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val grams = zstdDictGrams(docs).localCheckpoint()
      val meta = grams.agg(
        count(lit(1)).as("n_grams"),
        sum(col("cnt")).as("gram_occurrences"),
        // BYTES (octet_length), matching the stored artifact's UTF-8
        // content — 8*count would be chars and diverge on non-ASCII
        coalesce(sum(expr("octet_length(gram)")), lit(0L))
          .as("content_len"),
        md5(expr("array_join(transform(array_sort(" +
          "collect_list(struct(cnt, gram))), x -> x.gram), '')"))
          .as("content_md5"))
      val cov = docs
        .join(broadcast(grams.select(col("gram"))),
          expr("contains(text, gram)"), "leftsemi")
        .agg(count(lit(1)).as("coverage_docs"))
      val tot = docs.agg(count(lit(1)).as("n_docs"))
      meta.crossJoin(broadcast(cov)).crossJoin(broadcast(tot))
    }),

    // .jsonl.zst FRONT DOOR — the exact file shape public corpora
    // ship (RedPajama/Dolma/FineWeb), composed end to end: the
    // MULTI-FRAME walk (Zstd.decodeFrames — pzstd-style skippable
    // seek-table frames skipped, data frames concatenated) → JSONL
    // line split → per-record JSON field extraction (codegen
    // get_json_object) → doc census. The 1→N record fan-out fuses
    // into the scan (archive-ingest shape); the one exchange is the
    // doc-keyed census aggregate (partial+final). rebuilt_md5
    // re-joins the JSON-extracted texts IN JSON-ID ORDER and must
    // equal md5 of the original text — transport framing, LZ
    // back-references, line framing, and JSON round-trip pinned in
    // one hash per document.
    "q_zstd_jsonl" -> ((s, dir) => {
      import s.implicits._
      val blobs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, text, h) =>
          BinaryDoc(id, Zstd.zstdJsonlBytes(text, h)) })
      zstdJsonlFanout(blobs)
        .groupBy(col("doc_id"), col("status"))
        .agg(max(col("nf")).as("nfx"),
          count(col("line")).as("n_records"),
          md5(expr("array_join(transform(array_sort(" +
            "collect_list(struct(rid, rtext))), x -> x.rtext), ' ')"))
            .as("md"))
        .select(col("doc_id"), col("status"),
          when(col("status") === "ok", col("nfx")).as("n_frames"),
          col("n_records"),
          when(col("status") === "ok", col("md")).as("rebuilt_md5"))
        .orderBy("doc_id")
    }),

    "q_multimodal_decode_gzip" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, gzipBytes(h)) })
      decodeGzip(payloads).toDF().orderBy("doc_id")
    }),

    // The archive CONTAINER ingest — the decode family's first 1→N
    // generator: synthesized genuine ZIP archives (1–3 members each,
    // stored + DEFLATE through the shared inflate, real CRC-32s, full
    // central directory + EOCD) fan out to one row PER MEMBER via a
    // flatMap fused into the scan's MapPartitions. The md5-driven
    // arms exercise the container-level failure paths (truncation,
    // corrupt EOCD, a CD walk that runs off its end) and the
    // member-level one (a CRC corrupted consistently in BOTH header
    // copies, so only genuinely decompressing the data catches it).
    // The oracle recomputes member count, identity, and text stats
    // from the md5 pure functions and never sees the archive bytes —
    // a hash-green row set proves the EOCD scan, CD walk, local-
    // header cross-check, and per-member inflate+CRC all round-trip.
    "q_archive_ingest" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, zipBytes(h)) })
      decodeZip(payloads).toDF().orderBy("doc_id", "member")
    }),

    // TAR member fan-out — the SECOND 1→N container ([[parseTar]]):
    // genuine ustar blocks (octal sizes, space-normalized header
    // checksums, prefix-joined names, two-zero-block trailer) walked
    // positionally; header-level failures stop with a row. Same
    // scan-fused map-only shape as q_archive_ingest.
    "q_archive_ingest_tar" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, tarBytes(h)) })
      decodeTar(payloads).toDF().orderBy("doc_id", "member")
    }),

    // .tar.gz ingest — the two container layers COMPOSED the way
    // public corpora actually ship (gzip transport around a ustar
    // archive): inflate through the shared RFC 1952 walk, then the
    // UNCHANGED 512-byte header walk over the inflated bytes, all
    // inside one task ([[parseTgz]]). Gzip-layer failures surface as
    // one gzip_-prefixed row so the census separates transport loss
    // from container loss.
    "q_archive_ingest_tgz" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, tgzBytes(h)) })
      decodeTgz(payloads).toDF().orderBy("doc_id", "member")
    }),

    // ARCHIVE-MEMBER DEDUP census — the crawl-shaped funnel at the
    // MEMBER grain ([[parseZipText]]): blobs fan out to members, ok
    // members carry their decoded text, and the exact-dup census runs
    // across ALL archives (documents sharing text synthesize
    // byte-identical archives, so their members collide — exactly the
    // duplicated-distribution-unit shape public corpora exhibit). One
    // scan, map-only fan-out, one aggregate; the STREAMED form
    // (Streams.archiveMemberScreen) runs the full exact+LSH screen
    // per arriving container against the standing index.
    "q_archive_member_dedup" -> ((s, dir) => {
      import s.implicits._
      val blobs = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, zipBytes(h)) })
      decodeZipText(blobs).toDF()
        .agg(countDistinct(col("doc_id")).as("n_blobs"),
          count(lit(1)).as("n_member_rows"),
          sum(when(col("status") === "ok", 1L).otherwise(0L))
            .as("n_ok_members"),
          countDistinct(col("text")).as("n_distinct_texts"))
        .select(col("n_blobs"), col("n_member_rows"), col("n_ok_members"),
          col("n_distinct_texts"),
          (col("n_ok_members") - col("n_distinct_texts"))
            .as("n_dup_members"))
    }),

    // CROSS-MODAL ALIGNMENT GATE — the LAION recipe (Schuhmann et al.
    // 2021): score each doc's image against its text embedding with a
    // cosine, gate at τ, report the kept/dropped funnel per source.
    // This is the one composition the multimodal and embedding
    // families hadn't made yet: the image side is a GENUINE decode
    // (the P6 payload parsed by parsePpm, its exact per-channel sums
    // as a 3-dim feature vector — a CLIP image tower stands in as a
    // stub by necessity, the *plumbing* is the real thing), the text
    // side is the doc's quantized embedding folded to 3 block sums,
    // and the score is the repo's exact 4-dp cosine discipline.
    // Scale shape: decode is scan-fused (one documents pass carrying
    // `source`), the embedding side is a scan-side projection, and
    // the ONLY exchange is the doc-keyed SHUFFLE-HASH join (both
    // sides corpus-sized — the genuine co-keyed join a 100 TB
    // text+image corpus pays; never all-pairs) plus the tiny
    // per-source aggregate. Gate τ = 0.1 on the 4-dp cosine.
    "q_clip_filter" -> ((s, dir) => {
      import s.implicits._
      val img = ppmPayloadKeep(Tables(s, dir, "documents"), Seq("source"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions(_.map { case (id, src, pay) =>
          val m = parsePpm(id, pay)
          (id, src, m.status, m.r_sum, m.g_sum, m.b_sum)
        })
        .toDF("doc_id", "source", "status", "r_sum", "g_sum", "b_sum")
      val txt = Dedup.quantized(s, dir).select(col("vec_id"),
        expr("aggregate(slice(q, 1, 21), cast(0 as bigint), (a, x) -> a + x)")
          .as("t1"),
        expr("aggregate(slice(q, 22, 21), cast(0 as bigint), (a, x) -> a + x)")
          .as("t2"),
        expr("aggregate(slice(q, 43, 22), cast(0 as bigint), (a, x) -> a + x)")
          .as("t3"))
      img.join(txt.hint("shuffle_hash"),
          col("doc_id") === col("vec_id"), "left")
        .withColumn("in2",
          expr("r_sum * r_sum + g_sum * g_sum + b_sum * b_sum"))
        .withColumn("tn2", expr("t1 * t1 + t2 * t2 + t3 * t3"))
        .withColumn("scorable", expr(
          "status = 'ok' AND vec_id IS NOT NULL AND in2 > 0 AND tn2 > 0"))
        .withColumn("cos_u", expr(
          "CASE WHEN scorable THEN cast(round(round(" +
            "(r_sum * t1 + g_sum * t2 + b_sum * t3) / " +
            "sqrt(cast(in2 as double)) / sqrt(cast(tn2 as double)), 4) " +
            "* 10000.0) as bigint) END"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_img_ok"),
          sum(when(col("scorable"), 1L).otherwise(0L)).as("n_scored"),
          sum(when(col("scorable") && col("cos_u") >= 1000, 1L)
            .otherwise(0L)).as("n_kept"),
          sum(when(col("scorable"), col("cos_u")).otherwise(0L))
            .as("cos_sum_u"))
        .select(col("source"), col("n_docs"), col("n_img_ok"),
          col("n_scored"), col("n_kept"),
          when(col("n_scored") > 0,
            round(col("n_kept").cast("double") /
              col("n_scored").cast("double"), 4)).as("kept_frac"),
          when(col("n_scored") > 0,
            round(col("cos_sum_u").cast("double") /
              col("n_scored").cast("double") / 10000.0, 4)).as("mean_cos"))
        .orderBy("source")
    }),

    // VIDEO frame-sampling — the fps-reduction op, over genuine
    // ppm_pipe streams (2–9 concatenated P6 frames with per-frame
    // dimensions, so the sampler genuinely re-parses every header):
    // keep every 2nd frame with exact channel sums, stop-with-a-row
    // on the mid-stream corrupt-magic and truncated-tail arms. Same
    // 1→N scan-fused flatMap shape as the archive ingest; the oracle
    // recomputes kept frames, per-frame dimensions, and channel sums
    // from the md5 pure functions without seeing the stream bytes.
    "q_video_framesample" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) => BinaryDoc(id, videoBytes(h)) })
      decodeVideo(payloads).toDF().orderBy("doc_id", "frame")
    }),

    // The crawl FRONT-DOOR, end to end in one plan: WARC-shaped gzip
    // records (REAL RFC 1952 members, synthesized with genuine failure
    // arms) → the shared gunzip walk → WARC-Target-URI extraction →
    // URL canonicalization (the q_dedup_url rules) → the ingest funnel
    // (fetched → decoded → min-length → unique canonical URL). This is
    // the composition the decoder family exists for: what a 100 TB
    // crawl slice loses at each gate, as one number per stage. Scale
    // shape: ONE parquet scan, a fused synthesize+decode MapPartitions,
    // the canonicalizer as codegen'd scan-side projections, a single
    // 1-row aggregate (count-distinct canon is its only exchange), and
    // a 4-row long-form explode — no join anywhere.
    "q_warc_ingest" -> ((s, dir) =>
      warcFunnel(Tables(s, dir, "documents"))),

    // The CRAWL-TO-CHUNKS pipeline — the literal front-to-back
    // training-data preparation run as ONE Catalyst plan: compressed
    // WARC bytes (the doc's own PII-laced text shipped through a REAL
    // gzip round trip) → gunzip+parse (MapPartitions, the decode
    // family's fused stage) → PII mask → Gopher repetition gate →
    // canonical-URL keeper election → exact-content keeper election →
    // fixed-size chunk accounting, with the per-stage funnel as the
    // output (the q_pipeline_funnel observability shape). Stage
    // booleans are ANNOTATED, not filtered, so the whole funnel is
    // one pass: scan → map → two window exchanges (canon, content
    // hash — both hash-uniform) → a 1-row aggregate → 7 long-form
    // rows. NO JOIN anywhere; at 100 TB this is one corpus pass plus
    // two keyed shuffles of the survivors. The twin re-derives every
    // stage from (text, md5 bits) — a hash-exact funnel proves the
    // real gzip/WARC round trip reproduced the text byte-for-byte.
    "q_pipeline_crawl" -> ((s, dir) =>
      crawlFunnel(Tables(s, dir, "documents"))),

    // REAL decode→resize chain over the P6 payloads: every output
    // pixel is a genuinely parsed raster byte chosen by the integer
    // nearest-neighbor index map — the oracle recomputes the same
    // samples from the hex function, so the hash gate pins both the
    // parse and the sampling geometry.
    "q_multimodal_resize_real" -> ((s, dir) => {
      import s.implicits._
      val payloads = ppmPayload(Tables(s, dir, "documents"))
        .as[BinaryDoc]
      payloads.mapPartitions { rows =>
        // per-partition resize-buffer allocation would go here
        rows.map(d => resizePpm(d.doc_id, d.payload, ow = 2, oh = 2))
      }.toDF().orderBy("doc_id")
    }),

    // HTML text extraction — the crawl stage between the WARC record
    // and the text pipeline: real tag/script/comment state machine,
    // entity decode, block-level cuts, boilerplate filter (see
    // [[parseHtml]]). Map-only, scan-fused; a hash-green kept text
    // proves script/comment bodies never resurfaced and the content
    // blocks reassembled byte-exact.
    "q_html_extract" -> ((s, dir) => {
      import s.implicits._
      val pages = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, t, h) => (id, htmlOf(t, h)) })
      extractHtml(pages).toDF().orderBy("doc_id")
    }),

    // The crawl front door at FULL fidelity — WARC record → gunzip →
    // HTML page → extraction → content gate, the four stages a real
    // crawl consumer runs, composed in ONE task (the record BODY is a
    // genuine HTML page around the doc's text, so both layers' arms
    // fire independently). The census separates transport loss (gzip
    // arms) from markup state (ok / no_markup / truncated) from the
    // content verdict — and html-TRUNCATED pages still yield content
    // when their <p> blocks landed before the cut, exactly the
    // salvage a block-wise extractor exists to make.
    "q_crawl_html_funnel" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, t, h) =>
          val wd = parseWarcDoc(id, warcMemberBytes(h, htmlOf(t, h)))
          val he = wd.body.map(b => parseHtml(id, b))
          (id, wd.status, he.map(_.status).orNull,
            he.map(_.n_kept).getOrElse(0))
        }).toDF("doc_id", "warc_status", "html_status", "n_kept")
        .agg(count(lit(1)).as("n_fetched"),
          sum(when(col("warc_status") === "ok", 1L).otherwise(0L))
            .as("n_decoded"),
          sum(when(col("html_status") === "ok", 1L).otherwise(0L))
            .as("n_html_ok"),
          sum(when(col("html_status") === "no_markup", 1L).otherwise(0L))
            .as("n_no_markup"),
          sum(when(col("html_status") === "truncated", 1L).otherwise(0L))
            .as("n_html_truncated"),
          sum(when(col("n_kept") >= 1, 1L).otherwise(0L))
            .as("n_with_content"))
    }),

    // MIXED-FORMAT crawl front door — the router a real pipeline runs
    // BEFORE any extractor: a third of the corpus arrives as PDF
    // (with pdfBytes' own failure arms riding along), a third as HTML
    // (htmlOf's plain-text arm mislabels some — exactly the
    // Content-Type lies crawls see), a third as plain text. The
    // router sniffs the FIRST byte ('%' → the PDF extractor, '<' →
    // the HTML state machine, else the plain-text gate) and each
    // route runs its REAL extractor — corrupt-magic PDFs route to the
    // PDF arm and fail there (the libmagic behavior), mislabeled
    // plain HTML lands in the text gate. Census per route: docs,
    // extraction successes, docs yielding content. ONE task: synth +
    // sniff + all three extractors fuse into the scan; the census is
    // a 3-row aggregate with map-side partials.
    "q_crawl_mixed_funnel" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, t, h) =>
          val fmt = Integer.parseInt(h.substring(14, 16), 16) % 3
          val payload: Array[Byte] =
            if (fmt == 0) pdfBytes(h)
            else if (fmt == 1) htmlOf(t, h).getBytes("ISO-8859-1")
            else t.getBytes("ISO-8859-1")
          val c0 = if (payload.isEmpty) ' ' else (payload(0) & 0xff).toChar
          if (c0 == '%') {
            val m = parsePdf(id, payload)
            (id, "pdf", if (m.status == "ok") 1L else 0L,
              if (m.n_chars.exists(_ >= 1)) 1L else 0L)
          } else if (c0 == '<') {
            val m = parseHtml(id, new String(payload, "ISO-8859-1"))
            (id, "html", if (m.status == "ok") 1L else 0L,
              if (m.n_kept >= 1) 1L else 0L)
          } else {
            val nw = t.split(" ").count(_.nonEmpty)
            (id, "text", 1L, if (nw >= 5) 1L else 0L)
          }
        }).toDF("doc_id", "route", "ok", "has_content")
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ok")).as("n_ok"),
          sum(col("has_content")).as("n_content"))
        .orderBy("route")
    }),

    // CROSS-FORMAT content dedup — the syndication case URL and
    // per-format content dedup both miss: the same article arriving
    // once in its native format and again REPUBLISHED in another
    // (PDF ⇄ HTML). Per doc: the native payload (pdf/html/plain by
    // the mixed-funnel arm) plus, on the ~25% syndication arm, a
    // second payload of the SAME text in the other format. Every
    // record runs its REAL extractor (parsePdfText / parseHtml), then
    // ONE shared canonicalizer (≥5-word blocks joined by a space,
    // md5 — parseHtml's kept rule) turns format-specific block
    // structure into a format-free content key; the census counts
    // clusters that span FORMATS — exactly the dups a per-format pass
    // cannot see. Scale shape: synth + extract + canonicalize fuse
    // into the scan's flatMap; ONE key-grouped aggregate with
    // map-side partials feeding the 1-row census.
    "q_dedup_cross_format" -> ((s, dir) => {
      import s.implicits._
      val recs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
        .as[(Long, String, String)]
        .mapPartitions(_.flatMap { case (id, t, h) =>
          val fmt = Integer.parseInt(h.substring(14, 16), 16) % 3
          val synd = Integer.parseInt(h.substring(12, 14), 16) % 4 == 1
          def canon(blocks: Seq[String]): Option[String] = {
            val kept = blocks.filter(_.split(' ').length >= 5)
            if (kept.isEmpty) None else Some(md5hex(kept.mkString(" ")))
          }
          def pdfKey: Option[String] =
            parsePdfText(id, pdfBytesOf(t, h))._2
              .flatMap(tx => canon(tx.split('\n').toSeq))
          def htmlKey: Option[String] =
            parseHtml(id, htmlOf(t, h)).kept_hash
          def textKey: Option[String] = parseHtml(id, t).kept_hash
          val native = fmt match {
            case 0 => ("pdf", pdfKey)
            case 1 => ("html", htmlKey)
            case _ => ("text", textKey)
          }
          val copy =
            if (!synd) Nil
            else if (fmt == 0) Seq(("html", htmlKey))
            else Seq(("pdf", pdfKey))
          (Seq(native) ++ copy).map { case (route, k) =>
            (id, route, k.orNull)
          }
        }).toDF("doc_id", "route", "ckey")
      // ONE extraction pass: keyless records survive the key census as
      // the NULL group (a separate record-count branch would re-run
      // the whole synth+extract scan — PlanSpec pins against it)
      recs.groupBy(col("ckey"))
        .agg(count(lit(1)).as("c"), countDistinct(col("route")).as("nr"))
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_records"),
          coalesce(sum(when(col("ckey").isNotNull, col("c"))
            .otherwise(0L)), lit(0L)).as("n_keyed"),
          count(when(col("ckey").isNotNull, 1)).as("n_clusters"),
          coalesce(sum(when(col("ckey").isNotNull && col("c") >= 2, 1L)
            .otherwise(0L)), lit(0L)).as("n_multi_clusters"),
          coalesce(sum(when(col("ckey").isNotNull && col("nr") >= 2, 1L)
            .otherwise(0L)), lit(0L)).as("n_cross_format_clusters"),
          coalesce(sum(when(col("ckey").isNotNull && col("c") >= 2,
            col("c")).otherwise(0L)), lit(0L)).as("n_dup_records"))
    }),

    // ORIENTATION-NORMALIZED perceptual dedup — the decode→orient→
    // dHash composition closed end to end (see [[jpegOrientedDhash]]):
    // without the orient step, every mirrored/rotated re-upload of an
    // image dodges perceptual dedup because dHash is computed over
    // raw storage order. Same keeper census as q_dedup_image_phash,
    // over the JPEG+Exif payloads with the tag's inverse index map
    // applied at the sampling grid. Scale shape identical: scan-fused
    // decode+hash, one hash-keyed window census.
    "q_dedup_image_phash_oriented" -> ((s, dir) => {
      import s.implicits._
      val metas = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, h) =>
          jpegOrientedDhash(id, jpegExifBytes(h))
        }).toDF()
      val w = Window.partitionBy(col("status"), col("dhash_hi"),
        col("dhash_lo"))
      metas
        .withColumn("n_copies", when(col("status") === "ok",
          count(lit(1)).over(w)).otherwise(lit(null).cast("long")))
        .withColumn("keeper", when(col("status") === "ok",
          min(col("doc_id")).over(w)).otherwise(lit(null).cast("long")))
        .withColumn("keep",
          col("status") === "ok" && col("doc_id") === col("keeper"))
        .select(col("doc_id"), col("status"), col("dhash_hi"),
          col("dhash_lo"), col("n_copies"), col("keeper"), col("keep"))
        .orderBy("doc_id")
    }),

    // PERCEPTUAL image dedup — dHash over genuinely decoded pixels,
    // then the exact-dedup keeper census keyed on the 64-bit hash
    // (the LAION image-dedup recipe's cheap tier). Scale shape: the
    // decode+hash is scan-fused map-only; the census is ONE window
    // over the hash key — the q_dedup_exact plan on a 16-byte key,
    // shuffle-balanced because hashes are near-uniform. Docs sharing
    // text synthesize identical images, so their hashes collide by
    // construction; tiny same-dimension images collide naturally —
    // both land in the same keeper election, exactly the production
    // behavior (perceptual dedup trades precision for recall).
    "q_dedup_image_phash" -> ((s, dir) => {
      import s.implicits._
      val metas = ppmPayload(Tables(s, dir, "documents")).as[BinaryDoc]
        .mapPartitions(_.map(d => dhashPpm(d.doc_id, d.payload))).toDF()
      val w = Window.partitionBy(col("status"), col("dhash_hi"),
        col("dhash_lo"))
      metas
        .withColumn("n_copies", when(col("status") === "ok",
          count(lit(1)).over(w)).otherwise(lit(null).cast("long")))
        .withColumn("keeper", when(col("status") === "ok",
          min(col("doc_id")).over(w)).otherwise(lit(null).cast("long")))
        .withColumn("keep",
          col("status") === "ok" && col("doc_id") === col("keeper"))
        .select(col("doc_id"), col("status"), col("dhash_hi"),
          col("dhash_lo"), col("n_copies"), col("keeper"), col("keep"))
        .orderBy("doc_id")
    }),

    // PERCEPTUAL image NEAR-dup — the Hamming tier above the exact
    // phash census (together they are the LAION image-dedup recipe):
    // the 64-bit dHash splits into four 16-bit bands, band-equality
    // generates candidates, an exact popcount verifies Hamming ≤ 8 —
    // the q_dedup_simhash shape at image grain. Pigeonhole GUARANTEES
    // pairs at distance ≤ 3 (four bands can't all absorb ≤ 3 flipped
    // bits); above that, band sharing is the standard LSH heuristic
    // and the oracle mirrors the same candidate rule, so the gate
    // pins the screen's actual semantics, not an idealized recall.
    // Output is the bounded per-image census (degree + lowest peer),
    // never the pair list — at 100 TB a heavy bucket's pair set is
    // quadratic, the census row is one per image.
    "q_dedup_image_phash_near" -> ((s, dir) => {
      import s.implicits._
      val metas = ppmPayload(Tables(s, dir, "documents")).as[BinaryDoc]
        .mapPartitions(_.map(d => dhashPpm(d.doc_id, d.payload))).toDF()
        .filter(col("status") === "ok")
        .select(col("doc_id"), col("dhash_hi"), col("dhash_lo"))
      val banded = metas.select(col("doc_id"), col("dhash_hi"),
          col("dhash_lo"), explode(array(
            struct(lit(0).as("band"), (col("dhash_lo") % 65536L).as("bkey")),
            struct(lit(1).as("band"),
              expr("shiftright(dhash_lo, 16)").as("bkey")),
            struct(lit(2).as("band"), (col("dhash_hi") % 65536L).as("bkey")),
            struct(lit(3).as("band"),
              expr("shiftright(dhash_hi, 16)").as("bkey")))).as("b"))
        .select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
          col("b.band").as("band"), col("b.bkey").as("bkey"))
      // band self-join sits under the explode → junk size estimates;
      // force SHJ and let AQE pick build sides from runtime bytes
      val pairs = banded.as("a")
        .join(banded.as("c").hint("shuffle_hash"),
          col("a.band") === col("c.band") && col("a.bkey") === col("c.bkey")
            && col("a.doc_id") < col("c.doc_id"))
        .select(col("a.doc_id").as("da"), col("c.doc_id").as("db"),
          col("a.dhash_hi").as("ha"), col("a.dhash_lo").as("la"),
          col("c.dhash_hi").as("hb"), col("c.dhash_lo").as("lb"))
        .distinct() // a pair can match in up to 4 bands
        .withColumn("hamming", expr(
          "bit_count(la ^ lb) + bit_count(ha ^ hb)"))
        .filter(col("hamming") <= 8)
      val deg = pairs.select(col("da").as("doc_id"), col("db").as("peer"))
        .unionByName(pairs.select(col("db").as("doc_id"),
          col("da").as("peer")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_near"), min(col("peer")).as("min_peer"))
      metas.select(col("doc_id"))
        .join(deg.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_near"), lit(0L)).as("n_near"),
          col("min_peer"))
        .orderBy("doc_id")
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
                |     WHEN substring(h, 1, 4) = '424d' THEN 'bmp'
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

  /** Shared pixel-model prefix (hx→jr) of the JPEG twins: the
    * frequency-domain fixture decoded as a pure md5 function per
    * (x, y) — doc arms in `jd`, per-pixel RGB in `jr`. Shared by
    * q_multimodal_decode_jpeg and q_jpeg_oriented so the oriented
    * row provably reads the SAME pixels the decode row gates. */
  private lazy val jpegPixelCtes: String = s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      jb AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
               ${byteAt(7)} AS b7, ${byteAt(8)} AS b8, ${byteAt(9)} AS b9,
               ${byteAt(11)} AS b11, ${byteAt(12)} AS b12,
               ${byteAt(13)} AS b13
             FROM hx),
      jd AS (SELECT doc_id, h,
               b11 % 16 = 9 AS badmagic,
               -- the progressive arm decodes to the SAME pixels, so it
               -- needs no status column; 12-bit precision is the one
               -- remaining header-probe-only arm
               b11 % 16 <> 9 AND b7 % 8 = 3 AS prec12,
               b11 % 16 <> 9 AND b12 % 16 <> 11 AND b13 % 8 = 5 AS trunc,
               b9 % 8 = 6 AS gray,
               b9 % 8 <> 6 AND b8 % 4 = 2 AS sub420,
               b9 % 8 <> 6 AND b8 % 4 = 1 AS sub422,
               (CASE WHEN b9 % 8 <> 6 AND b8 % 4 IN (1, 2) THEN 16
                     ELSE 8 END) * (1 + b0 % 2) AS w,
               (CASE WHEN b9 % 8 <> 6 AND b8 % 4 = 2 THEN 16 ELSE 8 END)
                 * (1 + b1 % 2) AS hh
             FROM jb),
      jpx AS (SELECT doc_id, h, gray, sub420, sub422, w,
                i % w AS x, i // w AS y,
                ((i // w) // 8) * (w // 8) + (i % w) // 8 AS bi,
                -- 4:2:0 chroma grain: one block per 16×16 MCU, sampled
                -- at the floor-mapped (x/2, y/2) within-MCU position
                ((i // w) // 16) * (w // 16) + (i % w) // 16 AS bic,
                -- 4:2:2 chroma grain: one block per 16×8 MCU, halved
                -- horizontally only — floor-mapped (x/2, y)
                ((i // w) // 8) * (w // 16) + (i % w) // 16 AS bic2,
                (list_value(1,-1,-1,1,1,-1,-1,1)[(i % w) % 8 + 1] *
                 list_value(1,-1,-1,1,1,-1,-1,1)[(i // w) % 8 + 1]) AS sg,
                (list_value(1,-1,-1,1,1,-1,-1,1)[((i % w) % 16) // 2 + 1] *
                 list_value(1,-1,-1,1,1,-1,-1,1)[((i // w) % 16) // 2 + 1])
                  AS sgc,
                (list_value(1,-1,-1,1,1,-1,-1,1)[((i % w) % 16) // 2 + 1] *
                 list_value(1,-1,-1,1,1,-1,-1,1)[(i // w) % 8 + 1]) AS sgc2
              FROM jd, UNNEST(generate_series(0, w * hh - 1)) AS u(i)
              WHERE NOT badmagic AND NOT prec12 AND NOT trunc),
      jv AS (SELECT doc_id, x, y,
               128 + (${byteAtE("2 + 3 * 0 + bi")} % 48 - 24) +
                 (${byteAtE("7 + 2 * 0 + bi")} % 32 - 16) * sg AS yv,
               CASE WHEN gray THEN 128
                    WHEN sub420 THEN
                      128 + (${byteAtE("2 + 3 * 1 + bic")} % 48 - 24) +
                        (${byteAtE("7 + 2 * 1 + bic")} % 32 - 16) * sgc
                    WHEN sub422 THEN
                      128 + (${byteAtE("2 + 3 * 1 + bic2")} % 48 - 24) +
                        (${byteAtE("7 + 2 * 1 + bic2")} % 32 - 16) * sgc2
                    ELSE
                      128 + (${byteAtE("2 + 3 * 1 + bi")} % 48 - 24) +
                        (${byteAtE("7 + 2 * 1 + bi")} % 32 - 16) * sg
                    END AS cb,
               CASE WHEN gray THEN 128
                    WHEN sub420 THEN
                      128 + (${byteAtE("2 + 3 * 2 + bic")} % 48 - 24) +
                        (${byteAtE("7 + 2 * 2 + bic")} % 32 - 16) * sgc
                    WHEN sub422 THEN
                      128 + (${byteAtE("2 + 3 * 2 + bic2")} % 48 - 24) +
                        (${byteAtE("7 + 2 * 2 + bic2")} % 32 - 16) * sgc2
                    ELSE
                      128 + (${byteAtE("2 + 3 * 2 + bi")} % 48 - 24) +
                        (${byteAtE("7 + 2 * 2 + bi")} % 32 - 16) * sg
                    END AS cr
             FROM jpx),
      jr AS (SELECT doc_id, x, y,
               least(255, greatest(0, yv +
                 ((91881 * (cr - 128) + 32768 + 1073741824) // 65536)
                 - 16384)) AS r,
               least(255, greatest(0, yv -
                 ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768
                   + 1073741824) // 65536) + 16384)) AS g,
               least(255, greatest(0, yv +
                 ((116130 * (cb - 128) + 32768 + 1073741824) // 65536)
                 - 16384)) AS bb
             FROM jv)"""

  /** Shared trained-dictionary CTE chain (z-prefixed so it composes
    * into q_index_persist's combined twin): ztop = the corpus's
    * top-16 8-byte grams by (count desc, gram asc) — the exact
    * selection [[zstdDictGrams]] makes. */
  private[llm] val zstdDictCtes: String = """
      zg0 AS (SELECT substr(text, CAST(i AS INT), 8) AS gram
              FROM documents,
                   UNNEST(generate_series(1,
                     greatest(length(text) - 7, 0))) AS u(i)),
      zg1 AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt
              FROM zg0 GROUP BY 1),
      ztop AS (SELECT gram, cnt FROM zg1
               ORDER BY cnt DESC, gram LIMIT 16)"""

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
    "q_multimodal_decode_ppm" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                   ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b13 % 16 = 0 AS badmagic, b15 % 8 = 0 AS trunc,
                   1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b),
      r AS (SELECT doc_id, badmagic, trunc, w, hh,
              list_transform(generate_series(0, w * hh * 3 - 1), i ->
                (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS raster
            FROM d)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic THEN NULL ELSE CAST(255 AS INT) END AS maxval,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+1])) AS BIGINT) END AS r_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+2])) AS BIGINT) END AS g_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+3])) AS BIGINT) END AS b_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_min(raster) AS INT) END AS px_min,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_max(raster) AS INT) END AS px_max
      FROM r ORDER BY doc_id""",
    // gzip twin: text stats recomputed from the md5 pure function —
    // payload = (h ++ ' ' ++ reverse(h) ++ ' ') × k, so n_bytes = 66k,
    // sum = k·(2·Σascii(h) + 64), seps = 2k. The oracle never sees the
    // DEFLATE bits or the CRC/ISIZE footer; a hash-green row proves
    // the header walk + inflate + footer verification round-trips.
    // zstd twin: statuses from the arm bytes, the decoded content
    // recomputed as PURE TEXT functions (the hash only picks the
    // ENCODING mode; what it must decode to is t, t·2/t·3 space-
    // joined, t·2 unspaced, or a char run), then DuckDB's own
    // md5/length — so a hash-green row set proves the whole frame
    // walk (FSE tables, Huffman trees, backward bitstreams, repeat
    // offsets, checksums) reproduces every document byte-exactly.
    // Round-trip twin: the encoder is never modeled — md5(text) IS
    // the expected rebuilt hash, so a match proves the whole
    // compress→decode loop reproduced every byte.
    "q_zstd_compress" -> """
      SELECT doc_id, 'ok' AS status,
             CAST(length(text) AS BIGINT) AS orig_bytes,
             md5(text) AS rebuilt_md5
      FROM documents ORDER BY doc_id""",

    "q_zstd_dict_train" -> s"""
      WITH $zstdDictCtes,
      zmeta AS (SELECT CAST(count(*) AS BIGINT) AS n_grams,
                  CAST(sum(cnt) AS BIGINT) AS gram_occurrences,
                  coalesce(CAST(sum(octet_length(encode(gram))) AS BIGINT), 0)
                    AS content_len,
                  md5(string_agg(gram, '' ORDER BY cnt ASC, gram ASC))
                    AS content_md5
                FROM ztop),
      zcov AS (SELECT CAST(count(*) AS BIGINT) AS coverage_docs
               FROM documents d
               WHERE EXISTS (SELECT 1 FROM ztop t
                             WHERE contains(d.text, t.gram))),
      ztot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
      SELECT n_grams, gram_occurrences, content_len, content_md5,
             coverage_docs, n_docs
      FROM zmeta, zcov, ztot""",

    "q_zstd_ingest" -> s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      zb AS (SELECT doc_id, text, ${byteAt(2)} AS b2, ${byteAt(3)} AS b3,
               ${byteAt(4)} AS b4,
               ${byteAt(8)} AS b8, ${byteAt(9)} AS b9,
               ${byteAt(11)} AS b11, ${byteAt(12)} AS b12,
               ${byteAt(13)} AS b13, ${byteAt(14)} AS b14,
               ${byteAt(15)} AS b15
             FROM hx),
      zd AS (SELECT doc_id, text, b2, b3,
               b11 % 16 = 4 AS badmagic,
               b11 % 16 <> 4 AND b12 % 8 = 3 AND b4 % 2 = 0 AS dictok,
               b11 % 16 <> 4 AND b12 % 8 = 3 AND b4 % 2 = 1 AS dictunk,
               b11 % 16 <> 4 AND b12 % 8 <> 3 AND b13 % 8 = 6 AS trunc,
               b11 % 16 <> 4 AND b12 % 8 <> 3 AND b13 % 8 <> 6
                 AND b15 % 8 = 2 AS badsum,
               b11 % 16 <> 4 AND b12 % 8 <> 3 AND b13 % 8 <> 6
                 AND b15 % 8 <> 2 AND b14 % 8 = 5 AS reserved,
               CASE WHEN length(text) < 3 THEN 0 ELSE b9 % 8 END AS mode,
               b8 % 2 = 0 AS hassum
             FROM zb),
      zc AS (SELECT *,
               NOT (badmagic OR dictunk OR trunc OR badsum OR reserved)
                 AS isok,
               CASE WHEN dictok
                    THEN 'the shared dict prefix24' || text
                    ELSE CASE mode
                      WHEN 1 THEN repeat(chr(97 + b2 % 26), 5 + b3)
                      WHEN 2 THEN text || ' ' || text
                      WHEN 4 THEN text || ' ' || text
                      WHEN 3 THEN text || ' ' || text || ' ' || text
                      WHEN 5 THEN text || ' ' || text || ' ' || text
                      WHEN 6 THEN text || text
                      ELSE text END END AS content
             FROM zd)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN dictunk THEN 'unsupported'
                  WHEN trunc THEN 'truncated'
                  WHEN badsum OR reserved THEN 'bad_data'
                  ELSE 'ok' END AS status,
             CASE WHEN isok THEN CAST(CASE WHEN dictok THEN 1
               WHEN mode = 6 THEN 2 ELSE 1 END AS INT) END AS n_blocks,
             CASE WHEN isok THEN CAST(CASE WHEN hassum THEN 1 ELSE 0
               END AS INT) END AS has_checksum,
             CASE WHEN isok THEN CAST(length(content) AS INT)
               END AS n_bytes,
             CASE WHEN isok THEN md5(content) END AS content_md5
      FROM zc ORDER BY doc_id""",
    // .jsonl.zst twin: k, the skippable flag, and the truncation arm
    // from the hash bytes; the rebuilt text is the original text by
    // construction (contiguous word chunks re-joined in id order), so
    // the hash gate proves the whole transport+JSON round trip.
    "q_zstd_jsonl" -> s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      jb AS (SELECT doc_id, text, ${byteAt(1)} AS b1, ${byteAt(7)} AS b7,
               ${byteAt(10)} AS b10
             FROM hx),
      jd AS (SELECT doc_id, text,
               least(2 + b1 % 3,
                 greatest(1, len(list_filter(string_split(text, ' '),
                   x -> x <> '')))) AS k,
               b7 % 2 = 0 AS sk, b10 % 8 = 1 AS trunc
             FROM jb)
      SELECT doc_id,
             CASE WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN trunc THEN NULL
                  ELSE CAST(CASE WHEN sk THEN 2 ELSE 1 END AS INT)
                  END AS n_frames,
             CAST(CASE WHEN trunc THEN 0 ELSE k END AS BIGINT)
               AS n_records,
             CASE WHEN trunc THEN NULL ELSE md5(text) END AS rebuilt_md5
      FROM jd ORDER BY doc_id""",
    "q_multimodal_decode_gzip" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(2)} AS b2, ${byteAt(9)} AS b9,
               ${byteAt(12)} AS b12, ${byteAt(14)} AS b14, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b12 % 16 = 1 AS badmagic,
               CASE WHEN b9 % 4 = 2 THEN 1 ELSE 0 END AS hasname,
               b14 % 8 = 5 AS trunc, b15 % 16 = 9 AS badcrc,
               1 + b2 % 3 AS k,
               list_sum(list_transform(generate_series(1, 32),
                 i -> ascii(substr(h, i, 1)))) AS hsum
            FROM b)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated'
                  WHEN badcrc THEN 'bad_data' ELSE 'ok' END AS status,
             CASE WHEN badmagic OR trunc THEN NULL
                  ELSE CAST(hasname AS INT) END AS has_name,
             CASE WHEN badmagic OR trunc OR badcrc THEN NULL
                  ELSE CAST(66 * k AS INT) END AS n_bytes,
             CASE WHEN badmagic OR trunc OR badcrc THEN NULL
                  ELSE CAST(k * (2 * hsum + 64) AS BIGINT) END AS sum_bytes,
             CASE WHEN badmagic OR trunc OR badcrc THEN NULL
                  ELSE CAST(2 * k AS BIGINT) END AS n_sep,
             CASE WHEN badmagic OR trunc OR badcrc THEN NULL
                  ELSE ascii(substr(h, 1, 1)) END AS first_byte
      FROM d ORDER BY doc_id""",
    // ZIP twin: the member fan-out recomputed from the md5 pure
    // functions — member count n = 1 + b0 % 3, per-member text
    // (h ++ ':' ++ m ++ ' ') × k gives n_bytes = 35k, sum =
    // k·(Σascii(h) + 138 + m), seps = k; the failure arms from the
    // same bytes the synthesizer uses. The oracle never sees the
    // archive bytes, so a hash match proves the whole container walk.
    "q_archive_ingest" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(2)} AS b2,
              ${byteAt(3)} AS b3, ${byteAt(4)} AS b4, ${byteAt(5)} AS b5,
              ${byteAt(6)} AS b6, ${byteAt(7)} AS b7, ${byteAt(11)} AS b11,
              ${byteAt(12)} AS b12, ${byteAt(13)} AS b13, ${byteAt(14)} AS b14
            FROM hx),
      d AS (SELECT doc_id, 1 + b0 % 3 AS n,
              b12 % 8 = 6 AS trunc, b11 % 16 = 3 AS badeocd,
              b13 % 8 = 2 AS badcd, b14 % 8 = 1 AS baddata,
              [1 + b5 % 3, 1 + b6 % 3, 1 + b7 % 3] AS ks,
              [b2 % 2, b3 % 2, b4 % 2] AS ms,
              list_sum(list_transform(generate_series(1, 32),
                i -> ascii(substr(h, i, 1)))) AS hsum
            FROM b),
      fail AS (SELECT doc_id, CAST(-1 AS INT) AS member,
                 CASE WHEN trunc THEN 'truncated'
                      WHEN badeocd THEN 'bad_eocd'
                      ELSE 'bad_cd' END AS status,
                 CAST(NULL AS VARCHAR) AS name,
                 CAST(NULL AS VARCHAR) AS method,
                 CAST(NULL AS INT) AS n_bytes,
                 CAST(NULL AS BIGINT) AS sum_bytes,
                 CAST(NULL AS BIGINT) AS n_sep
               FROM d WHERE trunc OR badeocd OR badcd),
      ex AS (SELECT doc_id, baddata, ks, ms, hsum,
               unnest(generate_series(0, n - 1)) AS m
             FROM d WHERE NOT (trunc OR badeocd OR badcd)),
      mem AS (SELECT doc_id, CAST(m AS INT) AS member,
                CASE WHEN baddata AND m = 0 THEN 'bad_data'
                     ELSE 'ok' END AS status,
                'm' || m || '.txt' AS name,
                CASE WHEN ms[m + 1] = 1 THEN 'deflate'
                     ELSE 'stored' END AS method,
                CASE WHEN baddata AND m = 0 THEN NULL
                     ELSE CAST(35 * ks[m + 1] AS INT) END AS n_bytes,
                CASE WHEN baddata AND m = 0 THEN NULL
                     ELSE CAST(ks[m + 1] * (hsum + 138 + m) AS BIGINT)
                     END AS sum_bytes,
                CASE WHEN baddata AND m = 0 THEN NULL
                     ELSE CAST(ks[m + 1] AS BIGINT) END AS n_sep
              FROM ex)
      SELECT * FROM fail UNION ALL SELECT * FROM mem
      ORDER BY doc_id, member""",
    // TAR twin: the member census re-derived from the md5 pure
    // functions (the archive-ingest oracle discipline — the oracle
    // never sees the bytes, so a hash match proves the real 512-byte
    // header walk, checksum arithmetic, octal parse, prefix join, and
    // both stop-with-a-row arms). Same payload-text stats arithmetic
    // as the ZIP twin (35k bytes, k·(hsum+138+m) sum, k separators).
    "q_archive_ingest_tar" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(5)} AS b5,
              ${byteAt(6)} AS b6, ${byteAt(7)} AS b7, ${byteAt(11)} AS b11,
              ${byteAt(12)} AS b12, ${byteAt(14)} AS b14, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, 1 + b0 % 3 AS n,
              b12 % 8 = 6 AS trunc, b11 % 16 = 3 AS badchk,
              b14 % 8 = 1 AS shortd, b15 % 4 = 0 AS pfx, b15 % 10 AS pdig,
              [1 + b5 % 3, 1 + b6 % 3, 1 + b7 % 3] AS ks,
              list_sum(list_transform(generate_series(1, 32),
                i -> ascii(substr(h, i, 1)))) AS hsum
            FROM b),
      fail AS (SELECT doc_id,
                 CAST(CASE WHEN trunc THEN -1 ELSE 0 END AS INT) AS member,
                 CASE WHEN trunc THEN 'truncated'
                      ELSE 'bad_checksum' END AS status,
                 CAST(NULL AS VARCHAR) AS name,
                 CAST(NULL AS INT) AS n_bytes,
                 CAST(NULL AS BIGINT) AS sum_bytes,
                 CAST(NULL AS BIGINT) AS n_sep
               FROM d WHERE trunc OR badchk),
      ex AS (SELECT doc_id, n, shortd, pfx, pdig, ks, hsum,
               unnest(generate_series(0, n - 1)) AS m
             FROM d WHERE NOT trunc AND NOT badchk),
      mem AS (SELECT doc_id, CAST(m AS INT) AS member,
                CASE WHEN shortd AND m = n - 1 THEN 'short_data'
                     ELSE 'ok' END AS status,
                CASE WHEN m = 1 AND pfx THEN 'd' || pdig || '/m1.txt'
                     ELSE 'm' || m || '.txt' END AS name,
                CASE WHEN shortd AND m = n - 1 THEN NULL
                     ELSE CAST(35 * ks[m + 1] AS INT) END AS n_bytes,
                CASE WHEN shortd AND m = n - 1 THEN NULL
                     ELSE CAST(ks[m + 1] * (hsum + 138 + m) AS BIGINT)
                     END AS sum_bytes,
                CASE WHEN shortd AND m = n - 1 THEN NULL
                     ELSE CAST(ks[m + 1] AS BIGINT) END AS n_sep
              FROM ex)
      SELECT * FROM fail UNION ALL SELECT * FROM mem
      ORDER BY doc_id, member""",
    // .tar.gz twin: the tar member census behind the two gzip-layer
    // arm predicates (magic read first, so it wins over the CRC arm).
    // The oracle never sees compressed OR inflated bytes — a hash
    // match proves the gzip header walk, the DEFLATE round trip over
    // the whole archive, the CRC-32/ISIZE footer checks, AND the
    // unchanged ustar walk beneath them.
    "q_archive_ingest_tgz" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(5)} AS b5,
              ${byteAt(6)} AS b6, ${byteAt(7)} AS b7, ${byteAt(8)} AS b8,
              ${byteAt(9)} AS b9, ${byteAt(11)} AS b11, ${byteAt(12)} AS b12,
              ${byteAt(14)} AS b14, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, 1 + b0 % 3 AS n,
              b8 % 16 = 5 AS gbad, b9 % 16 = 7 AS gcrc,
              b12 % 8 = 6 AS trunc, b11 % 16 = 3 AS badchk,
              b14 % 8 = 1 AS shortd, b15 % 4 = 0 AS pfx, b15 % 10 AS pdig,
              [1 + b5 % 3, 1 + b6 % 3, 1 + b7 % 3] AS ks,
              list_sum(list_transform(generate_series(1, 32),
                i -> ascii(substr(h, i, 1)))) AS hsum
            FROM b),
      gfail AS (SELECT doc_id, CAST(-1 AS INT) AS member,
                  CASE WHEN gbad THEN 'gzip_bad_magic'
                       ELSE 'gzip_bad_data' END AS status,
                  CAST(NULL AS VARCHAR) AS name,
                  CAST(NULL AS INT) AS n_bytes,
                  CAST(NULL AS BIGINT) AS sum_bytes,
                  CAST(NULL AS BIGINT) AS n_sep
                FROM d WHERE gbad OR gcrc),
      t AS (SELECT * FROM d WHERE NOT gbad AND NOT gcrc),
      fail AS (SELECT doc_id,
                 CAST(CASE WHEN trunc THEN -1 ELSE 0 END AS INT) AS member,
                 CASE WHEN trunc THEN 'truncated'
                      ELSE 'bad_checksum' END AS status,
                 CAST(NULL AS VARCHAR) AS name,
                 CAST(NULL AS INT) AS n_bytes,
                 CAST(NULL AS BIGINT) AS sum_bytes,
                 CAST(NULL AS BIGINT) AS n_sep
               FROM t WHERE trunc OR badchk),
      ex AS (SELECT doc_id, n, shortd, pfx, pdig, ks, hsum,
               unnest(generate_series(0, n - 1)) AS m
             FROM t WHERE NOT trunc AND NOT badchk),
      mem AS (SELECT doc_id, CAST(m AS INT) AS member,
                CASE WHEN shortd AND m = n - 1 THEN 'short_data'
                     ELSE 'ok' END AS status,
                CASE WHEN m = 1 AND pfx THEN 'd' || pdig || '/m1.txt'
                     ELSE 'm' || m || '.txt' END AS name,
                CASE WHEN shortd AND m = n - 1 THEN NULL
                     ELSE CAST(35 * ks[m + 1] AS INT) END AS n_bytes,
                CASE WHEN shortd AND m = n - 1 THEN NULL
                     ELSE CAST(ks[m + 1] * (hsum + 138 + m) AS BIGINT)
                     END AS sum_bytes,
                CASE WHEN shortd AND m = n - 1 THEN NULL
                     ELSE CAST(ks[m + 1] AS BIGINT) END AS n_sep
              FROM ex)
      SELECT * FROM gfail UNION ALL SELECT * FROM fail
      UNION ALL SELECT * FROM mem
      ORDER BY doc_id, member""",
    // Member-dedup twin: the member census re-derived from md5 pure
    // functions, the member TEXT reconstructed literally (repeat of
    // h:m — the zipBytes payload), so the distinct-text census pins
    // the real inflate round trip byte for byte.
    "q_archive_member_dedup" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(5)} AS b5,
              ${byteAt(6)} AS b6, ${byteAt(7)} AS b7, ${byteAt(11)} AS b11,
              ${byteAt(12)} AS b12, ${byteAt(13)} AS b13, ${byteAt(14)} AS b14
            FROM hx),
      d AS (SELECT doc_id, h, 1 + b0 % 3 AS n,
              b12 % 8 = 6 AS trunc, b11 % 16 = 3 AS badeocd,
              b13 % 8 = 2 AS badcd, b14 % 8 = 1 AS baddata,
              [1 + b5 % 3, 1 + b6 % 3, 1 + b7 % 3] AS ks
            FROM b),
      fail AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS text, 0 AS ok
               FROM d WHERE trunc OR badeocd OR badcd),
      ex AS (SELECT doc_id, h, baddata, ks,
               unnest(generate_series(0, n - 1)) AS m
             FROM d WHERE NOT (trunc OR badeocd OR badcd)),
      mem AS (SELECT doc_id,
                CASE WHEN baddata AND m = 0 THEN NULL
                     ELSE repeat(h || ':' || CAST(m AS VARCHAR) || ' ',
                            ks[m + 1]) END AS text,
                CASE WHEN baddata AND m = 0 THEN 0 ELSE 1 END AS ok
              FROM ex),
      a AS (SELECT * FROM fail UNION ALL SELECT * FROM mem)
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_blobs,
             CAST(count(*) AS BIGINT) AS n_member_rows,
             CAST(sum(ok) AS BIGINT) AS n_ok_members,
             CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
             CAST(sum(ok) AS BIGINT) - CAST(count(DISTINCT text) AS BIGINT)
               AS n_dup_members
      FROM a""",
    // CLIP-gate twin: the image side re-derived from the md5 pure
    // functions (the PPM oracle's raster arithmetic), the text side
    // the shared quantized-embedding CTE folded to 3 block sums, the
    // same 4-dp cosine and micro-unit mean discipline.
    "q_clip_filter" -> ("WITH " + Dedup.QE + s""",
      hx AS (SELECT doc_id, source, md5(text) AS h FROM documents),
      cb AS (SELECT doc_id, source, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                    ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
             FROM hx),
      cd AS (SELECT doc_id, source, h, b13 % 16 = 0 AS badmagic,
                    b15 % 8 = 0 AS trunc, 1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
             FROM cb),
      cr AS (SELECT doc_id, source, badmagic, trunc, w, hh,
               list_transform(generate_series(0, w * hh * 3 - 1), i ->
                 (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                 (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS raster
             FROM cd),
      ci AS (SELECT doc_id, source,
               CASE WHEN badmagic THEN 'bad_magic'
                    WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
               CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
                 list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+1])) AS BIGINT) END AS r_sum,
               CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
                 list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+2])) AS BIGINT) END AS g_sum,
               CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
                 list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+3])) AS BIGINT) END AS b_sum
             FROM cr),
      ct AS (SELECT vec_id,
               CAST(list_sum(list_transform(generate_series(1, 21), i -> q[i])) AS BIGINT) AS t1,
               CAST(list_sum(list_transform(generate_series(22, 42), i -> q[i])) AS BIGINT) AS t2,
               CAST(list_sum(list_transform(generate_series(43, 64), i -> q[i])) AS BIGINT) AS t3
             FROM qn),
      cj AS (SELECT ci.*, ct.vec_id, ct.t1, ct.t2, ct.t3,
               ci.r_sum * ci.r_sum + ci.g_sum * ci.g_sum + ci.b_sum * ci.b_sum AS in2,
               ct.t1 * ct.t1 + ct.t2 * ct.t2 + ct.t3 * ct.t3 AS tn2
             FROM ci LEFT JOIN ct ON ci.doc_id = ct.vec_id),
      cs AS (SELECT *,
               (status = 'ok' AND vec_id IS NOT NULL AND in2 > 0 AND tn2 > 0) AS scorable
             FROM cj),
      cu AS (SELECT *, CASE WHEN scorable THEN CAST(round(round(
               CAST(r_sum * t1 + g_sum * t2 + b_sum * t3 AS DOUBLE) /
               sqrt(CAST(in2 AS DOUBLE)) / sqrt(CAST(tn2 AS DOUBLE)), 4)
               * 10000.0) AS BIGINT) END AS cos_u
             FROM cs)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_img_ok,
             CAST(sum(CASE WHEN scorable THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
             CAST(sum(CASE WHEN scorable AND cos_u >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CASE WHEN sum(CASE WHEN scorable THEN 1 ELSE 0 END) > 0 THEN
               round(CAST(sum(CASE WHEN scorable AND cos_u >= 1000 THEN 1 ELSE 0 END) AS DOUBLE) /
                     CAST(sum(CASE WHEN scorable THEN 1 ELSE 0 END) AS DOUBLE), 4) END AS kept_frac,
             CASE WHEN sum(CASE WHEN scorable THEN 1 ELSE 0 END) > 0 THEN
               round(CAST(sum(CASE WHEN scorable THEN cos_u ELSE 0 END) AS DOUBLE) /
                     CAST(sum(CASE WHEN scorable THEN 1 ELSE 0 END) AS DOUBLE) / 10000.0, 4) END AS mean_cos
      FROM cu GROUP BY source ORDER BY source"""),
    // Video twin: kept frames, per-frame dimensions, and channel sums
    // recomputed from the md5 pure functions (raster byte j of frame
    // f = b[(f+j)%16], so r_sum folds bytes at f+3p). The oracle
    // never sees the stream, so a hash match proves the per-frame
    // header re-parse, the raster hop arithmetic, and both
    // stop-with-a-row arms.
    "q_video_framesample" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(13)} AS b13,
              ${byteAt(14)} AS b14 FROM hx),
      d AS (SELECT doc_id, h, 2 + b0 % 8 AS nf,
              b13 % 16 = 4 AS badmid,
              (b13 % 16 <> 4) AND b14 % 8 = 3 AS trunc
            FROM b),
      fr AS (SELECT doc_id, h, nf, badmid, trunc,
               unnest(generate_series(0, nf - 1)) AS f FROM d),
      g AS (SELECT doc_id, h, nf, badmid, trunc, CAST(f AS INT) AS f,
              1 + ${byteAtE("f + 1")} % 4 AS w,
              1 + ${byteAtE("f + 2")} % 4 AS hh
            FROM fr),
      kept AS (SELECT *,
          CASE WHEN badmid AND f = 1 THEN 'bad_magic'
               WHEN trunc AND f = nf - 1 THEN 'truncated'
               ELSE 'ok' END AS status
        FROM g
        WHERE (badmid AND f <= 1)
           OR (trunc AND (f = nf - 1 OR (f % 2 = 0 AND f < nf - 1)))
           OR (NOT badmid AND NOT trunc AND f % 2 = 0))
      SELECT doc_id, f AS frame, status,
        CASE WHEN status = 'bad_magic' THEN NULL
             ELSE CAST(w AS INT) END AS width,
        CASE WHEN status = 'bad_magic' THEN NULL
             ELSE CAST(hh AS INT) END AS height,
        CASE WHEN status = 'ok' THEN CAST(list_sum(list_transform(
          generate_series(0, w * hh - 1), p -> ${byteAtE("f + 3 * p")}))
          AS BIGINT) END AS r_sum,
        CASE WHEN status = 'ok' THEN CAST(list_sum(list_transform(
          generate_series(0, w * hh - 1), p -> ${byteAtE("f + 3 * p + 1")}))
          AS BIGINT) END AS g_sum,
        CASE WHEN status = 'ok' THEN CAST(list_sum(list_transform(
          generate_series(0, w * hh - 1), p -> ${byteAtE("f + 3 * p + 2")}))
          AS BIGINT) END AS b_sum
      FROM kept ORDER BY doc_id, frame""",
    // WARC-ingest twin: the funnel recomputed entirely from the md5
    // pure functions — decode arms from the failure bits, the URL from
    // the SHARED synth SQL, canonicalization by the q_dedup_url rules.
    // The twin never touches compressed bytes, so a hash match proves
    // the record round trip AND that the JVM urlSynth mirror agrees
    // with the SQL expression character-for-character.
    "q_warc_ingest" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      bb AS (SELECT doc_id, h, ${byteAt(2)} AS b2, ${byteAt(12)} AS b12,
                ${byteAt(14)} AS b14, ${byteAt(15)} AS b15
             FROM hx),
      dd AS (SELECT doc_id, h, b12 % 16 = 1 AS badmagic, b14 % 8 = 5 AS trunc,
                b15 % 16 = 9 AS badcrc, 1 + b2 % 3 AS k
             FROM bb),
      okr AS (SELECT doc_id, h, k FROM dd
              WHERE NOT badmagic AND NOT trunc AND NOT badcrc),
      u AS (SELECT doc_id, k, ${Dedup.urlSynthSql} AS url FROM okr),
      ${Dedup.urlCanonCtes(", k")},
      m AS (SELECT
        (SELECT count(*) FROM dd) AS fetched,
        (SELECT count(*) FROM okr) AS decoded,
        (SELECT count(*) FROM c WHERE k >= 2) AS min_length,
        (SELECT count(DISTINCT canon) FROM c WHERE k >= 2) AS unique_url)
      SELECT CAST(1 AS INT) AS stage_no, 'fetched' AS stage, fetched AS n_docs FROM m
      UNION ALL SELECT CAST(2 AS INT), 'decoded', decoded FROM m
      UNION ALL SELECT CAST(3 AS INT), 'min_length', min_length FROM m
      UNION ALL SELECT CAST(4 AS INT), 'unique_url', unique_url FROM m
      ORDER BY stage_no""",
    // Crawl-pipeline twin: every stage re-derived from (text, md5
    // bits) — decode arms from the failure bytes, body = the PII
    // synth over the ORIGINAL text (a hash match therefore proves the
    // Spark side's real gzip round trip reproduced the text exactly),
    // mask/gopher/canon/keeper/chunk arithmetic mirrored stage for
    // stage (windows ordered survivors-first, doc_id tiebreak).
    "q_pipeline_crawl" -> {
      val T = graft.ops.TextOps
      val nRedDuck = Seq(T.piiEmailRe, T.piiPhoneRe, T.piiIpRe)
        .map(re => s"len(regexp_extract_all(body, '$re'))")
        .mkString(" + ")
      s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      arms AS (SELECT doc_id, text, h,
                 ${byteAt(12)} % 16 = 1 AS badmagic,
                 ${byteAt(14)} % 8 = 5 AS trunc,
                 ${byteAt(15)} % 16 = 9 AS badcrc
               FROM hx),
      dec AS (SELECT doc_id, h,
                NOT (badmagic OR trunc OR badcrc) AS ok,
                CASE WHEN NOT (badmagic OR trunc OR badcrc)
                     THEN ${T.piiSynthSql} END AS body,
                CASE WHEN NOT (badmagic OR trunc OR badcrc)
                     THEN ${Dedup.urlSynthSql} END AS url
              FROM arms),
      msk AS (SELECT doc_id, ok, url,
                CASE WHEN ok THEN $nRedDuck ELSE 0 END AS n_red,
                CASE WHEN ok THEN ${T.piiMaskSqlDuck("body")} END AS body_m
              FROM dec),
      tok AS (SELECT *, list_filter(string_split(coalesce(body_m, ''), ' '),
                          x -> x <> '') AS t
              FROM msk),
      gpr AS (SELECT *,
                CASE WHEN len(t) >= 2 THEN
                  list_transform(generate_series(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i + 1]) ELSE [] END AS g2,
                CASE WHEN len(t) >= 3 THEN
                  list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) ELSE [] END AS g3
              FROM tok),
      gsc AS (SELECT doc_id, ok, url, n_red, body_m,
                CAST(len(t) AS INT) AS n_tokens,
                round(CAST(list_max(list_transform(list_distinct(t),
                  w -> len(list_filter(t, x -> x = w)))) AS DOUBLE) /
                  CAST(len(t) AS DOUBLE), 4) AS top_word_frac,
                CAST(CASE WHEN len(t) >= 3 THEN
                  round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) /
                    CAST(len(g2) AS DOUBLE), 4)
                  ELSE 0.0 END AS DOUBLE) AS dup_2gram_frac,
                CAST(CASE WHEN len(t) >= 4 THEN
                  round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) /
                    CAST(len(g3) AS DOUBLE), 4)
                  ELSE 0.0 END AS DOUBLE) AS dup_3gram_frac
              FROM gpr),
      u AS (SELECT doc_id, ok, n_red, n_tokens,
              (ok AND coalesce(top_word_frac <= 0.2
                AND dup_2gram_frac <= 0.2
                AND dup_3gram_frac <= 0.2, false)) AS s_gopher,
              md5(body_m) AS chash, url
            FROM gsc),
      ${Dedup.urlCanonCtes(", ok, n_red, n_tokens, s_gopher, chash")},
      r1 AS (SELECT *, CAST(row_number() OVER (
               PARTITION BY coalesce(canon, 'fail:' || doc_id)
               ORDER BY s_gopher DESC, doc_id) AS INT) AS rn_url FROM c),
      r2 AS (SELECT *, (s_gopher AND rn_url = 1) AS s_url FROM r1),
      r3 AS (SELECT *, CAST(row_number() OVER (
               PARTITION BY coalesce(chash, 'fail:' || doc_id)
               ORDER BY s_url DESC, doc_id) AS INT) AS rn_txt FROM r2),
      r4 AS (SELECT *, (s_url AND rn_txt = 1) AS s_exact,
               CASE WHEN s_url AND rn_txt = 1
                 THEN CAST((n_tokens + 15) // 16 AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS n_chunks
             FROM r3),
      agg AS (SELECT count(*) AS fetched,
                CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS decoded,
                CAST(sum(CASE WHEN ok AND n_red > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
                CAST(sum(CASE WHEN s_gopher THEN 1 ELSE 0 END) AS BIGINT) AS gopher_keep,
                CAST(sum(CASE WHEN s_url THEN 1 ELSE 0 END) AS BIGINT) AS url_unique,
                CAST(sum(CASE WHEN s_exact THEN 1 ELSE 0 END) AS BIGINT) AS exact_unique,
                CAST(sum(n_chunks) AS BIGINT) AS chunks
              FROM r4)
      SELECT CAST(1 AS INT) AS stage_no, 'fetched' AS stage, fetched AS n_docs FROM agg
      UNION ALL SELECT CAST(2 AS INT), 'decoded', decoded FROM agg
      UNION ALL SELECT CAST(3 AS INT), 'pii_docs', pii_docs FROM agg
      UNION ALL SELECT CAST(4 AS INT), 'gopher_keep', gopher_keep FROM agg
      UNION ALL SELECT CAST(5 AS INT), 'url_unique', url_unique FROM agg
      UNION ALL SELECT CAST(6 AS INT), 'exact_unique', exact_unique FROM agg
      UNION ALL SELECT CAST(7 AS INT), 'chunks', chunks FROM agg
      ORDER BY stage_no"""
    },
    // Resize twin: identical raster reconstruction, then the SAME
    // integer NN index map ((out·in) // out_dim) picks the 4 sampled
    // pixels; top_left pins the rounding direction.
    "q_multimodal_resize_real" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                   ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b13 % 16 = 0 AS badmagic, b15 % 8 = 0 AS trunc,
                   1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b),
      r AS (SELECT doc_id, badmagic, trunc, w, hh,
              list_transform(generate_series(0, w * hh * 3 - 1), i ->
                (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS raster
            FROM d),
      sm AS (SELECT doc_id, badmagic, trunc, w, hh, raster,
               list_transform(generate_series(0, 3), k ->
                 ((k // 2) * hh // 2) * w + ((k % 2) * w // 2)) AS idx
             FROM r)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic OR trunc THEN NULL
                  ELSE CAST(2 AS INT) END AS out_w,
             CASE WHEN badmagic OR trunc THEN NULL
                  ELSE CAST(2 AS INT) END AS out_h,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(idx, i -> raster[3*i+1])) AS BIGINT) END AS r_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(idx, i -> raster[3*i+2])) AS BIGINT) END AS g_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(idx, i -> raster[3*i+3])) AS BIGINT) END AS b_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE
               CAST(raster[1] * 65536 + raster[2] * 256 + raster[3] AS BIGINT)
             END AS top_left
      FROM sm ORDER BY doc_id""",
    // HTML-extraction twin: the block census and kept text re-derived
    // from (text, md5 bits) pure functions — boilerplate blocks are
    // all < 5 words by construction, so kept text is exactly the
    // ≥5-word halves of the token-midpoint split; the oracle never
    // sees the page, so a hash match proves the tag walk, the
    // script/comment skips, the entity decode, and the block
    // reassembly all round-trip.
    "q_html_extract" -> s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, text, ${byteAt(8)} AS b8, ${byteAt(9)} AS b9,
                   ${byteAt(12)} AS b12
            FROM hx),
      d AS (SELECT doc_id,
              array_to_string(list_filter(string_split(text, ' '),
                x -> x <> ''), ' ') AS t,
              b8 % 8 = 3 AS plain, b12 % 8 = 7 AS trunc,
              b9 % 4 = 1 AS scr
            FROM b),
      e AS (SELECT doc_id, plain, trunc, scr, t,
              len(string_split(t, ' ')) AS nw,
              (len(string_split(t, ' ')) + 1) // 2 AS n1
            FROM d),
      f AS (SELECT doc_id, plain, trunc, scr, t, nw, n1, nw - n1 AS n2,
              array_to_string(string_split(t, ' ')[1:n1], ' ') AS p1,
              array_to_string(string_split(t, ' ')[n1+1:nw], ' ') AS p2
            FROM e)
      SELECT doc_id,
        CASE WHEN plain THEN 'no_markup'
             WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
        CAST(CASE WHEN plain THEN CASE WHEN nw > 0 THEN 1 ELSE 0 END
             ELSE 4 + (CASE WHEN n2 > 0 THEN 1 ELSE 0 END) END AS INT)
          AS n_blocks,
        CAST(CASE WHEN plain THEN CASE WHEN nw >= 5 THEN 1 ELSE 0 END
             ELSE (CASE WHEN n1 >= 5 THEN 1 ELSE 0 END) +
                  (CASE WHEN n2 >= 5 THEN 1 ELSE 0 END) END AS INT)
          AS n_kept,
        CAST(CASE WHEN NOT plain AND scr THEN 1 ELSE 0 END AS INT)
          AS n_script,
        CASE WHEN plain THEN (CASE WHEN nw >= 5 THEN md5(t) END)
             WHEN n1 >= 5 AND n2 >= 5 THEN md5(t)
             WHEN n1 >= 5 THEN md5(p1)
             WHEN n2 >= 5 THEN md5(p2)
             END AS kept_hash
      FROM f ORDER BY doc_id""",
    // Full-fidelity funnel twin: both layers' arm predicates plus the
    // token-split content rule, re-derived from (text, md5) pure
    // functions — the oracle never sees compressed bytes OR markup.
    // Mixed-funnel twin: routes and per-route verdicts recomputed
    // from the arm bytes and the doc text's word count alone — the
    // PDF arm chain mirrors the q_pdf_extract model, the HTML side
    // the q_crawl_html_funnel model, and mislabeled plain pages fall
    // into the text gate exactly as the first-byte sniff dictates.
    "q_crawl_mixed_funnel" -> s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      mb AS (SELECT doc_id, text, ${byteAt(7)} AS b7, ${byteAt(8)} AS b8,
               ${byteAt(9)} AS b9,
               ${byteAt(11)} AS b11, ${byteAt(12)} AS b12,
               ${byteAt(13)} AS b13, ${byteAt(14)} AS b14,
               ${byteAt(15)} AS b15
             FROM hx),
      md AS (SELECT doc_id, b7 % 3 AS fmt,
               b11 % 16 = 7 OR (b11 % 16 <> 7 AND b13 % 8 = 6)
                 OR (b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 = 5)
                 OR (b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 <> 5
                     AND b15 % 8 = 1)
                 OR (b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 <> 5
                     AND b15 % 8 <> 1 AND b14 % 8 = 3)
                 OR (b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 <> 5
                     AND b15 % 8 <> 1 AND b14 % 8 <> 3 AND b9 % 8 = 5)
                 AS pdfbad,
               b8 % 8 = 3 AS hplain, b12 % 8 = 7 AS htrunc,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS nw
             FROM mb),
      mr AS (SELECT doc_id,
               CASE WHEN fmt = 0 THEN 'pdf'
                    WHEN fmt = 1 AND NOT hplain THEN 'html'
                    ELSE 'text' END AS route,
               CASE WHEN fmt = 0 THEN
                      CASE WHEN pdfbad THEN 0 ELSE 1 END
                    WHEN fmt = 1 AND NOT hplain THEN
                      CASE WHEN htrunc THEN 0 ELSE 1 END
                    ELSE 1 END AS ok,
               CASE WHEN fmt = 0 THEN
                      CASE WHEN pdfbad THEN 0 ELSE 1 END
                    WHEN fmt = 1 AND NOT hplain THEN
                      CASE WHEN (nw + 1) // 2 >= 5
                           OR nw - (nw + 1) // 2 >= 5 THEN 1 ELSE 0 END
                    ELSE CASE WHEN nw >= 5 THEN 1 ELSE 0 END
               END AS has_content
             FROM md)
      SELECT route, count(*) AS n_docs,
             CAST(sum(ok) AS BIGINT) AS n_ok,
             CAST(sum(has_content) AS BIGINT) AS n_content
      FROM mr GROUP BY 1 ORDER BY route""",
    "q_crawl_html_funnel" -> s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, text, ${byteAt(8)} AS b8, ${byteAt(12)} AS b12,
                   ${byteAt(14)} AS b14, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id,
              NOT (b12 % 16 = 1) AND NOT (b14 % 8 = 5)
                AND NOT (b15 % 16 = 9) AS decoded,
              b8 % 8 = 3 AS plain, b12 % 8 = 7 AS htrunc,
              len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS nw
            FROM b),
      e AS (SELECT doc_id, decoded, plain, htrunc, nw,
              (nw + 1) // 2 AS n1, nw - (nw + 1) // 2 AS n2
            FROM d)
      SELECT CAST(count(*) AS BIGINT) AS n_fetched,
        CAST(sum(CASE WHEN decoded THEN 1 ELSE 0 END) AS BIGINT)
          AS n_decoded,
        CAST(sum(CASE WHEN decoded AND NOT plain AND NOT htrunc
          THEN 1 ELSE 0 END) AS BIGINT) AS n_html_ok,
        CAST(sum(CASE WHEN decoded AND plain THEN 1 ELSE 0 END) AS BIGINT)
          AS n_no_markup,
        CAST(sum(CASE WHEN decoded AND NOT plain AND htrunc
          THEN 1 ELSE 0 END) AS BIGINT) AS n_html_truncated,
        CAST(sum(CASE WHEN decoded AND ((plain AND nw >= 5) OR
          (NOT plain AND (n1 >= 5 OR n2 >= 5))) THEN 1 ELSE 0 END)
          AS BIGINT) AS n_with_content
      FROM e""",
    // Near-dup twin: the phash CTE chain, the SAME four-band candidate
    // rule, xor/bit_count verify, and the per-image degree census.
    "q_dedup_image_phash_near" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                   ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b13 % 16 = 0 AS badmagic, b15 % 8 = 0 AS trunc,
                   1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b WHERE NOT (b13 % 16 = 0) AND NOT (b15 % 8 = 0)),
      r AS (SELECT doc_id, w, hh,
              list_transform(generate_series(0, w * hh * 3 - 1), i ->
                (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS raster
            FROM d),
      g AS (SELECT doc_id,
              list_transform(generate_series(0, 71), k ->
                raster[3*(((k // 9) * hh // 8) * w + ((k % 9) * w // 9)) + 1]
                + raster[3*(((k // 9) * hh // 8) * w + ((k % 9) * w // 9)) + 2]
                + raster[3*(((k // 9) * hh // 8) * w + ((k % 9) * w // 9)) + 3]
              ) AS grays
            FROM r),
      p AS (SELECT doc_id,
              CAST(list_sum(list_transform(generate_series(32, 63), k ->
                CASE WHEN grays[(k // 8) * 9 + (k % 8) + 1] <
                          grays[(k // 8) * 9 + (k % 8) + 2]
                     THEN (1::BIGINT << (k - 32)) ELSE 0 END)) AS BIGINT)
                AS hi,
              CAST(list_sum(list_transform(generate_series(0, 31), k ->
                CASE WHEN grays[(k // 8) * 9 + (k % 8) + 1] <
                          grays[(k // 8) * 9 + (k % 8) + 2]
                     THEN (1::BIGINT << k) ELSE 0 END)) AS BIGINT) AS lo
            FROM g),
      bands AS (SELECT doc_id, hi, lo, band,
                  CASE band WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                            WHEN 2 THEN hi % 65536 ELSE hi // 65536
                  END AS bkey
                FROM p, (SELECT unnest(generate_series(0, 3)) AS band)),
      pr AS (SELECT DISTINCT a.doc_id AS da, c.doc_id AS db,
                    a.hi AS ha, a.lo AS la, c.hi AS hb, c.lo AS lb
             FROM bands a JOIN bands c
               ON a.band = c.band AND a.bkey = c.bkey
                  AND a.doc_id < c.doc_id),
      np AS (SELECT da, db FROM pr
             WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 8),
      deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near,
                     CAST(min(peer) AS BIGINT) AS min_peer
              FROM (SELECT da AS doc_id, db AS peer FROM np
                    UNION ALL SELECT db, da FROM np)
              GROUP BY doc_id)
      SELECT p.doc_id, CAST(coalesce(deg.n_near, 0) AS BIGINT) AS n_near,
             deg.min_peer
      FROM p LEFT JOIN deg ON p.doc_id = deg.doc_id
      ORDER BY p.doc_id""",
    // dHash twin: raster rebuilt from the md5 pure functions, the 8×9
    // gray grid via the SAME out·in div out_dim index map, both hash
    // halves packed with sub-sign-bit shifts, and the keeper census
    // as a window over (status, hash) — the whole decode→hash→dedup
    // chain pinned value-exact without the oracle ever seeing bytes.
    // Oriented-dHash twin: the shared per-pixel JPEG model, the Exif
    // orientation byte model, the INVERSE index maps at the 9×8
    // sampling grid, then the same bit packing and keeper census.
    "q_dedup_image_phash_oriented" -> (jpegPixelCtes + s""",
      ob2 AS (SELECT doc_id, ${byteAt(3)} AS ob3, ${byteAt(5)} AS ob5,
               ${byteAt(6)} AS ob6
             FROM hx),
      ori2 AS (SELECT jd.doc_id, w, hh, badmagic, prec12, trunc,
                CASE WHEN NOT badmagic AND ob6 % 8 <> 1 AND ob5 % 8 <> 2
                     THEN 1 + ob3 % 8 ELSE 1 END AS orient
              FROM jd JOIN ob2 USING (doc_id)),
      od AS (SELECT doc_id, orient, w, hh,
               CASE WHEN orient >= 5 THEN hh ELSE w END AS ow,
               CASE WHEN orient >= 5 THEN w ELSE hh END AS ohh
             FROM ori2 WHERE NOT badmagic AND NOT prec12 AND NOT trunc),
      ogrid AS (SELECT doc_id, orient, w, hh, k,
                 (k % 9) * ow // 9 AS ox, (k // 9) * ohh // 8 AS oy
               FROM od, UNNEST(generate_series(0, 71)) AS u(k)),
      oinv AS (SELECT doc_id, k,
                 CASE WHEN orient IN (2, 3) THEN w - 1 - ox
                      WHEN orient IN (5, 6) THEN oy
                      WHEN orient IN (7, 8) THEN w - 1 - oy
                      ELSE ox END AS sx,
                 CASE WHEN orient IN (3, 4) THEN hh - 1 - oy
                      WHEN orient IN (5, 8) THEN ox
                      WHEN orient IN (6, 7) THEN hh - 1 - ox
                      ELSE oy END AS sy
               FROM ogrid),
      ogg AS (SELECT o.doc_id, o.k, jr.r + jr.g + jr.bb AS gray
              FROM oinv o JOIN jr ON jr.doc_id = o.doc_id
                AND jr.x = o.sx AND jr.y = o.sy),
      ogl AS (SELECT doc_id, list(gray ORDER BY k) AS gs
              FROM ogg GROUP BY 1),
      oph0 AS (SELECT doc_id,
                CAST(list_sum(list_transform(generate_series(32, 63), k ->
                  CASE WHEN gs[(k // 8) * 9 + (k % 8) + 1] <
                            gs[(k // 8) * 9 + (k % 8) + 2]
                       THEN (1::BIGINT << (k - 32)) ELSE 0 END))
                  AS BIGINT) AS hi,
                CAST(list_sum(list_transform(generate_series(0, 31), k ->
                  CASE WHEN gs[(k // 8) * 9 + (k % 8) + 1] <
                            gs[(k // 8) * 9 + (k % 8) + 2]
                       THEN (1::BIGINT << k) ELSE 0 END)) AS BIGINT) AS lo
              FROM ogl),
      oph AS (SELECT ori2.doc_id,
                CASE WHEN badmagic THEN 'bad_magic'
                     WHEN prec12 THEN 'unsupported'
                     WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
                hi AS dhash_hi, lo AS dhash_lo
              FROM ori2 LEFT JOIN oph0 USING (doc_id))
      SELECT doc_id, status, dhash_hi, dhash_lo,
             CASE WHEN status = 'ok' THEN count(*) OVER
               (PARTITION BY status, dhash_hi, dhash_lo) END AS n_copies,
             CASE WHEN status = 'ok' THEN min(doc_id) OVER
               (PARTITION BY status, dhash_hi, dhash_lo) END AS keeper,
             status = 'ok' AND doc_id = (min(doc_id) OVER
               (PARTITION BY status, dhash_hi, dhash_lo)) AS keep
      FROM oph ORDER BY doc_id"""),
    "q_dedup_image_phash" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                   ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b13 % 16 = 0 AS badmagic, b15 % 8 = 0 AS trunc,
                   1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b),
      r AS (SELECT doc_id, badmagic, trunc, w, hh,
              list_transform(generate_series(0, w * hh * 3 - 1), i ->
                (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS raster
            FROM d),
      g AS (SELECT doc_id, badmagic, trunc,
              list_transform(generate_series(0, 71), k ->
                raster[3*(((k // 9) * hh // 8) * w + ((k % 9) * w // 9)) + 1]
                + raster[3*(((k // 9) * hh // 8) * w + ((k % 9) * w // 9)) + 2]
                + raster[3*(((k // 9) * hh // 8) * w + ((k % 9) * w // 9)) + 3]
              ) AS grays
            FROM r),
      p AS (SELECT doc_id,
              CASE WHEN badmagic THEN 'bad_magic'
                   WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
              CASE WHEN badmagic OR trunc THEN NULL ELSE
                CAST(list_sum(list_transform(generate_series(32, 63), k ->
                  CASE WHEN grays[(k // 8) * 9 + (k % 8) + 1] <
                            grays[(k // 8) * 9 + (k % 8) + 2]
                       THEN (1::BIGINT << (k - 32)) ELSE 0 END)) AS BIGINT)
              END AS dhash_hi,
              CASE WHEN badmagic OR trunc THEN NULL ELSE
                CAST(list_sum(list_transform(generate_series(0, 31), k ->
                  CASE WHEN grays[(k // 8) * 9 + (k % 8) + 1] <
                            grays[(k // 8) * 9 + (k % 8) + 2]
                       THEN (1::BIGINT << k) ELSE 0 END)) AS BIGINT)
              END AS dhash_lo
            FROM g)
      SELECT doc_id, status, dhash_hi, dhash_lo,
             CASE WHEN status = 'ok' THEN count(*) OVER
               (PARTITION BY status, dhash_hi, dhash_lo) END AS n_copies,
             CASE WHEN status = 'ok' THEN min(doc_id) OVER
               (PARTITION BY status, dhash_hi, dhash_lo) END AS keeper,
             status = 'ok' AND doc_id = (min(doc_id) OVER
               (PARTITION BY status, dhash_hi, dhash_lo)) AS keep
      FROM p ORDER BY doc_id""",
    "q_multimodal_decode_wav" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(2)} AS b2, ${byteAt(3)} AS b3,
                   ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b13 % 16 = 0 AS badmagic, b15 % 8 = 0 AS trunc,
                   1 + b2 % 2 AS nch, 1 + b3 % 8 AS n
            FROM b),
      r AS (SELECT doc_id, badmagic, trunc, nch, n,
              list_transform(generate_series(0, n * nch - 1), i ->
                (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS smp
            FROM d)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL ELSE CAST(nch AS INT) END AS n_channels,
             CASE WHEN badmagic THEN NULL ELSE CAST(8000 AS INT) END AS sample_rate,
             CASE WHEN badmagic THEN NULL ELSE CAST(8 AS INT) END AS bits,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(n AS BIGINT) END AS n_samples,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(smp) AS BIGINT) END AS s_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_min(smp) AS INT) END AS s_min,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_max(smp) AS INT) END AS s_max,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(len(list_filter(smp, x -> x = 0 OR x = 255)) AS BIGINT) END AS n_clip
      FROM r ORDER BY doc_id""",
    "q_multimodal_decode_tiff" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                   ${byteAt(12)} AS b12, ${byteAt(13)} AS b13,
                   ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b12 % 16 = 0 AS badmagic, b13 % 4 = 0 AS bigend,
                   b15 % 8 = 2 AS trunc, 1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b),
      r AS (SELECT doc_id, badmagic, bigend, trunc, w, hh,
              list_transform(generate_series(0, w * hh - 1), i ->
                (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS pxs
            FROM d)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL
                  WHEN bigend THEN 'MM' ELSE 'II' END AS byte_order,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic OR trunc THEN NULL
               ELSE CAST(list_sum(pxs) AS BIGINT) END AS px_sum,
             CASE WHEN badmagic OR trunc THEN NULL
               ELSE CAST(list_min(pxs) AS INT) END AS px_min,
             CASE WHEN badmagic OR trunc THEN NULL
               ELSE CAST(list_max(pxs) AS INT) END AS px_max,
             CASE WHEN badmagic OR trunc THEN NULL
               ELSE CAST(list_sum(pxs[1:w]) AS BIGINT) END AS top_row_sum
      FROM r ORDER BY doc_id""",
    "q_multimodal_decode_bmp" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
                   ${byteAt(13)} AS b13, ${byteAt(14)} AS b14,
                   ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, b13 % 16 = 0 AS badmagic, b14 % 4 = 0 AS topdown,
                   b15 % 8 = 0 AS trunc, 1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b),
      r AS (SELECT doc_id, badmagic, topdown, trunc, w, hh,
              list_transform(generate_series(0, w * hh * 3 - 1), i ->
                (ascii(substr(h, 2*(i%16)+1, 1)) - (CASE WHEN substr(h, 2*(i%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
                (ascii(substr(h, 2*(i%16)+2, 1)) - (CASE WHEN substr(h, 2*(i%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS raster
            FROM d)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic THEN NULL ELSE CAST(24 AS INT) END AS bpp,
             CASE WHEN badmagic THEN NULL ELSE CAST(topdown AS INT) END AS top_down,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+3])) AS BIGINT) END AS r_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+2])) AS BIGINT) END AS g_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(generate_series(0, w * hh - 1), p -> raster[3*p+1])) AS BIGINT) END AS b_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_min(raster) AS INT) END AS px_min,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_max(raster) AS INT) END AS px_max,
             CASE WHEN badmagic OR trunc THEN NULL ELSE CAST(list_sum(
               list_transform(generate_series(1, w * 3), i -> raster[i])) AS BIGINT) END AS top_row_sum
      FROM r ORDER BY doc_id""",
    "q_multimodal_decode_qoi" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
               ${byteAt(2)} AS b2, ${byteAt(3)} AS b3, ${byteAt(4)} AS b4,
               ${byteAt(5)} AS b5, ${byteAt(6)} AS b6, ${byteAt(7)} AS b7,
               ${byteAt(12)} AS b12, ${byteAt(14)} AS b14, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT *, b12 % 16 = 0 AS badmagic, b14 % 8 = 0 AS badchan,
               b15 % 8 = 1 AS trunc, 1 + b0 % 4 AS w, 1 + b1 % 3 AS hh
            FROM b),
      px AS (SELECT doc_id, i,
               CASE (i // 3) % 4 WHEN 0 THEN b2 WHEN 1 THEN (b2 + 1) % 256
                    WHEN 2 THEN b2 ELSE b5 END AS r,
               CASE (i // 3) % 4 WHEN 0 THEN b3 WHEN 1 THEN (b3 + 1) % 256
                    WHEN 2 THEN b3 ELSE b6 END AS g,
               CASE (i // 3) % 4 WHEN 0 THEN b4 WHEN 1 THEN (b4 + 1) % 256
                    WHEN 2 THEN b4 ELSE b7 END AS bb
             FROM d, UNNEST(generate_series(0, w * hh - 1)) AS u(i)),
      pr AS (SELECT doc_id, r, g, bb,
               coalesce(lag(r) OVER (PARTITION BY doc_id ORDER BY i), 0) AS lr,
               coalesce(lag(g) OVER (PARTITION BY doc_id ORDER BY i), 0) AS lg,
               coalesce(lag(bb) OVER (PARTITION BY doc_id ORDER BY i), 0) AS lb
             FROM px),
      st AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS r_sum,
               CAST(sum(g) AS BIGINT) AS g_sum,
               CAST(sum(bb) AS BIGINT) AS b_sum,
               CAST(least(min(r), min(g), min(bb)) AS INT) AS px_min,
               CAST(greatest(max(r), max(g), max(bb)) AS INT) AS px_max,
               CAST(sum(CASE WHEN r = lr AND g = lg AND bb = lb
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_run_px
             FROM pr GROUP BY doc_id)
      SELECT d.doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN badchan THEN 'unsupported'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic OR badchan OR trunc THEN NULL ELSE r_sum END AS r_sum,
             CASE WHEN badmagic OR badchan OR trunc THEN NULL ELSE g_sum END AS g_sum,
             CASE WHEN badmagic OR badchan OR trunc THEN NULL ELSE b_sum END AS b_sum,
             CASE WHEN badmagic OR badchan OR trunc THEN NULL ELSE px_min END AS px_min,
             CASE WHEN badmagic OR badchan OR trunc THEN NULL ELSE px_max END AS px_max,
             CASE WHEN badmagic OR badchan OR trunc THEN NULL ELSE n_run_px END AS n_run_px
      FROM d JOIN st ON d.doc_id = st.doc_id
      ORDER BY d.doc_id""",
    "q_audio_features" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, h, ${byteAt(2)} AS b2, ${byteAt(3)} AS b3,
                   ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, h, 1 + b2 % 2 AS nch, 1 + b3 % 8 AS n
            FROM b WHERE b13 % 16 <> 0 AND b15 % 8 <> 0),
      s AS (SELECT doc_id, n, list_transform(generate_series(0, n - 1), i ->
              (ascii(substr(h, 2*((i*nch)%16)+1, 1)) - (CASE WHEN substr(h, 2*((i*nch)%16)+1, 1) >= 'a' THEN 87 ELSE 48 END)) * 16 +
              (ascii(substr(h, 2*((i*nch)%16)+2, 1)) - (CASE WHEN substr(h, 2*((i*nch)%16)+2, 1) >= 'a' THEN 87 ELSE 48 END))) AS smp
            FROM d),
      fr AS (SELECT doc_id, n, smp, f, 4 * f AS lo, least(n, 4 * f + 4) AS hi
             FROM s, UNNEST(generate_series(0, (n + 3) // 4 - 1)) AS u(f))
      SELECT doc_id, CAST(f AS INT) AS frame, CAST(hi - lo AS INT) AS n_s,
             CAST(list_sum(list_transform(generate_series(lo, hi - 1),
               i -> smp[i + 1])) AS BIGINT) AS s_sum,
             CAST(list_sum(list_transform(generate_series(lo, hi - 1),
               i -> (smp[i + 1] - 128) * (smp[i + 1] - 128))) AS BIGINT) AS energy,
             CAST(coalesce(list_sum(list_transform(
               generate_series(lo + 1, hi - 1), i ->
                 CASE WHEN (smp[i + 1] >= 128) <> (smp[i] >= 128)
                      THEN 1 ELSE 0 END)), 0) AS INT) AS zcr
      FROM fr ORDER BY doc_id, frame""",
    "q_multimodal_decode_gif" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
               ${byteAt(2)} AS b2, ${byteAt(3)} AS b3, ${byteAt(4)} AS b4,
               list_value(${byteAt(5)}, ${byteAt(6)}, ${byteAt(7)},
                 ${byteAt(8)}, ${byteAt(9)}, ${byteAt(10)}, ${byteAt(11)},
                 ${byteAt(12)}) AS bl,
               ${byteAt(11)} AS b11, ${byteAt(13)} AS b13, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, b2, b3, b4, bl, b11 % 16 = 0 AS badmagic,
               b13 % 4 = 0 AS il, b15 % 8 = 3 AS trunc,
               1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b),
      px AS (SELECT doc_id, i, w,
               (b2 + 7 * (bl[(i // 3) % 8 + 1] % 4)) % 256 AS r,
               (b3 + 11 * (bl[(i // 3) % 8 + 1] % 4)) % 256 AS g,
               (b4 + 13 * (bl[(i // 3) % 8 + 1] % 4)) % 256 AS bb
             FROM d, UNNEST(generate_series(0, w * hh - 1)) AS u(i)),
      st AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS r_sum,
               CAST(sum(g) AS BIGINT) AS g_sum,
               CAST(sum(bb) AS BIGINT) AS b_sum,
               CAST(least(min(r), min(g), min(bb)) AS INT) AS px_min,
               CAST(greatest(max(r), max(g), max(bb)) AS INT) AS px_max,
               CAST(sum(CASE WHEN i < w THEN r + g + bb ELSE 0 END)
                 AS BIGINT) AS row0_sum
             FROM px GROUP BY doc_id)
      SELECT d.doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic THEN NULL ELSE CAST(4 AS INT) END AS n_colors,
             CASE WHEN badmagic THEN NULL
                  ELSE CAST(il AS INT) END AS interlaced,
             CASE WHEN badmagic OR trunc THEN NULL ELSE r_sum END AS r_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE g_sum END AS g_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE b_sum END AS b_sum,
             CASE WHEN badmagic OR trunc THEN NULL ELSE px_min END AS px_min,
             CASE WHEN badmagic OR trunc THEN NULL ELSE px_max END AS px_max,
             CASE WHEN badmagic OR trunc THEN NULL ELSE row0_sum END AS row0_sum
      FROM d JOIN st ON d.doc_id = st.doc_id
      ORDER BY d.doc_id""",
    // The PNG twin recomputes pixel stats from the same pure md5
    // function the encoder rasterizes — it never sees the container,
    // the zlib wrapper, the DEFLATE bits, or the row filters, so a
    // hash-green row proves the chunk walk + inflate + unfilter chain
    // round-trips bit-exact. Arm precedence mirrors the decoder's
    // check order: signature, IHDR CRC, chunk-walk truncation, adler32.
    // Exif twin: every field a pure md5 function of the synth arms.
    // PDF twin: statuses from the arm bytes, the extracted text
    // recomputed as the SAME pure md5 function the fixture embedded
    // (page strings + TJ parts, escape-arm chars included), then
    // DuckDB's own md5/length — extraction must be lossless for the
    // hashes to meet.
    "q_pdf_extract" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      fb AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(9)} AS b9,
               ${byteAt(10)} AS b10,
               ${byteAt(11)} AS b11, ${byteAt(12)} AS b12,
               ${byteAt(13)} AS b13, ${byteAt(14)} AS b14,
               ${byteAt(15)} AS b15
             FROM hx),
      fd AS (SELECT doc_id, h,
               b11 % 16 = 7 AS badmagic,
               b11 % 16 <> 7 AND b13 % 8 = 6 AS trunc,
               b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 = 5 AS badxref,
               b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 <> 5
                 AND b15 % 8 = 1 AS badobj,
               b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 <> 5
                 AND b15 % 8 <> 1 AND b14 % 8 = 3 AS badflate,
               b11 % 16 <> 7 AND b13 % 8 <> 6 AND b12 % 8 <> 5
                 AND b15 % 8 <> 1 AND b14 % 8 <> 3 AND b9 % 8 = 5
                 AS unsup,
               b10 % 4 = 1 AS esc,
               1 + b0 % 2 AS np
             FROM fb),
      ft AS (SELECT doc_id,
               'Page 0: ' || substr(h, 1, 8) ||
                 (CASE WHEN esc THEN ' ()\\' ELSE '' END) ||
                 substr(h, 9, 4) || ' ' || substr(h, 13, 4) ||
                 (CASE WHEN np = 2 THEN chr(10) || 'Page 1: ' ||
                    substr(h, 3, 8) ||
                    (CASE WHEN esc THEN ' ()\\' ELSE '' END) ||
                    substr(h, 9, 4) || ' ' || substr(h, 13, 4)
                  ELSE '' END) AS txt
             FROM fd)
      SELECT fd.doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN trunc THEN 'truncated'
                  WHEN badxref THEN 'bad_xref'
                  WHEN badobj THEN 'bad_object'
                  WHEN badflate THEN 'bad_flate'
                  WHEN unsup THEN 'unsupported' ELSE 'ok' END AS status,
             CASE WHEN badmagic OR trunc OR badxref OR badobj THEN NULL
                  ELSE CAST(np AS INT) END AS n_pages,
             CASE WHEN badmagic OR trunc OR badxref THEN NULL
                  ELSE CAST(3 + 2 * np AS INT) END AS n_objects,
             CASE WHEN badmagic OR trunc OR badxref OR badobj OR badflate
                  OR unsup
                  THEN NULL ELSE CAST(2 * np AS INT) END AS n_text_ops,
             CASE WHEN badmagic OR trunc OR badxref OR badobj OR badflate
                  OR unsup
                  THEN NULL ELSE CAST(length(txt) AS INT) END AS n_chars,
             CASE WHEN badmagic OR trunc OR badxref OR badobj OR badflate
                  OR unsup
                  THEN NULL ELSE md5(txt) END AS text_md5
      FROM fd JOIN ft USING (doc_id)
      ORDER BY fd.doc_id""",
    // Cross-format twin: per-record content keys re-derived from the
    // kept-block rule over the normalized word halves (the
    // q_html_extract model), the PDF copy sharing the paragraph key
    // by construction — the gate proves both real extractors
    // round-trip to the SAME canonical form.
    "q_dedup_cross_format" -> s"""
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      xb AS (SELECT doc_id, text, ${byteAt(6)} AS b6, ${byteAt(7)} AS b7,
               ${byteAt(8)} AS b8
             FROM hx),
      xd AS (SELECT doc_id,
               array_to_string(list_filter(string_split(text, ' '),
                 x -> x <> ''), ' ') AS t,
               b7 % 3 AS fmt, b6 % 4 = 1 AS synd, b8 % 8 = 3 AS plain
             FROM xb),
      xe AS (SELECT doc_id, fmt, synd, plain, t,
               len(string_split(t, ' ')) AS nw,
               (len(string_split(t, ' ')) + 1) // 2 AS n1
             FROM xd),
      xf AS (SELECT doc_id, fmt, synd, plain, t, nw, n1, nw - n1 AS n2,
               array_to_string(string_split(t, ' ')[1:n1], ' ') AS p1,
               array_to_string(string_split(t, ' ')[n1+1:nw], ' ') AS p2
             FROM xe),
      xk AS (SELECT doc_id, fmt, synd,
               CASE WHEN n1 >= 5 AND n2 >= 5 THEN md5(t)
                    WHEN n1 >= 5 THEN md5(p1)
                    WHEN n2 >= 5 THEN md5(p2) END AS parakey,
               CASE WHEN plain THEN (CASE WHEN nw >= 5 THEN md5(t) END)
                    WHEN n1 >= 5 AND n2 >= 5 THEN md5(t)
                    WHEN n1 >= 5 THEN md5(p1)
                    WHEN n2 >= 5 THEN md5(p2) END AS htmlkey,
               CASE WHEN nw >= 5 THEN md5(t) END AS textkey
             FROM xf),
      recs AS (
        SELECT doc_id,
               CASE fmt WHEN 0 THEN 'pdf' WHEN 1 THEN 'html'
                 ELSE 'text' END AS route,
               CASE fmt WHEN 0 THEN parakey WHEN 1 THEN htmlkey
                 ELSE textkey END AS ckey
        FROM xk
        UNION ALL
        SELECT doc_id,
               CASE WHEN fmt = 0 THEN 'html' ELSE 'pdf' END AS route,
               CASE WHEN fmt = 0 THEN htmlkey ELSE parakey END AS ckey
        FROM xk WHERE synd),
      ckf AS (SELECT ckey, count(*) AS c, count(DISTINCT route) AS nr
              FROM recs GROUP BY 1)
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_records,
             CAST(coalesce(sum(CASE WHEN ckey IS NOT NULL THEN c
               ELSE 0 END), 0) AS BIGINT) AS n_keyed,
             CAST(count(CASE WHEN ckey IS NOT NULL THEN 1 END) AS BIGINT)
               AS n_clusters,
             CAST(coalesce(sum(CASE WHEN ckey IS NOT NULL AND c >= 2
               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_multi_clusters,
             CAST(coalesce(sum(CASE WHEN ckey IS NOT NULL AND nr >= 2
               THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_cross_format_clusters,
             CAST(coalesce(sum(CASE WHEN ckey IS NOT NULL AND c >= 2
               THEN c ELSE 0 END), 0) AS BIGINT) AS n_dup_records
      FROM ckf""",
    "q_jpeg_exif" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      xb AS (SELECT doc_id, h, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
               ${byteAt(2)} AS b2, ${byteAt(3)} AS b3, ${byteAt(4)} AS b4,
               ${byteAt(5)} AS b5, ${byteAt(6)} AS b6, ${byteAt(7)} AS b7,
               ${byteAt(8)} AS b8, ${byteAt(9)} AS b9,
               ${byteAt(11)} AS b11
             FROM hx),
      xd AS (SELECT doc_id,
               b11 % 16 = 9 AS badmagic,
               b6 % 8 = 1 AS noexif,
               b6 % 8 <> 1 AND b5 % 8 = 2 AS badtiff,
               b4 % 2 = 0 AS big,
               1 + b3 % 8 AS orient,
               b7 % 2 = 0 AS hasgps,
               -- GPS latitude in exact milli-arcseconds: the RATIONAL
               -- triple the out-of-line walk reads, recomputed from
               -- the md5 model (dens {1,2,4,5} divide the scalers)
               (b0 % 90) * 3600000 + (b1 % 60) * 60000
                 + (b2 * 1000) // (CASE b3 % 4 WHEN 0 THEN 1
                     WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 5 END) AS gpsmas,
               upper(substr(h, 1, 3)) AS mk,
               -- dims follow the base synth's color-structure arms:
               -- width doubles at 4:2:0 AND 4:2:2, height only at 4:2:0
               (CASE WHEN b9 % 8 <> 6 AND b8 % 4 IN (1, 2) THEN 16
                     ELSE 8 END) * (1 + b0 % 2) AS w,
               (CASE WHEN b9 % 8 <> 6 AND b8 % 4 = 2 THEN 16 ELSE 8 END)
                 * (1 + b1 % 2) AS hh
             FROM xb)
      SELECT doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN badtiff THEN 'bad_exif'
                  WHEN noexif THEN 'no_exif' ELSE 'ok' END AS status,
             CASE WHEN NOT badmagic AND NOT badtiff AND NOT noexif
                  THEN (CASE WHEN big THEN 'MM' ELSE 'II' END)
                  END AS byte_order,
             CASE WHEN NOT badmagic AND NOT badtiff AND NOT noexif
                  THEN CAST(orient AS INT) END AS orientation,
             CASE WHEN NOT badmagic AND NOT badtiff AND NOT noexif
                  THEN mk END AS make,
             CASE WHEN NOT badmagic AND NOT badtiff AND NOT noexif
                  THEN CAST(CASE WHEN hasgps THEN 3 ELSE 2 END AS INT)
                  END AS n_ifd,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN NOT badmagic AND NOT badtiff AND NOT noexif
                    AND hasgps
                  THEN CAST(gpsmas AS BIGINT) END AS gps_lat_mas
      FROM xd ORDER BY doc_id""",
    // JPEG twin: pixels recomputed as the pure md5 function the
    // frequency-domain fixture encodes (128 + d0 + d4·σσ per
    // component), then the SAME offset-floor-div integer YCbCr→RGB as
    // the decoder — never an IDCT, never the bytes.
    "q_multimodal_decode_jpeg" -> (jpegPixelCtes + s""",
      jst AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS r_sum,
                CAST(sum(g) AS BIGINT) AS g_sum,
                CAST(sum(bb) AS BIGINT) AS b_sum,
                CAST(least(min(r), min(g), min(bb)) AS INT) AS px_min,
                CAST(greatest(max(r), max(g), max(bb)) AS INT) AS px_max,
                CAST(sum(CASE WHEN y = 0 THEN r + g + bb ELSE 0 END)
                  AS BIGINT) AS row0_sum
              FROM jr GROUP BY doc_id)
      SELECT jd.doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN prec12 THEN 'unsupported'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CASE WHEN badmagic THEN NULL ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic THEN NULL ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic OR prec12 OR trunc THEN NULL
                  WHEN gray THEN CAST((w // 8) * (hh // 8) AS INT)
                  WHEN sub420 THEN CAST((w // 8) * (hh // 8)
                    + 2 * (w // 16) * (hh // 16) AS INT)
                  WHEN sub422 THEN CAST((w // 8) * (hh // 8)
                    + 2 * (w // 16) * (hh // 8) AS INT)
                  ELSE CAST((w // 8) * (hh // 8) * 3 AS INT) END AS n_blocks,
             r_sum, g_sum, b_sum, px_min, px_max, row0_sum
      FROM jd LEFT JOIN jst USING (doc_id)
      ORDER BY jd.doc_id"""),
    // Oriented twin: the SAME pixel model, with the Exif-fixture's
    // orientation byte model (1 + b3 % 8; default 1 on the no-APP1 /
    // bad-TIFF / bad-magic arms) applied as the 8 exact index maps,
    // then the position-weighted sums over ORIENTED coordinates.
    "q_jpeg_oriented" -> (jpegPixelCtes + s""",
      ob AS (SELECT doc_id, ${byteAt(3)} AS ob3, ${byteAt(5)} AS ob5,
               ${byteAt(6)} AS ob6
             FROM hx),
      ori AS (SELECT jd.doc_id, w, hh, badmagic, prec12, trunc,
                CASE WHEN NOT badmagic AND ob6 % 8 <> 1 AND ob5 % 8 <> 2
                     THEN 1 + ob3 % 8 ELSE 1 END AS orient
              FROM jd JOIN ob USING (doc_id)),
      opx AS (SELECT jr.doc_id, orient,
                CASE WHEN orient IN (2, 3) THEN w - 1 - x
                     WHEN orient IN (5, 8) THEN y
                     WHEN orient IN (6, 7) THEN hh - 1 - y
                     ELSE x END AS ox,
                CASE WHEN orient IN (3, 4) THEN hh - 1 - y
                     WHEN orient IN (5, 6) THEN x
                     WHEN orient IN (7, 8) THEN w - 1 - x
                     ELSE y END AS oy,
                CASE WHEN orient >= 5 THEN hh ELSE w END AS ow,
                r, g, bb
              FROM jr JOIN ori USING (doc_id)),
      ost AS (SELECT doc_id,
                CAST(sum((r + 2 * g + 3 * bb) *
                  ((oy * ow + ox) % 997)) AS BIGINT) AS o_checksum,
                CAST(sum(CASE WHEN oy = 0
                  THEN (ox + 1) * (r + g + bb) ELSE 0 END)
                  AS BIGINT) AS o_row0_wsum,
                CAST(sum(r) AS BIGINT) AS r_sum
              FROM opx GROUP BY doc_id)
      SELECT ori.doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN prec12 THEN 'unsupported'
                  WHEN trunc THEN 'truncated' ELSE 'ok' END AS status,
             CAST(orient AS INT) AS orientation,
             CASE WHEN badmagic THEN NULL WHEN orient >= 5
                  THEN CAST(hh AS INT) ELSE CAST(w AS INT) END AS ow,
             CASE WHEN badmagic THEN NULL WHEN orient >= 5
                  THEN CAST(w AS INT) ELSE CAST(hh AS INT) END AS oh,
             o_checksum, o_row0_wsum, r_sum
      FROM ori LEFT JOIN ost USING (doc_id)
      ORDER BY ori.doc_id"""),
    "q_multimodal_decode_png" -> s"""
      WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id, ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
               ${byteAt(2)} AS b2, ${byteAt(3)} AS b3, ${byteAt(4)} AS b4,
               list_value(${byteAt(5)}, ${byteAt(6)}, ${byteAt(7)},
                 ${byteAt(8)}, ${byteAt(9)}, ${byteAt(10)}, ${byteAt(11)},
                 ${byteAt(12)}) AS bl,
               ${byteAt(8)} AS b8, ${byteAt(10)} AS b10, ${byteAt(12)} AS b12,
               ${byteAt(14)} AS b14, ${byteAt(15)} AS b15
            FROM hx),
      d AS (SELECT doc_id, b2, b3, b4, bl,
               b12 % 16 = 0 AS badmagic, b8 % 16 = 7 AS badcrc,
               b14 % 8 = 3 AS trunc, b15 % 16 = 5 AS badadler,
               CASE WHEN b10 % 4 = 0 THEN 2 ELSE 1 END AS nidat,
               1 + b0 % 4 AS w, 1 + b1 % 4 AS hh
            FROM b),
      px AS (SELECT doc_id, i, w,
               (b2 + 7 * (bl[(i // 3) % 8 + 1] % 4)) % 256 AS r,
               (b3 + 11 * (bl[(i // 3) % 8 + 1] % 4)) % 256 AS g,
               (b4 + 13 * (bl[(i // 3) % 8 + 1] % 4)) % 256 AS bb
             FROM d, UNNEST(generate_series(0, w * hh - 1)) AS u(i)),
      st AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS r_sum,
               CAST(sum(g) AS BIGINT) AS g_sum,
               CAST(sum(bb) AS BIGINT) AS b_sum,
               CAST(least(min(r), min(g), min(bb)) AS INT) AS px_min,
               CAST(greatest(max(r), max(g), max(bb)) AS INT) AS px_max,
               CAST(sum(CASE WHEN i < w THEN r + g + bb ELSE 0 END)
                 AS BIGINT) AS row0_sum
             FROM px GROUP BY doc_id)
      SELECT d.doc_id,
             CASE WHEN badmagic THEN 'bad_magic'
                  WHEN badcrc THEN 'bad_header'
                  WHEN trunc THEN 'truncated'
                  WHEN badadler THEN 'bad_data' ELSE 'ok' END AS status,
             CASE WHEN badmagic OR badcrc THEN NULL
                  ELSE CAST(w AS INT) END AS width,
             CASE WHEN badmagic OR badcrc THEN NULL
                  ELSE CAST(hh AS INT) END AS height,
             CASE WHEN badmagic OR badcrc THEN NULL
                  ELSE CAST(2 AS INT) END AS color_type,
             CASE WHEN badmagic OR badcrc OR trunc THEN NULL
                  ELSE CAST(nidat AS INT) END AS n_idat,
             CASE WHEN badmagic OR badcrc OR trunc OR badadler THEN NULL
                  ELSE r_sum END AS r_sum,
             CASE WHEN badmagic OR badcrc OR trunc OR badadler THEN NULL
                  ELSE g_sum END AS g_sum,
             CASE WHEN badmagic OR badcrc OR trunc OR badadler THEN NULL
                  ELSE b_sum END AS b_sum,
             CASE WHEN badmagic OR badcrc OR trunc OR badadler THEN NULL
                  ELSE px_min END AS px_min,
             CASE WHEN badmagic OR badcrc OR trunc OR badadler THEN NULL
                  ELSE px_max END AS px_max,
             CASE WHEN badmagic OR badcrc OR trunc OR badadler THEN NULL
                  ELSE row0_sum END AS row0_sum
      FROM d JOIN st ON d.doc_id = st.doc_id
      ORDER BY d.doc_id""",
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
                  WHEN substr(h, 1, 4) = '424d' THEN 'bmp'
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
