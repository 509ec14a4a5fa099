package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the REAL P6 parser ([[Multimodal.parsePpm]]) on
  * hand-built byte streams — including netpbm shapes the md5-derived
  * fixture corpus cannot produce (multi-digit dimensions, multiple
  * comment lines, 2-byte-sample maxval), so the parser is proven
  * against the format, not just against the synthesizer. */
class MultimodalSpec extends graft.SparkSuite {

  private def ppm(header: String, raster: Array[Int]): Array[Byte] =
    header.getBytes("UTF-8") ++ raster.map(_.toByte)

  test("well-formed P6 with comments and multi-digit dims parses exactly") {
    // 12×1 raster: r-channel bytes 0,3,6.. etc — sums are hand-checkable
    val raster = (0 until 12 * 3).map(i => (i * 7) % 256).toArray
    val m = Multimodal.parsePpm(1L,
      ppm("P6\n# a comment\n# another\n12 1\n# post-dims\n255\n", raster))
    assert(m.status == "ok")
    assert(m.width.contains(12) && m.height.contains(1) && m.maxval.contains(255))
    assert(m.r_sum.contains(raster.indices.filter(_ % 3 == 0).map(i => raster(i) & 0xff).map(_.toLong).sum))
    assert(m.g_sum.contains(raster.indices.filter(_ % 3 == 1).map(i => raster(i) & 0xff).map(_.toLong).sum))
    assert(m.b_sum.contains(raster.indices.filter(_ % 3 == 2).map(i => raster(i) & 0xff).map(_.toLong).sum))
    assert(m.px_min.contains(0) && m.px_max.contains(raster.map(_ & 0xff).max))
  }

  test("raster bytes above 127 stay unsigned") {
    val m = Multimodal.parsePpm(2L, ppm("P6\n1 1\n255\n", Array(200, 255, 128)))
    assert(m.r_sum.contains(200L) && m.g_sum.contains(255L) && m.b_sum.contains(128L))
    assert(m.px_min.contains(128) && m.px_max.contains(255))
  }

  test("failure paths are rows, never throws") {
    assert(Multimodal.parsePpm(3L, null).status == "bad_magic")
    assert(Multimodal.parsePpm(4L, Array[Byte]()).status == "bad_magic")
    assert(Multimodal.parsePpm(5L, "X6\n1 1\n255\n".getBytes).status == "bad_magic")
    assert(Multimodal.parsePpm(6L, "P6\nnope\n".getBytes).status == "bad_header")
    assert(Multimodal.parsePpm(7L, "P6\n0 4\n255\n".getBytes).status == "bad_header")
    val hi = Multimodal.parsePpm(8L, ppm("P6\n1 1\n65535\n", Array(1, 2, 3)))
    assert(hi.status == "unsupported_maxval" && hi.maxval.contains(65535))
    val tr = Multimodal.parsePpm(9L, ppm("P6\n2 2\n255\n", Array(1, 2, 3)))
    assert(tr.status == "truncated" && tr.width.contains(2) && tr.r_sum.isEmpty)
  }

  test("a raster byte that looks like whitespace is still raster") {
    // 0x0a (newline) as the FIRST raster byte: only ONE whitespace is
    // consumed after maxval — an over-eager skip would shift the frame
    val m = Multimodal.parsePpm(10L, ppm("P6\n1 1\n255\n", Array(0x0a, 0x20, 0x09)))
    assert(m.status == "ok")
    assert(m.r_sum.contains(0x0aL) && m.g_sum.contains(0x20L) && m.b_sum.contains(0x09L))
  }

  /** Hand-built BMP: headers at spec offsets, caller controls the data
    * offset (gap = palette-style bytes the walk must skip), the signed
    * height, and the raw stored rows (already padded). */
  private def bmp(w: Int, h: Int, dataOff: Int, bpp: Int,
      stored: Array[Int], magic: String = "BM", comp: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = (0 to 3).foreach(s => out.write((v >> (8 * s)) & 255))
    def w16(v: Int): Unit = (0 to 1).foreach(s => out.write((v >> (8 * s)) & 255))
    out.write(magic(0)); out.write(magic(1))
    w32(14 + 40 + stored.length); w16(0); w16(0); w32(dataOff)
    w32(40); w32(w); w32(h); w16(1); w16(bpp); w32(comp)
    w32(stored.length); w32(2835); w32(2835); w32(0); w32(0)
    (0 until dataOff - 54).foreach(_ => out.write(0xee)) // palette gap
    stored.foreach(out.write)
    out.toByteArray
  }

  test("bottom-up BMP with padded rows: logical top row is the LAST stored row") {
    // 2×2, stride 8 (2 pad bytes of 0xFF that must NOT enter stats).
    // Stored first row = logical BOTTOM (b,g,r per pixel):
    //   bottom: (1,2,3)(4,5,6) | top: (10,20,30)(40,50,60)
    val stored = Array(1, 2, 3, 4, 5, 6, 255, 255,
      10, 20, 30, 40, 50, 60, 255, 255)
    val m = Multimodal.parseBmp(20L, bmp(2, 2, 54, 24, stored))
    assert(m.status == "ok" && m.top_down.contains(0))
    assert(m.width.contains(2) && m.height.contains(2))
    assert(m.b_sum.contains(1L + 4 + 10 + 40) && m.g_sum.contains(2L + 5 + 20 + 50)
      && m.r_sum.contains(3L + 6 + 30 + 60))
    assert(m.top_row_sum.contains(10L + 20 + 30 + 40 + 50 + 60),
      "top row must be the LAST stored row in a bottom-up BMP")
    assert(m.px_min.contains(1) && m.px_max.contains(60),
      "pad bytes (0xFF here) must never enter pixel stats")
  }

  test("negative height flips to top-down row order") {
    val stored = Array(10, 20, 30, 0, // top row first when height < 0
      1, 2, 3, 0)
    val m = Multimodal.parseBmp(21L, bmp(1, -2, 54, 24, stored))
    assert(m.status == "ok" && m.top_down.contains(1) && m.height.contains(2))
    assert(m.top_row_sum.contains(10L + 20 + 30))
  }

  test("pixel offset field is honored: palette-style gap before the raster") {
    val m = Multimodal.parseBmp(22L, bmp(1, 1, 54 + 12, 24, Array(7, 8, 9, 0)))
    assert(m.status == "ok")
    assert(m.b_sum.contains(7L) && m.g_sum.contains(8L) && m.r_sum.contains(9L))
  }

  test("BMP failure paths are rows, never throws") {
    assert(Multimodal.parseBmp(23L, null).status == "bad_magic")
    assert(Multimodal.parseBmp(24L, "BM".getBytes).status == "bad_header")
    assert(Multimodal.parseBmp(25L,
      bmp(1, 1, 54, 24, Array(1, 2, 3, 0), magic = "XM")).status == "bad_magic")
    assert(Multimodal.parseBmp(26L, bmp(0, 1, 54, 24, Array())).status == "bad_header")
    val u8 = Multimodal.parseBmp(27L, bmp(1, 1, 54, 8, Array(1, 2, 3, 0)))
    assert(u8.status == "unsupported" && u8.bpp.contains(8) && u8.width.contains(1))
    val rle = Multimodal.parseBmp(28L, bmp(1, 1, 54, 24, Array(1, 2, 3, 0), comp = 1))
    assert(rle.status == "unsupported")
    val tr = Multimodal.parseBmp(29L, bmp(2, 2, 54, 24, Array(1, 2, 3)))
    assert(tr.status == "truncated" && tr.width.contains(2) && tr.r_sum.isEmpty)
  }

  test("synthesized BMP round-trips through the parser") {
    // an all-arms-off hex (b13=0x01, b14=0x01, b15=0x01): parse must
    // succeed and agree with the logical-position byte rule
    val h = "000102030405060708090a0b0c010101"
    val m = Multimodal.parseBmp(30L, Multimodal.bmpBytes(h))
    assert(m.status == "ok")
    // w = 1 + 0 % 4 = 1, ht = 1 + 1 % 4 = 2; logical bytes are
    // b(i % 16) over i = 0..5 → rows (0,1,2) top, (3,4,5) bottom
    assert(m.width.contains(1) && m.height.contains(2) && m.top_down.contains(0))
    assert(m.top_row_sum.contains(0L + 1 + 2))
    assert(m.b_sum.contains(0L + 3) && m.g_sum.contains(1L + 4) && m.r_sum.contains(2L + 5))
  }

  // ---- QOI (the compressed-format decoder) ----

  private def qoi(w: Int, h: Int, chunks: Array[Int],
      marker: Boolean = true, channels: Int = 3): Array[Byte] = {
    val hdr = Array[Int]('q', 'o', 'i', 'f',
      w >>> 24, (w >>> 16) & 255, (w >>> 8) & 255, w & 255,
      h >>> 24, (h >>> 16) & 255, (h >>> 8) & 255, h & 255,
      channels, 0)
    val tail = if (marker) Array(0, 0, 0, 0, 0, 0, 0, 1) else Array[Int]()
    (hdr ++ chunks ++ tail).map(_.toByte)
  }

  test("hand-built QOI stream: RGB literal, RUN, DIFF, INDEX all decode") {
    // px0 RGB(10,20,30); px1 RUN×1 (repeat); px2 DIFF(+1,+1,+1) →
    // (11,21,31); px3 INDEX → (10,20,30) at spec-hash slot
    // (10·3+20·5+30·7+255·11) % 64 = 9.
    val m = Multimodal.parseQoi(40L, qoi(4, 1,
      Array(0xFE, 10, 20, 30, 0xC0, 0x7F, 0x09)))
    assert(m.status == "ok")
    assert(m.r_sum.contains(10L + 10 + 11 + 10))
    assert(m.g_sum.contains(20L + 20 + 21 + 20))
    assert(m.b_sum.contains(30L + 30 + 31 + 30))
    assert(m.px_min.contains(10) && m.px_max.contains(31))
    assert(m.n_run_px.contains(1L))
  }

  test("hand-built QOI stream: LUMA deltas and DIFF wraparound") {
    // px0 LUMA from initial prev (0,0,0): dg=+10, dr−dg=+2, db−dg=−3
    // → (12,10,7); px1 DIFF all −2 wraps to (10,8,5).
    val m = Multimodal.parseQoi(41L, qoi(2, 1, Array(0xAA, 0xA5, 0x40)))
    assert(m.status == "ok")
    assert(m.r_sum.contains(12L + 10) && m.g_sum.contains(10L + 8)
      && m.b_sum.contains(7L + 5))
    assert(m.n_run_px.contains(0L))
    // pure wraparound: DIFF −2 from (0,0,0) → (254,254,254)
    val w = Multimodal.parseQoi(42L, qoi(1, 1, Array(0x40)))
    assert(w.status == "ok" && w.r_sum.contains(254L) && w.px_min.contains(254))
  }

  test("QOI failure paths are rows, never throws") {
    assert(Multimodal.parseQoi(43L, null).status == "bad_magic")
    assert(Multimodal.parseQoi(44L, "qoif".getBytes).status == "bad_header")
    assert(Multimodal.parseQoi(45L,
      qoi(1, 1, Array(0x40), channels = 4)).status == "unsupported")
    // stream ends before the declared pixel count
    assert(Multimodal.parseQoi(46L,
      qoi(2, 1, Array(0xFE, 1, 2), marker = false)).status == "truncated")
    // pixels complete but the 8-byte end marker is missing
    assert(Multimodal.parseQoi(47L,
      qoi(1, 1, Array(0x40), marker = false)).status == "truncated")
    // a RUN that overruns the declared dims is malformed, not a crash
    assert(Multimodal.parseQoi(48L,
      qoi(1, 1, Array(0xC5))).status == "truncated")
    // dims within the per-dim cap whose PRODUCT overflows Int: the
    // truncated pixel count would be 0 (65536×65536 → 2^32) or
    // negative (65536×65535), letting a header+trailer-only payload
    // claim `ok` with zero pixels — must be rejected at the header
    assert(Multimodal.parseQoi(50L,
      qoi(65536, 65536, Array())).status == "bad_header")
    assert(Multimodal.parseQoi(51L,
      qoi(65536, 65535, Array())).status == "bad_header")
  }

  test("synthesized QOI round-trips through the decoder") {
    // all-arms-off hex: b12=26 (magic ok), b14=28 (channels 3),
    // b15=3 (no truncation); w = 1+b0%4 = 3, ht = 1+b1%3 = 2 → six
    // pixels: block0 = (b2,b3,b4) = (6,8,10) ×3, block1 = +1 each
    // = (7,9,11) ×3 (the DIFF-encodable step).
    val h = "020406080a0c0e10121416181a031c03"
    val m = Multimodal.parseQoi(49L, Multimodal.qoiBytes(h))
    assert(m.status == "ok")
    assert(m.width.contains(3) && m.height.contains(2))
    assert(m.r_sum.contains(3L * 6 + 3L * 7))
    assert(m.g_sum.contains(3L * 8 + 3L * 9))
    assert(m.b_sum.contains(3L * 10 + 3L * 11))
    // two intra-block repeats per 3-pixel block, no cross-block run
    assert(m.n_run_px.contains(4L))
  }

  // ---- audio feature frames (decode → feature-extract) ----

  test("audio frames: stereo stride, ragged tail, energy and ZCR") {
    import spark.implicits._
    // b2=0x05 → nch=2; b3=0x06 → n=7 per channel; no failure arms
    // (b13=0x1b: 27%16≠0, b15=0x05: 5%8≠0). Channel-0 sample i is
    // md5 byte (2i)%16 — the even bytes 01,05,09,0d,11,15,19.
    val h = "01030506090b0d0f11131517191b1d05"
    val ds = spark.createDataset(Seq((7L, h)))
      .map { case (id, hx) => BinaryDoc(id, Multimodal.wavBytes(hx)) }
    val fr = Multimodal.audioFrames(ds).collect().sortBy(_.frame)
    assert(fr.length == 2) // 7 samples → frames of 4 + 3
    val f0 = fr(0); val f1 = fr(1)
    assert(f0.n_s == 4 && f1.n_s == 3)
    // ch0 samples: 0x01,0x09,0x11,0x19 then 0x05? no — byte (2i)%16:
    // i=0..6 → bytes 0,2,4,6,8,10,12 → 0x01,0x05,0x09,0x0d,0x11,0x15,0x19
    assert(f0.s_sum == 0x01 + 0x05 + 0x09 + 0x0d)
    assert(f1.s_sum == 0x11 + 0x15 + 0x19)
    def en(vs: Int*) = vs.map(v => (v - 128).toLong * (v - 128)).sum
    assert(f0.energy == en(0x01, 0x05, 0x09, 0x0d))
    assert(f1.energy == en(0x11, 0x15, 0x19))
    assert(f0.zcr == 0 && f1.zcr == 0) // all samples below midpoint
  }

  test("audio frames: failed decodes emit zero rows") {
    import spark.implicits._
    val bad = spark.createDataset(Seq(
      BinaryDoc(1L, "XIFFnope".getBytes("US-ASCII"))))
    assert(Multimodal.audioFrames(bad).count() == 0L)
  }

  // ---- GIF (the LZW dictionary-coded decoder) ----

  test("synthesized GIF round-trips through the LZW decoder") {
    // arms off: b11=0x19 (magic ok), b13=0x1b (not interlaced),
    // b15=0x05 (no truncation); w=2, ht=4, indexes [3,3,3,1,1,1,3,3]
    // — every 3-pixel block is a run, so the encoder's (cur,s) chain
    // emits a code equal to `next` and the decoder's KwKwK arm fires.
    val h = "01030507090b0d0f11131517191b1d05"
    val m = Multimodal.parseGif(60L, Multimodal.gifBytes(h))
    assert(m.status == "ok")
    assert(m.width.contains(2) && m.height.contains(4))
    assert(m.n_colors.contains(4) && m.interlaced.contains(0))
    assert(m.r_sum.contains(166L) && m.g_sum.contains(254L) &&
      m.b_sum.contains(306L))
    assert(m.px_min.contains(12) && m.px_max.contains(48))
    assert(m.row0_sum.contains(228L)) // logical top row: two j=3 pixels
  }

  test("interlaced GIF is de-permuted to logical rows before stats") {
    // b13=0x04 → interlace arm ON; w=4, ht=4, so the storage order is
    // rows [0,2,1,3] — whole-image sums are permutation-blind, but
    // row0_sum is computed over the LOGICAL top row [1,1,1,3] and
    // catches a skipped or wrong de-interlace.
    val h = "030307090b0d0f11131517191b040101"
    val m = Multimodal.parseGif(61L, Multimodal.gifBytes(h))
    assert(m.status == "ok")
    assert(m.interlaced.contains(1))
    assert(m.r_sum.contains(322L) && m.g_sum.contains(474L) &&
      m.b_sum.contains(566L))
    assert(m.px_min.contains(14) && m.px_max.contains(50))
    assert(m.row0_sum.contains(294L))
  }

  test("GIF failure paths are rows, never throws") {
    assert(Multimodal.parseGif(62L, null).status == "bad_magic")
    assert(Multimodal.parseGif(63L,
      "JIF87a".getBytes("US-ASCII")).status == "bad_magic")
    assert(Multimodal.parseGif(64L,
      "GIF88a".getBytes("US-ASCII")).status == "bad_header")
    // trailer-drop arm (b15=0x03): decodes fully, then misses 0x3B
    val t = Multimodal.parseGif(65L,
      Multimodal.gifBytes("01030507090b0d0f11131517191b1d03"))
    assert(t.status == "truncated")
    assert(t.width.contains(2) && t.height.contains(4))
    assert(t.r_sum.isEmpty)
    // cut INSIDE the LZW sub-block: declared size outruns the payload
    val full = Multimodal.gifBytes("01030507090b0d0f11131517191b1d05")
    assert(Multimodal.parseGif(66L,
      full.dropRight(3)).status == "truncated")
    // header cut mid-color-table
    assert(Multimodal.parseGif(67L, full.take(15)).status == "truncated")
  }

  test("real NN resize samples the exact raster pixels the index map names") {
    // 4×2 raster with distinct per-pixel values: out(r,c) must sample
    // src (r·2/2, c·4/2) = rows 0,1 × cols 0,2 under floor-NN
    val px = Array.tabulate(8)(i => Array(10 * i + 1, 10 * i + 2, 10 * i + 3))
    val raster = px.flatten
    val m = Multimodal.resizePpm(70L, ppm("P6\n4 2\n255\n", raster), 2, 2)
    assert(m.status == "ok")
    assert(m.out_w.contains(2) && m.out_h.contains(2))
    // sampled pixels: 0, 2, 4, 6
    assert(m.r_sum.contains((1 + 21 + 41 + 61).toLong))
    assert(m.g_sum.contains((2 + 22 + 42 + 62).toLong))
    assert(m.b_sum.contains((3 + 23 + 43 + 63).toLong))
    assert(m.top_left.contains(1L * 65536 + 2 * 256 + 3))
    // failure statuses flow through from the shared header walk
    assert(Multimodal.resizePpm(71L, null, 2, 2).status == "bad_magic")
    assert(Multimodal.resizePpm(72L,
      ppm("P6\n4 2\n255\n", raster.take(10)), 2, 2).status == "truncated")
  }

  test("gzip: decodes java.util.zip.GZIPOutputStream members (independent encoder)") {
    val text = ("the quick brown fox " * 40).getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(text); gz.close()
    val m = Multimodal.parseGzip(80L, bos.toByteArray)
    assert(m.status == "ok", m.status)
    assert(m.n_bytes.contains(text.length))
    assert(m.sum_bytes.contains(text.map(_ & 0xff).map(_.toLong).sum))
    assert(m.n_sep.contains(text.count(_ == ' ').toLong))
  }

  test("gzip: synthesized members round-trip and every arm fires") {
    var arms = Map.empty[String, Int].withDefaultValue(0)
    var names = 0
    for (i <- 0 until 300) {
      val h = md5hex(s"gz-$i")
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val m = Multimodal.parseGzip(i.toLong, Multimodal.gzipBytes(h))
      val expected =
        if (b(12) % 16 == 1) "bad_magic"
        else if (b(14) % 8 == 5) "truncated"
        else if (b(15) % 16 == 9) "bad_data"
        else "ok"
      assert(m.status == expected, s"$h: ${m.status} != $expected")
      arms += expected -> (arms(expected) + 1)
      if (expected == "ok") {
        val k = 1 + b(2) % 3
        assert(m.n_bytes.contains(66 * k))
        assert(m.n_sep.contains(2L * k))
        if (m.has_name.contains(1)) names += 1
      }
    }
    for (s <- Seq("ok", "bad_magic", "truncated", "bad_data"))
      assert(arms(s) > 0, s"arm $s never fired")
    assert(names > 0, "FNAME skip path never exercised")
  }

  test("warc: records round-trip, arms fire, and the URI survives the member") {
    var arms = Map.empty[String, Int].withDefaultValue(0)
    for (i <- 0 until 300) {
      val h = md5hex(s"warc-$i")
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val m = Multimodal.parseWarc(i.toLong, Multimodal.warcBytes(h))
      val expected =
        if (b(12) % 16 == 1) "bad_magic"
        else if (b(14) % 8 == 5) "truncated"
        else if (b(15) % 16 == 9) "bad_data"
        else "ok"
      assert(m.status == expected, s"$h: ${m.status} != $expected")
      arms += expected -> (arms(expected) + 1)
      if (expected == "ok") {
        assert(m.url.contains(Multimodal.urlSynth(h)))
        assert(m.body_bytes.contains(66 * (1 + b(2) % 3)))
      } else assert(m.url.isEmpty)
    }
    for (s <- Seq("ok", "bad_magic", "truncated", "bad_data"))
      assert(arms(s) > 0, s"arm $s never fired")
  }

  test("warc doc round trip: arbitrary bodies survive the gzip member exactly") {
    // the crawl pipeline's whole oracle rests on this: an ok-decoded
    // member must reproduce the caller's body BYTE-FOR-BYTE (both
    // deflate arms), and the failure arms must degrade to status rows
    var okSeen = 0
    for (seed <- 0 until 200) {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"body$seed".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString
      val body = s"doc $seed text with spaces and 555-01$seed digits " * (1 + seed % 4)
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val expectFail = b(12) % 16 == 1 || b(14) % 8 == 5 || b(15) % 16 == 9
      val m = Multimodal.parseWarcDoc(seed.toLong,
        Multimodal.warcMemberBytes(h, body))
      if (expectFail) assert(m.status != "ok" && m.body.isEmpty)
      else {
        okSeen += 1
        assert(m.status == "ok", s"$seed: ${m.status}")
        assert(m.url.contains(Multimodal.urlSynth(h)))
        assert(m.body.contains(body), s"$seed: body mangled")
      }
    }
    assert(okSeen > 100, s"only $okSeen ok arms — fixture bits skewed")
  }

  test("warc: a decodable non-WARC member is bad_record, never a throw") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("just some text, no record header".getBytes("US-ASCII"))
    gz.close()
    val m = Multimodal.parseWarc(90L, bos.toByteArray)
    assert(m.status == "bad_record" && m.url.isEmpty)
    // and a record with version line but no URI header
    val bos2 = new java.io.ByteArrayOutputStream()
    val gz2 = new java.util.zip.GZIPOutputStream(bos2)
    gz2.write("WARC/1.0\nWARC-Type: response\n\nbody".getBytes("US-ASCII"))
    gz2.close()
    assert(Multimodal.parseWarc(91L, bos2.toByteArray).status == "bad_record")
  }

  // ----------------------------- PNG -----------------------------

  /** Independent mini-model of the fixture's logical pixels + arms —
    * mirrors the DuckDB twin, never the Scala encoder/decoder. */
  private def pngModel(h: String): (Array[Int], Int, Int, Map[String, Boolean]) = {
    val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
    val w = 1 + b(0) % 4; val ht = 1 + b(1) % 4
    val px = Array.tabulate(w * ht * 3) { k =>
      val i = k / 3
      val idx = b(5 + (i / 3) % 8) % 4
      (k % 3) match {
        case 0 => (b(2) + 7 * idx) % 256
        case 1 => (b(3) + 11 * idx) % 256
        case _ => (b(4) + 13 * idx) % 256
      }
    }
    (px, w, ht, Map(
      "badMagic" -> (b(12) % 16 == 0), "badCrc" -> (b(8) % 16 == 7),
      "trunc" -> (b(14) % 8 == 3), "badAdler" -> (b(15) % 16 == 5),
      "split" -> (b(10) % 4 == 0)))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("PNG sweep: 300 synthesized files match the independent pixel model") {
    var oks = 0; var arms = Map.empty[String, Int].withDefaultValue(0)
    for (i <- 0 until 300) {
      val h = md5hex(s"png-sweep-$i")
      val (px, w, ht, a) = pngModel(h)
      val m = Multimodal.parsePng(i.toLong, Multimodal.pngBytes(h))
      val expected =
        if (a("badMagic")) "bad_magic"
        else if (a("badCrc")) "bad_header"
        else if (a("trunc")) "truncated"
        else if (a("badAdler")) "bad_data"
        else "ok"
      assert(m.status == expected, s"$h: ${m.status} != $expected")
      if (expected == "ok") {
        oks += 1
        assert(m.width.contains(w) && m.height.contains(ht))
        assert(m.n_idat.contains(if (a("split")) 2 else 1))
        assert(m.r_sum.contains(
          (0 until w * ht).map(j => px(3 * j).toLong).sum))
        assert(m.g_sum.contains(
          (0 until w * ht).map(j => px(3 * j + 1).toLong).sum))
        assert(m.b_sum.contains(
          (0 until w * ht).map(j => px(3 * j + 2).toLong).sum))
        assert(m.px_min.contains(px.min) && m.px_max.contains(px.max))
        assert(m.row0_sum.contains((0 until 3 * w).map(px(_).toLong).sum))
      } else arms += expected -> (arms(expected) + 1)
    }
    // every arm and the ok path must actually fire across the sweep
    assert(oks > 100, s"only $oks ok fixtures")
    for (s <- Seq("bad_magic", "bad_header", "truncated", "bad_data"))
      assert(arms(s) > 0, s"arm $s never fired in the sweep")
  }

  test("PNG inflate decodes java.util.zip.Deflater output (dynamic Huffman)") {
    // an INDEPENDENT reference encoder: JDK zlib at several levels over
    // data shapes that force dynamic-Huffman blocks and long matches
    val rnd = new scala.util.Random(42)
    val shapes = Seq(
      Array.fill(2000)(rnd.nextInt(8).toByte), // low-entropy → dynamic
      Array.tabulate(4096)(i => (i % 97).toByte), // periodic → LZ77
      Array.fill(300)(rnd.nextInt(256).toByte), // high-entropy
      Array.fill(70000)(rnd.nextInt(4).toByte)) // multi-block
    for (data <- shapes; level <- Seq(1, 6, 9)) {
      val d = new java.util.zip.Deflater(level)
      d.setInput(data); d.finish()
      val buf = new Array[Byte](data.length + 1024)
      val n = d.deflate(buf)
      d.end()
      val (out, adOk) = Multimodal.zlibInflate(buf, 0, n, data.length)
      assert(adOk, s"adler mismatch at level $level")
      assert(java.util.Arrays.equals(out, data),
        s"inflate mismatch: ${data.length} bytes at level $level")
    }
  }

  test("PNG: all five filter types invert (fixed-Huffman and stored)") {
    // b(6..9) drive row filters ft = b(6+r%8) % 5; find hashes whose
    // first rows exercise each filter type and both compression arms
    var seen = Set.empty[(Int, Boolean)]
    var i = 0
    while (seen.size < 10 && i < 4000) {
      val h = md5hex(s"png-filter-$i")
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val (px, w, ht, a) = pngModel(h)
      if (!a("badMagic") && !a("badCrc") && !a("trunc") && !a("badAdler")) {
        val m = Multimodal.parsePng(0L, Multimodal.pngBytes(h))
        assert(m.status == "ok")
        assert(m.r_sum.contains(
          (0 until w * ht).map(j => px(3 * j).toLong).sum), s"h=$h")
        for (r <- 0 until ht) seen += ((b(6 + r % 8) % 5, b(13) % 2 == 0))
      }
      i += 1
    }
    assert(seen.map(_._1) == Set(0, 1, 2, 3, 4),
      s"filters seen: ${seen.map(_._1)}")
    assert(seen.map(_._2) == Set(true, false)) // both compression arms
  }

  test("PNG failure paths are rows, never throws") {
    assert(Multimodal.parsePng(90L, null).status == "bad_magic")
    assert(Multimodal.parsePng(91L,
      Array[Byte](0x42, 0x4d, 0, 0)).status == "bad_magic")
    // a no-arm fixture, then surgical corruption
    val h = Iterator.from(0).map(i => md5hex(s"png-ok-$i")).find { hh =>
      val (_, _, _, a) = pngModel(hh)
      !a("badMagic") && !a("badCrc") && !a("trunc") && !a("badAdler")
    }.get
    val full = Multimodal.pngBytes(h)
    assert(Multimodal.parsePng(92L, full).status == "ok")
    // cut mid-IDAT: chunk length outruns the payload
    assert(Multimodal.parsePng(93L, full.take(full.length - 20))
      .status == "truncated")
    // cut inside IHDR
    assert(Multimodal.parsePng(94L, full.take(12)).status == "truncated")
    // flip one IDAT payload byte: the chunk CRC catches it → bad_data
    val flipped = full.clone()
    flipped(full.length - 20) = (flipped(full.length - 20) ^ 0x7f).toByte
    val st = Multimodal.parsePng(95L, flipped).status
    assert(st == "bad_data" || st == "bad_header", st)
  }

  test("JPEG sweep: 300 synthesized files match the independent pixel model") {
    // Independent model: the frequency-domain fixture decodes EXACTLY
    // to 128 + d0 + d4*sigma(x)*sigma(y) per component (see the codec
    // block note) — recompute pixels + the integer YCbCr->RGB here,
    // with none of the decoder's machinery, and compare every stat.
    val sig = Array(1, -1, -1, 1, 1, -1, -1, 1)
    def fd(x: Long): Int = (((x + 32768L + (1L << 30)) >> 16) - 16384L).toInt
    def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var oks = 0; var arms = Map.empty[String, Int].withDefaultValue(0)
    var grayOks = 0; var subOks = 0; var sub422Oks = 0
    var driOks = 0; var progOks = 0; var progDriOks = 0
    for (i <- 0 until 300) {
      val h = md5hex(s"jpeg-sweep-$i")
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val badMagic = b(11) % 16 == 9
      val prog = !badMagic && b(12) % 16 == 11
      val prec12 = !badMagic && b(7) % 8 == 3
      val trunc = !badMagic && !prog && b(13) % 8 == 5
      val gray = b(9) % 8 == 6
      val sub420 = !gray && b(8) % 4 == 2
      val sub422 = !gray && !sub420 && b(8) % 4 == 1
      val wScale = if (sub420 || sub422) 16 else 8
      val hScale = if (sub420) 16 else 8
      val w = wScale * (1 + b(0) % 2); val hgt = hScale * (1 + b(1) % 2)
      val m = Multimodal.parseJpeg(i.toLong, Multimodal.jpegBytes(h))
      val expected =
        if (badMagic) "bad_magic"
        else if (prec12) "unsupported" // 12-bit precision, SOF-probed
        else if (trunc) "truncated" else "ok"
      assert(m.status == expected, s"$h: ${m.status} != $expected")
      if (expected == "ok") {
        oks += 1
        assert(m.width.contains(w) && m.height.contains(hgt))
        val nb = (w / 8) * (hgt / 8)
        assert(m.n_blocks.contains(
          if (gray) nb
          else if (sub420) nb + 2 * (w / 16) * (hgt / 16)
          else if (sub422) nb + 2 * (w / 16) * (hgt / 8)
          else nb * 3))
        var rs = 0L; var gs = 0L; var bs = 0L; var r0 = 0L
        var mn = 255; var mx = 0
        for (y <- 0 until hgt; x <- 0 until w) {
          val bi = (y / 8) * (w / 8) + x / 8
          val sg = sig(x % 8) * sig(y % 8)
          def v(c: Int) = 128 + (b((2 + 3 * c + bi) % 16) % 48 - 24) +
            (b((7 + 2 * c + bi) % 16) % 32 - 16) * sg
          // 4:2:0 chroma: one block per 16x16 MCU, floor-mapped x/2,y/2
          val bic = (y / 16) * (w / 16) + x / 16
          val sgc = sig((x % 16) / 2) * sig((y % 16) / 2)
          def vc(c: Int) = 128 + (b((2 + 3 * c + bic) % 16) % 48 - 24) +
            (b((7 + 2 * c + bic) % 16) % 32 - 16) * sgc
          // 4:2:2 chroma: one block per 16x8 MCU, floor-mapped x/2
          val bic2 = (y / 8) * (w / 16) + x / 16
          val sgc2 = sig((x % 16) / 2) * sig(y % 8)
          def vc2(c: Int) = 128 + (b((2 + 3 * c + bic2) % 16) % 48 - 24) +
            (b((7 + 2 * c + bic2) % 16) % 32 - 16) * sgc2
          val yv = v(0)
          val (cb, cr) =
            if (gray) (128, 128)
            else if (sub420) (vc(1), vc(2))
            else if (sub422) (vc2(1), vc2(2))
            else (v(1), v(2))
          val r = cl(yv + fd(91881L * (cr - 128)))
          val g = cl(yv - fd(22554L * (cb - 128) + 46802L * (cr - 128)))
          val bb = cl(yv + fd(116130L * (cb - 128)))
          rs += r; gs += g; bs += bb
          mn = math.min(mn, math.min(r, math.min(g, bb)))
          mx = math.max(mx, math.max(r, math.max(g, bb)))
          if (y == 0) r0 += r + g + bb
        }
        assert(m.r_sum.contains(rs) && m.g_sum.contains(gs) &&
          m.b_sum.contains(bs), s"$h sums")
        assert(m.px_min.contains(mn) && m.px_max.contains(mx))
        assert(m.row0_sum.contains(r0))
        if (gray) grayOks += 1
        if (sub420) subOks += 1
        if (sub422) sub422Oks += 1
        if (b(10) % 4 == 3) driOks += 1
        if (prog) progOks += 1
        if (prog && b(10) % 4 == 3) progDriOks += 1
      } else {
        arms += expected -> (arms(expected) + 1)
        if (expected != "bad_magic") // header probe still reports dims
          assert(m.width.contains(w) && m.height.contains(hgt), s"$h dims")
      }
    }
    assert(oks > 100, s"only $oks ok fixtures")
    for (st <- Seq("bad_magic", "unsupported", "truncated"))
      assert(arms(st) > 0, s"arm $st never fired in the sweep")
    // the color-structure, restart, and progressive arms must each be
    // exercised on the exact-match path, not just exist in the synth
    assert(grayOks > 5, s"grayscale arm thin: $grayOks")
    assert(subOks > 5, s"4:2:0 arm thin: $subOks")
    assert(sub422Oks > 5, s"4:2:2 arm thin: $sub422Oks")
    assert(driOks > 5, s"restart-interval arm thin: $driOks")
    assert(progOks > 5, s"progressive arm thin: $progOks")
    // the COMPOSED progressive+restart arm must fire on the exact path
    assert(progDriOks > 0, s"progressive+DRI never composed: $progDriOks")
  }

  test("JPEG progressive: multi-scan SOF2 streams decode exactly; scans carry real bits") {
    def b(h: String, i: Int) =
      Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16)
    // a color, multi-MCU, progressive, no-other-arm fixture
    val h = (0 until 4096).map(i => md5hex(s"jpeg-prog-$i")).find { h =>
      b(h, 11) % 16 != 9 && b(h, 12) % 16 == 11 && b(h, 7) % 8 != 3 &&
        b(h, 9) % 8 != 6 && (b(h, 0) % 2 == 1 || b(h, 1) % 2 == 1)
    }.get
    val bytes = Multimodal.jpegBytes(h)
    def offsets(m: Int): Seq[Int] = bytes.indices.dropRight(1).filter(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)
    // structure: an SOF2 frame and the full 11-scan plan (2 DC scans +
    // 3 AC band scans × 3 components), each its own SOS — byte
    // stuffing guarantees FFDA can't appear inside entropy data
    assert(offsets(0xc2).size == 1, "SOF2 missing")
    assert(offsets(0xc0).isEmpty, "baseline SOF0 in a progressive arm")
    val sos = offsets(0xda)
    assert(sos.size == 11, s"expected 11 scans, got ${sos.size}")
    val m = Multimodal.parseJpeg(1L, bytes)
    assert(m.status == "ok", m.status)
    // the sweep test proves pixel exactness; here prove the LAST
    // refinement scan carries real information: decoding the stream
    // with that scan dropped (a legal progressive prefix + EOI) must
    // change the pixels for some fixture in the family
    val anyDiff = (0 until 64).exists { j =>
      val hh = Iterator.from(j * 977).map(i => md5hex(s"jpeg-prog-$i"))
        .find(x => b(x, 11) % 16 != 9 && b(x, 12) % 16 == 11 &&
          b(x, 7) % 8 != 3).get
      val full = Multimodal.jpegBytes(hh)
      val so = full.indices.dropRight(1).filter(i =>
        (full(i) & 0xff) == 0xff && (full(i + 1) & 0xff) == 0xda)
      val cut = full.take(so.last) ++ Array[Byte](0xff.toByte, 0xd9.toByte)
      val fullM = Multimodal.parseJpeg(2L, full)
      val cutM = Multimodal.parseJpeg(3L, cut)
      cutM.status == "ok" && fullM.r_sum != cutM.r_sum
    }
    assert(anyDiff, "dropping the last refinement scan never moved a pixel")
    // truncation mid-scan is still a status row
    assert(Multimodal.parseJpeg(4L, bytes.dropRight(5)).status == "truncated")
  }

  test("PDF sweep: 300 synthesized files match the independent text model") {
    // Independent model: statuses from the arm bytes, the embedded
    // text rebuilt directly from the md5 hex (never via pdfBytes'
    // internals), md5 recomputed here — a green sweep proves header,
    // xref, object graph, inflate, and the string/Tj/TJ tokenizer
    // round-trip the text losslessly, escapes included.
    var oks = 0; var escOks = 0; var twoPageOks = 0
    var hexOks = 0; var chainOks = 0
    var arms = Map.empty[String, Int].withDefaultValue(0)
    for (i <- 0 until 300) {
      val h = md5hex(s"pdf-sweep-$i")
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val badMagic = b(11) % 16 == 7
      val trunc = !badMagic && b(13) % 8 == 6
      val badXref = !badMagic && !trunc && b(12) % 8 == 5
      val badObj = !badMagic && !trunc && !badXref && b(15) % 8 == 1
      val badFlate = !badMagic && !trunc && !badXref && !badObj &&
        b(14) % 8 == 3
      val armsClear = !badMagic && !trunc && !badXref && !badObj &&
        !badFlate
      // r18: b9%8==2 (single AHx) and ==4 ([/AHx /Fl] chain) are
      // SUPPORTED ok paths now; only the genuine ASCII85 arm gates
      val hexFilter = armsClear && b(9) % 8 == 2
      val hexFlateChain = armsClear && b(9) % 8 == 4
      val a85Filter = armsClear && b(9) % 8 == 5
      val esc = b(10) % 4 == 1
      val np = 1 + b(0) % 2
      val expected =
        if (badMagic) "bad_magic"
        else if (trunc) "truncated"
        else if (badXref) "bad_xref"
        else if (badObj) "bad_object"
        else if (badFlate) "bad_flate"
        else if (a85Filter) "unsupported" else "ok"
      val m = Multimodal.parsePdf(i.toLong, Multimodal.pdfBytes(h))
      assert(m.status == expected, s"$h: ${m.status} != $expected")
      if (expected == "ok") {
        oks += 1
        if (esc) escOks += 1
        if (np == 2) twoPageOks += 1
        if (hexFilter) hexOks += 1
        if (hexFlateChain) chainOks += 1
        // the -250 TJ kern between the two array strings is a WORD
        // BREAK (>= the 180-milli-em threshold) — one space
        def page(pg: Int): String =
          s"Page $pg: ${h.substring(2 * pg, 2 * pg + 8)}" +
            (if (esc) " ()\\" else "") +
            h.substring(8, 12) + " " + h.substring(12, 16)
        val txt = (0 until np).map(page).mkString("\n")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(txt.getBytes("ISO-8859-1"))
          .map(x => f"${x & 0xff}%02x").mkString
        assert(m.n_pages.contains(np) && m.n_objects.contains(3 + 2 * np),
          s"$h census")
        assert(m.n_text_ops.contains(2 * np), s"$h ops")
        assert(m.n_chars.contains(txt.length), s"$h chars")
        assert(m.text_md5.contains(md), s"$h md5")
      } else {
        arms += expected -> (arms(expected) + 1)
        if (expected == "bad_flate" || expected == "unsupported")
          assert(m.n_pages.contains(np) && m.n_objects.contains(3 + 2 * np),
            s"$h $expected-arm census")
        if (expected == "bad_object")
          assert(m.n_pages.isEmpty && m.n_objects.contains(3 + 2 * np),
            s"$h obj-arm census")
        assert(m.text_md5.isEmpty, s"$h arm must not extract")
      }
    }
    assert(oks > 100, s"only $oks ok fixtures")
    for (st <- Seq("bad_magic", "truncated", "bad_xref", "bad_object",
        "bad_flate", "unsupported"))
      assert(arms(st) > 0, s"arm $st never fired in the sweep")
    assert(escOks > 5, s"escape arm thin on the exact path: $escOks")
    assert(twoPageOks > 5, s"two-page arm thin: $twoPageOks")
    // both hex paths must land on the EXACT text path (hash-checked
    // above), or the filter dispatch / chain order is untested
    assert(hexOks > 5, s"single-AHx arm thin on the exact path: $hexOks")
    assert(chainOks > 5, s"[/AHx /Fl] chain arm thin: $chainOks")
    // corrupt-hex negative: a non-hex byte inside an AHx stream (or
    // its missing `>` EOD) must land on bad_data, never extract
    val hh = Iterator.from(0).map(i => md5hex(s"pdf-hexbad-$i")).find { x =>
      val bb = x.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      bb(11) % 16 != 7 && bb(13) % 8 != 6 && bb(12) % 8 != 5 &&
        bb(15) % 8 != 1 && bb(14) % 8 != 3 && bb(9) % 8 == 2
    }.get
    val good = Multimodal.pdfBytes(hh)
    val sAt = new String(good, "ISO-8859-1").indexOf("stream\n",
      new String(good, "ISO-8859-1").indexOf("/ASCIIHexDecode")) + 7
    val corrupt = good.clone(); corrupt(sAt + 3) = 'q'.toByte
    assert(Multimodal.parsePdf(9L, corrupt).status == "bad_data")
    val noEod = good.clone(); noEod(new String(good, "ISO-8859-1")
      .indexOf(">", sAt)) = ' '.toByte
    assert(Multimodal.parsePdf(9L, noEod).status == "bad_data")
  }

  test("JPEG oriented sweep: 300 Exif files match the independent oriented model") {
    // Independent model: the SAME per-pixel recomputation as the JPEG
    // sweep, composed with the Exif fixture's orientation byte model
    // (1 + b3 % 8; default 1 on the no-APP1 / bad-TIFF arms) applied
    // as the 8 index maps — none of the decoder's or the sink's
    // machinery. Every one of the 8 tag values must fire on the
    // exact-match path, or the map for that value is untested.
    val sig = Array(1, -1, -1, 1, 1, -1, -1, 1)
    def fd(x: Long): Int = (((x + 32768L + (1L << 30)) >> 16) - 16384L).toInt
    def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var oks = 0
    val orientOks = new Array[Int](9)
    for (i <- 0 until 300) {
      val h = md5hex(s"jpeg-osweep-$i")
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val badMagic = b(11) % 16 == 9
      val prog = !badMagic && b(12) % 16 == 11
      val prec12 = !badMagic && b(7) % 8 == 3
      val trunc = !badMagic && !prog && b(13) % 8 == 5
      val gray = b(9) % 8 == 6
      val sub420 = !gray && b(8) % 4 == 2
      val sub422 = !gray && !sub420 && b(8) % 4 == 1
      val wScale = if (sub420 || sub422) 16 else 8
      val hScale = if (sub420) 16 else 8
      val w = wScale * (1 + b(0) % 2); val hgt = hScale * (1 + b(1) % 2)
      val orient =
        if (badMagic || b(6) % 8 == 1 || b(5) % 8 == 2) 1
        else 1 + b(3) % 8
      val m = Multimodal.parseJpegOriented(
        i.toLong, Multimodal.jpegExifBytes(h))
      val expected =
        if (badMagic) "bad_magic"
        else if (prec12) "unsupported"
        else if (trunc) "truncated" else "ok"
      assert(m.status == expected, s"$h: ${m.status} != $expected")
      assert(m.orientation == orient, s"$h orient")
      if (expected != "bad_magic") {
        assert(m.ow.contains(if (orient >= 5) hgt else w), s"$h ow")
        assert(m.oh.contains(if (orient >= 5) w else hgt), s"$h oh")
      }
      if (expected == "ok") {
        oks += 1; orientOks(orient) += 1
        var chk = 0L; var row0w = 0L; var rs = 0L
        for (y <- 0 until hgt; x <- 0 until w) {
          val bi = (y / 8) * (w / 8) + x / 8
          val sg = sig(x % 8) * sig(y % 8)
          def v(c: Int) = 128 + (b((2 + 3 * c + bi) % 16) % 48 - 24) +
            (b((7 + 2 * c + bi) % 16) % 32 - 16) * sg
          val bic = (y / 16) * (w / 16) + x / 16
          val sgc = sig((x % 16) / 2) * sig((y % 16) / 2)
          def vc(c: Int) = 128 + (b((2 + 3 * c + bic) % 16) % 48 - 24) +
            (b((7 + 2 * c + bic) % 16) % 32 - 16) * sgc
          val bic2 = (y / 8) * (w / 16) + x / 16
          val sgc2 = sig((x % 16) / 2) * sig(y % 8)
          def vc2(c: Int) = 128 + (b((2 + 3 * c + bic2) % 16) % 48 - 24) +
            (b((7 + 2 * c + bic2) % 16) % 32 - 16) * sgc2
          val yv = v(0)
          val (cb, cr) =
            if (gray) (128, 128)
            else if (sub420) (vc(1), vc(2))
            else if (sub422) (vc2(1), vc2(2))
            else (v(1), v(2))
          val r = cl(yv + fd(91881L * (cr - 128)))
          val g = cl(yv - fd(22554L * (cb - 128) + 46802L * (cr - 128)))
          val bb = cl(yv + fd(116130L * (cb - 128)))
          val ox = orient match {
            case 2 | 3 => w - 1 - x
            case 5 | 8 => y
            case 6 | 7 => hgt - 1 - y
            case _ => x
          }
          val oy = orient match {
            case 3 | 4 => hgt - 1 - y
            case 5 | 6 => x
            case 7 | 8 => w - 1 - x
            case _ => y
          }
          val ow = if (orient >= 5) hgt else w
          chk += (r + 2L * g + 3L * bb) * ((oy.toLong * ow + ox) % 997L)
          if (oy == 0) row0w += (ox + 1L) * (r + g + bb)
          rs += r
        }
        assert(m.o_checksum.contains(chk), s"$h checksum")
        assert(m.o_row0_wsum.contains(row0w), s"$h row0")
        assert(m.r_sum.contains(rs), s"$h r_sum")
      } else
        assert(m.o_checksum.isEmpty && m.o_row0_wsum.isEmpty, s"$h arm")
    }
    assert(oks > 100, s"only $oks ok fixtures")
    for (o <- 1 to 8)
      assert(orientOks(o) > 0, s"orientation $o never fired on the ok path")
  }

  test("oriented dHash matches the independent oriented-raster model; orientation matters") {
    // Independent model: rebuild the gray raster per pixel (the JPEG
    // sweep arithmetic), apply the inverse orientation map at the 9×8
    // sampling grid, pack the 64 comparisons — none of the sink or
    // decoder machinery. The `differs` counter pins the CLAIM of the
    // operator: for some non-identity orientations the oriented hash
    // must differ from the raw storage-order hash (otherwise the
    // orient step would be dead code and mirrored re-uploads would
    // still dodge dedup).
    val sig = Array(1, -1, -1, 1, 1, -1, -1, 1)
    def fd(x: Long): Int = (((x + 32768L + (1L << 30)) >> 16) - 16384L).toInt
    def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var checked = 0; var differs = 0
    for (i <- 0 until 150) {
      val h = md5hex(s"jpeg-ophash-$i")
      val b = h.sliding(2, 2).map(Integer.parseInt(_, 16)).toArray
      val m = Multimodal.jpegOrientedDhash(
        i.toLong, Multimodal.jpegExifBytes(h))
      if (m.status == "ok") {
        checked += 1
        val gray = b(9) % 8 == 6
        val sub420 = !gray && b(8) % 4 == 2
        val sub422 = !gray && !sub420 && b(8) % 4 == 1
        val wScale = if (sub420 || sub422) 16 else 8
        val hScale = if (sub420) 16 else 8
        val w = wScale * (1 + b(0) % 2); val hgt = hScale * (1 + b(1) % 2)
        val orient =
          if (b(6) % 8 == 1 || b(5) % 8 == 2) 1 else 1 + b(3) % 8
        val g2 = Array.ofDim[Int](hgt, w)
        for (y <- 0 until hgt; x <- 0 until w) {
          val bi = (y / 8) * (w / 8) + x / 8
          val sg = sig(x % 8) * sig(y % 8)
          def v(c: Int) = 128 + (b((2 + 3 * c + bi) % 16) % 48 - 24) +
            (b((7 + 2 * c + bi) % 16) % 32 - 16) * sg
          val bic = (y / 16) * (w / 16) + x / 16
          val sgc = sig((x % 16) / 2) * sig((y % 16) / 2)
          def vc(c: Int) = 128 + (b((2 + 3 * c + bic) % 16) % 48 - 24) +
            (b((7 + 2 * c + bic) % 16) % 32 - 16) * sgc
          val bic2 = (y / 8) * (w / 16) + x / 16
          val sgc2 = sig((x % 16) / 2) * sig(y % 8)
          def vc2(c: Int) = 128 + (b((2 + 3 * c + bic2) % 16) % 48 - 24) +
            (b((7 + 2 * c + bic2) % 16) % 32 - 16) * sgc2
          val yv = v(0)
          val (cb, cr) =
            if (gray) (128, 128)
            else if (sub420) (vc(1), vc(2))
            else if (sub422) (vc2(1), vc2(2))
            else (v(1), v(2))
          g2(y)(x) = cl(yv + fd(91881L * (cr - 128))) +
            cl(yv - fd(22554L * (cb - 128) + 46802L * (cr - 128))) +
            cl(yv + fd(116130L * (cb - 128)))
        }
        def hashFor(o: Int): (Long, Long) = {
          val ow = if (o >= 5) hgt else w
          val oh = if (o >= 5) w else hgt
          def og(ox: Int, oy: Int): Int = {
            val sx = o match {
              case 2 | 3 => w - 1 - ox
              case 5 | 6 => oy
              case 7 | 8 => w - 1 - oy
              case _ => ox
            }
            val sy = o match {
              case 3 | 4 => hgt - 1 - oy
              case 5 | 8 => ox
              case 6 | 7 => hgt - 1 - ox
              case _ => oy
            }
            g2(sy)(sx)
          }
          val gs = Array.tabulate(72)(k =>
            og((k % 9) * ow / 9, (k / 9) * oh / 8))
          var hi = 0L; var lo = 0L
          for (k <- 0 until 64) {
            val r = k / 8; val c = k % 8
            if (gs(r * 9 + c) < gs(r * 9 + c + 1)) {
              if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
            }
          }
          (hi, lo)
        }
        val (ehi, elo) = hashFor(orient)
        assert(m.dhash_hi.contains(ehi) && m.dhash_lo.contains(elo),
          s"$h orient=$orient hash")
        if (orient != 1 && (ehi, elo) != hashFor(1)) differs += 1
      }
    }
    assert(checked > 50, s"only $checked ok fixtures")
    assert(differs > 0,
      "no non-identity orientation ever changed the hash — dead orient step")
  }

  test("JPEG restart intervals: DRI fixtures carry RSTm and decode identically") {
    // find a multi-MCU DRI-armed fixture; its bytes must carry the DRI
    // segment and at least one restart marker, decode 'ok', and a
    // corrupted restart SEQUENCE must fail as bad_data (the modulo-8
    // check), never silently mis-decode.
    def b(h: String, i: Int) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16)
    val h = (0 until 4096).map(i => md5hex(s"jpeg-dri-$i")).find { h =>
      b(h, 10) % 4 == 3 && b(h, 11) % 16 != 9 && b(h, 12) % 16 != 11 &&
        b(h, 13) % 8 != 5 && (b(h, 0) % 2 == 1 || b(h, 1) % 2 == 1) // >1 MCU
    }.get
    val bytes = Multimodal.jpegBytes(h)
    def hasSeq(a: Array[Byte], m0: Int, m1: Int): Boolean =
      a.indices.dropRight(1).exists(i =>
        (a(i) & 0xff) == m0 && (a(i + 1) & 0xff) == m1)
    assert(hasSeq(bytes, 0xff, 0xdd), "DRI segment missing")
    assert(hasSeq(bytes, 0xff, 0xd0), "no RST0 between MCUs")
    val m = Multimodal.parseJpeg(1L, bytes)
    assert(m.status == "ok", m.status)
    // corrupt the first RST0 -> RST5: the modulo-8 sequence check must
    // reject it as corruption
    val i0 = bytes.indices.dropRight(1)
      .find(i => (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd0).get
    val bad = bytes.clone(); bad(i0 + 1) = 0xd5.toByte
    assert(Multimodal.parseJpeg(2L, bad).status == "bad_data")
  }
  test("trained zstd dictionary lifecycle: census-exact content, parseable bytes, frames decode against it") {
    // the build side of the RFC 8878 section-5 support: the persisted
    // zstd_dict artifact's binary bytes must (a) parse back to exactly
    // the content the gated census describes, and (b) serve as real
    // decode history for a frame that back-references it — the two
    // properties the DuckDB twin cannot check (it cannot re-derive
    // FSE/Huffman table bytes in SQL).
    val sf = "/root/testdata/sf0.001"
    val row = Multimodal.zstdDictDurable(spark, sf).head()
    val dictBytes = row.getAs[String]("dict_hex").sliding(2, 2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    val zd = Zstd.parseDict(dictBytes)
    assert(zd.nonEmpty, "trained dictionary must parse")
    val d = zd.get
    assert(d.id == Multimodal.ZstdDictId)
    assert(d.content.length == row.getAs[Long]("content_len"))
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(d.content).map(x => f"${x & 0xff}%02x").mkString
    assert(md5 == row.getAs[String]("content_md5"),
      "parsed content must equal the census content")
    // a frame back-referencing the trained history decodes exactly,
    // with the trained dict registered — and stays honestly
    // unsupported without it
    val (frame, want) = Zstd.dictDemoFrame(dictBytes,
      " and some fresh document text")
    val (st, c, nb, _) = Zstd.decode(frame, dicts = Map(d.id -> d))
    assert(st == "ok" && nb == 1)
    assert(java.util.Arrays.equals(c, want))
    assert(Zstd.decode(frame)._1 == "unsupported")
    // every truncation prefix stays total
    for (n <- 1 until frame.length)
      assert(Zstd.decode(frame.take(n), dicts = Map(d.id -> d))._1 != "ok")
  }

}
