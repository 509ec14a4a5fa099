package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the REAL P6 parser ([[Multimodal.parsePpm]]) on
  * hand-built byte streams — including netpbm shapes the md5-derived
  * fixture corpus cannot produce (multi-digit dimensions, multiple
  * comment lines, 2-byte-sample maxval), so the parser is proven
  * against the format, not just against the synthesizer. */
class MultimodalSpec extends AnyFunSuite {

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
}
