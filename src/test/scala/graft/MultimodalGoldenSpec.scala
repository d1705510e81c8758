package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal

/** Cross-implementation goldens for the multimodal decode pipeline —
  * the same technique tools/graph_golden.py froze for g6: an
  * INDEPENDENT pure-Python implementation (tools/media_golden.py) of
  * generate → encode → decode → feature, built from the public
  * container specs with its own PNG/BMP/WAV/AVI writers and parsers,
  * froze src/test/resources/multimodal_golden.csv. The Scala pipeline
  * must reproduce every row: exact metadata, features within 1e-5
  * (float32-vs-float64 accumulation gap; a single mispixeled histogram
  * bin would diverge by ~4e-3).
  *
  * Together with the llm_multimodal_* SQL oracles (which re-derive the
  * metadata recipe per doc_id inside DuckDB), this closes the decode
  * surface: the driver hash-checks the metadata round trip at every SF
  * and this spec pins the content decode bytes-to-features.
  */
class MultimodalGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-mm-golden")

  test("decodeAll matches the independent pure-Python decoder goldens") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/multimodal_golden.csv"), "UTF-8")
    val golden = try {
      src.getLines().drop(1).map { l =>
        val f = l.split(",")
        f(0).toLong -> ((f(1), f(2), f(3).toInt, f(4).toInt, f(5).toInt,
          f(6).toInt, f(7).toInt, f.drop(8).map(_.toFloat)))
      }.toMap
    } finally src.close()
    assert(golden.size == 30)

    val docs = spark.range(30).toDF("doc_id")
    val decoded =
      Multimodal.decodeAll(Multimodal.syntheticMedia(spark, docs)).collect()
    assert(decoded.length == golden.size)

    decoded.foreach { d =>
      val (kind, fmt, w, h, nf, sr, dur, feat) = golden(d.media_id)
      assert(d.kind == kind && d.format == fmt,
        s"id=${d.media_id}: got (${d.kind}, ${d.format}), want ($kind, $fmt)")
      assert((d.width, d.height, d.n_frames, d.sample_rate, d.duration_ms)
        == ((w, h, nf, sr, dur)),
        s"id=${d.media_id} meta: got (${d.width}, ${d.height}, " +
          s"${d.n_frames}, ${d.sample_rate}, ${d.duration_ms}), " +
          s"want ($w, $h, $nf, $sr, $dur)")
      assert(d.feature.length == feat.length)
      d.feature.zip(feat).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) <= 1e-5f,
          s"id=${d.media_id} feature[$i]: scala=$a python=$b")
      }
    }
  }

  test("image near-dup finds planted near-identical rasters only") {
    import spark.implicits._
    import graft.llm.{ImageDedup, MediaHeaders}
    // base: a 32x24 gradient; near: same but ONE pixel flipped; far: an
    // unrelated checkerboard. aHash/dHash must pair (1,2) and leave 3
    // unpaired — and the PNG encoding of the same raster must hash
    // identically to the BMP one (decode-path independence).
    val (w, h) = (32, 24)
    val base = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 7 % 256) << 16) | ((y * 5 % 256) << 8) | ((x + y) % 256)
    }
    val near = base.clone(); near(5 * w + 7) = 0xffffff
    val far = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0x000000
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", MediaHeaders.bmpBytesRgb(w, h, base)),
      Multimodal.MediaRow(2L, "image", MediaHeaders.bmpBytesRgb(w, h, near)),
      Multimodal.MediaRow(3L, "image", MediaHeaders.bmpBytesRgb(w, h, far)),
      Multimodal.MediaRow(4L, "image", MediaHeaders.pngBytesRgb(w, h, base, 2))
    ).toDS()
    val hashes = ImageDedup.imageHashes(media).toDF()
    val pairs = ImageDedup.nearDup(hashes, maxHamming = 2, bands = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // the one-pixel variant pairs with base (both hash encodings of it)
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"planted near-dup (1,2) not found in $pairs")
    // PNG and BMP encodings of the SAME raster are Hamming-0 twins
    assert(pairs.contains((1L, 4L, 0L, 0L)),
      s"cross-format identical pair (1,4) not exact in $pairs")
    // the checkerboard pairs with nothing
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated image spuriously paired: $pairs")
  }
}
