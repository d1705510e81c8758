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

  test("video hashes: AVI decode ≡ recipe-derived pooled hashes") {
    import graft.llm.{ImageDedup, MediaDedup}
    // decode-based hashes must equal hashes computed straight from the
    // synthetic per-frame gradient recipe (what the SQL oracle does) —
    // proving the AVI round trip + stride sampling + majority pooling
    val videoIds = (0L until 60L).filter(_ % 3 == 2)
    val docs = spark.range(60).toDF("doc_id")
    val got = MediaDedup.videoHashes(
        Multimodal.syntheticMedia(spark, docs), stride = 4)
      .collect().map(r => r.media_id ->
        ((r.ahash_hi << 32) | r.ahash_lo, (r.dhash_hi << 32) | r.dhash_lo))
      .toMap
    assert(got.keySet === videoIds.toSet)
    videoIds.foreach { id =>
      val frames = 1 + (id % 16).toInt
      val (fw, fh) = (8 + (id % 17).toInt, 8 + ((id / 11) % 13).toInt)
      val hashes = (0 until frames by 4).map { fi =>
        val px = Array.tabulate(fw * fh) { i =>
          val x = i % fw; val y = i / fw
          (((x * 3 + fi * 11 + id) % 256).toInt << 16) |
            (((y * 7 + fi * 5) % 256).toInt << 8) |
            ((x + y + fi + id) % 256).toInt
        }
        ImageDedup.perceptualHashes(fw, fh, px)
      }
      val want = (MediaDedup.poolBits(hashes.map(_._1)),
        MediaDedup.poolBits(hashes.map(_._2)))
      assert(got(id) === want, s"video id=$id")
    }
  }

  test("audio hashes: WAV decode ≡ recipe-derived block hashes; gain-shift pairs") {
    import spark.implicits._
    import graft.llm.{ImageDedup, MediaDedup, MediaHeaders}
    // recipe equivalence on the synthetic corpus
    val docs = spark.range(60).toDF("doc_id")
    val got = MediaDedup.audioHashes(Multimodal.syntheticMedia(spark, docs))
      .collect().map(r => r.media_id ->
        ((r.ahash_hi << 32) | r.ahash_lo, (r.dhash_hi << 32) | r.dhash_lo))
      .toMap
    assert(got.keySet === (0L until 60L).filter(_ % 3 == 1).toSet)
    (0L until 60L).filter(_ % 3 == 1).foreach { id =>
      val rate = 8000 * (1 + ((id / 3) % 3).toInt)
      val nSamples = rate * (1 + (id % 5).toInt) / 100
      val period = 64 + (id % 192).toInt
      val samples = Array.tabulate(nSamples) { i =>
        val ph = i % period
        val tri = if (ph < period / 2) ph else period - ph
        ((tri * 4096 / math.max(1, period / 2)) - 2048).toShort
      }
      val want = MediaDedup.audioBlockHashes(samples).get
      assert(got(id) === want, s"audio id=$id")
    }
    // dHash is gain-invariant by construction: a half-volume copy of a
    // noise-ish signal keeps every block ordering, so the pair verifies
    // at Hamming 0 on dHash; an unrelated constant tone pairs with
    // nothing
    val rnd = new scala.util.Random(42)
    val sig = Array.tabulate(4000)(_ =>
      (rnd.nextInt(4096) - 2048).toShort)
    val halved = sig.map(s => (s / 2).toShort)
    val flat = Array.tabulate(4000)(i =>
      (if (i / 500 % 2 == 0) 2000 else -2000).toShort)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", MediaHeaders.wavBytesPcm16(8000, sig)),
      Multimodal.MediaRow(2L, "audio", MediaHeaders.wavBytesPcm16(8000, halved)),
      Multimodal.MediaRow(3L, "audio", MediaHeaders.wavBytesPcm16(8000, flat))
    ).toDS()
    val pairs = ImageDedup.nearDup(
        MediaDedup.audioHashes(media).toDF(), maxHamming = 2, bands = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"gain-shifted twin (1,2) not found in $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated tone spuriously paired: $pairs")
  }
}
