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
}
