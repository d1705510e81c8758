package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{HyperplaneUtil, MinHashUtil, SimHashUtil}
import graft.llm.MediaHeaders

/** Pure-JVM ScalaCheck properties over the native expression kernels and
  * the media-header codecs (no Spark session — hundreds of cases run in
  * milliseconds). These pin the FUSED implementations against their
  * definitional formulations, the same validation pattern the
  * shortest-path kernels use.
  */
object FunctionsPropertySpec extends Properties("GraftKernels") {

  private def utf8Array(ss: Seq[String]): GenericArrayData =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s)).toArray[Any])

  private val genToken: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(_.mkString)

  private val genTokens: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genToken))

  property("fused text-minhash == minhash over materialized shingles") =
    forAll(genTokens, Gen.choose(1, 4), Gen.choose(1, 64)) { (toks, w, k) =>
      val fused = MinHashUtil.computeText(utf8Array(toks), w, k)
      if (toks.size < w) fused.isEmpty
      else {
        val shingles = toks.sliding(w).map(_.mkString(" ")).toSeq
        val reference = MinHashUtil.compute(utf8Array(shingles), k)
        fused.sameElements(reference)
      }
    }

  property("simhash: distinct-token semantics (duplication-invariant)") =
    forAll(genTokens) { toks =>
      SimHashUtil.compute(utf8Array(toks)) ==
        SimHashUtil.compute(utf8Array(toks ++ toks.reverse))
    }

  private val genVec: Gen[List[Float]] =
    Gen.choose(1, 96).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0f, 100.0f)))

  property("hyperplane bits: deterministic and bounded to nBits") =
    forAll(genVec, Gen.choose(1, 64)) { (v, nBits) =>
      val arr = new GenericArrayData(v.toArray)
      val a = HyperplaneUtil.compute(arr, nBits)
      val b = HyperplaneUtil.compute(arr, nBits)
      a == b && (nBits == 64 || (a >>> nBits) == 0L)
    }

  private val genTail: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)

  property("png header round-trips") =
    forAll(Gen.choose(1, 1 << 20), Gen.choose(1, 1 << 20), genTail) {
      (w, h, tail) =>
        MediaHeaders.parse(MediaHeaders.pngBytes(w, h, tail))
          .contains(MediaHeaders.Meta("png", w, h, 1, 0, 0))
    }

  property("bmp header round-trips") =
    forAll(Gen.choose(1, 1 << 20), Gen.choose(1, 1 << 20), genTail) {
      (w, h, tail) =>
        MediaHeaders.parse(MediaHeaders.bmpBytes(w, h, tail))
          .contains(MediaHeaders.Meta("bmp", w, h, 1, 0, 0))
    }

  property("wav header round-trips") =
    forAll(Gen.choose(1, 192000), Gen.oneOf(1, 2), Gen.oneOf(8, 16),
      Gen.choose(0, 1000000), genTail) { (rate, ch, bits, nSamples, tail) =>
      val durMs = ((nSamples.toLong * 1000L) / rate).toInt
      MediaHeaders.parse(MediaHeaders.wavBytes(rate, ch, bits, nSamples, tail))
        .contains(MediaHeaders.Meta("wav", 0, 0, nSamples, rate, durMs))
    }

  property("avi header round-trips") =
    forAll(Gen.choose(1, 1 << 16), Gen.choose(1, 1 << 16),
      Gen.choose(0, 1000000), Gen.choose(1, 1000000), genTail) {
      (w, h, frames, usPerFrame, tail) =>
        val durMs = ((frames.toLong * usPerFrame) / 1000L).toInt
        MediaHeaders.parse(
            MediaHeaders.aviBytes(w, h, frames, usPerFrame, tail))
          .contains(MediaHeaders.Meta("avi", w, h, frames, 0, durMs))
    }

  property("token-set count equals naive occurrence count") =
    forAll(genTokens, Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, genToken))) { (toks, markers) =>
      val set = graft.functions.TokenSetCountUtil.buildSet(markers)
      val native = graft.functions.TokenSetCountUtil.count(utf8Array(toks), set)
      native == toks.count(markers.toSet)
    }

  property("truncated payloads never throw, they return None") =
    forAll(genTail) { bytes =>
      // any short/garbage prefix must parse to None or a real container,
      // never raise
      MediaHeaders.parse(bytes)
      true
    }
}
