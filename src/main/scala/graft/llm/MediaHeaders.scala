package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** Real container-header synthesis + parsing for the multimodal surface.
  *
  * The byte layouts are public file-format knowledge:
  *  - PNG: 8-byte signature, then the IHDR chunk — width/height as
  *    big-endian int32 at offsets 16/20 (PNG spec, W3C).
  *  - BMP: "BM" magic; BITMAPINFOHEADER width/height as little-endian
  *    int32 at offsets 18/22 (Windows BMP spec).
  *  - WAV: RIFF/"WAVE" with a canonical 44-byte PCM header — channels
  *    (LE16 @22), sample rate (LE32 @24), bits/sample (LE16 @34), data
  *    size (LE32 @40).
  *  - AVI: RIFF/"AVI " with a LIST/hdrl/avih main header — µs/frame,
  *    total frames, width, height inside the 56-byte avih payload.
  *
  * `parse` is the real metadata-decode path (magic-byte dispatch + field
  * reads with bounds checks). Pixel/sample decode is real for BMP
  * (`bmpPixels`), WAV (`wavSamples`) AND PNG (`pngPixels` — zlib DEFLATE
  * ships in the JDK, so inflate + scanline de-filtering needs no
  * external codec); only AVI frame codecs stay out of scope (no video
  * codec in this container). The writers exist so the synthetic corpus
  * carries well-formed payloads and round-trip tests can pin the
  * parsers/decoders.
  */
object MediaHeaders {

  final case class Meta(format: String, width: Int, height: Int,
      nFrames: Int, sampleRate: Int, durationMs: Int)

  // ---- writers --------------------------------------------------------

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
    0x1a, 0x0a)

  def pngBytes(width: Int, height: Int, tail: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + 8 + 13 + tail.length)
      .order(ByteOrder.BIG_ENDIAN)
    b.put(PngSig)
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(width).putInt(height)
    b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.put(tail)
    b.array()
  }

  def bmpBytes(width: Int, height: Int, tail: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(54 + tail.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + tail.length)          // file size
    b.putInt(0).putInt(54)              // reserved, pixel-data offset
    b.putInt(40)                        // BITMAPINFOHEADER size
    b.putInt(width).putInt(height)
    b.putShort(1).putShort(24)          // planes, bpp
    b.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    b.put(tail)
    b.array()
  }

  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int, tail: Array[Byte]): Array[Byte] = {
    val dataSize = nSamples * channels * (bitsPerSample / 8)
    val b = ByteBuffer.allocate(44 + tail.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1)                       // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * channels * (bitsPerSample / 8))
    b.putShort((channels * bitsPerSample / 8).toShort)
    b.putShort(bitsPerSample.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.put(tail)
    b.array()
  }

  /** AVI with REAL uncompressed-DIB frames: RIFF('AVI '){ LIST hdrl
    * { avih }, LIST movi { one '00db' chunk per frame — a bottom-up
    * BGR24 raster with 4-byte row stride, the stock uncompressed-video
    * DIB layout } }. No codec involved; `aviFrames` below inverts it
    * exactly.
    */
  def aviBytesDib(width: Int, height: Int, microSecPerFrame: Int,
      frames: Array[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(frames.forall(_.length == width * height),
      s"every frame must be $width*$height pixels")
    val stride = (width * 3 + 3) & ~3
    val frameSize = stride * height      // multiple of 4 → no pad bytes
    val moviSize = 4 + frames.length * (8 + frameSize)
    val riffSize = 4 + (12 + 8 + 56) + (8 + moviSize)
    val b = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
    b.put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
    b.put("hdrl".getBytes("US-ASCII"))
    b.put("avih".getBytes("US-ASCII")).putInt(56)
    b.putInt(microSecPerFrame)
    b.putInt(0).putInt(0).putInt(0)
    b.putInt(frames.length)
    b.putInt(0).putInt(1).putInt(0)
    b.putInt(width).putInt(height)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    b.put("LIST".getBytes("US-ASCII")).putInt(moviSize)
    b.put("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      b.put("00db".getBytes("US-ASCII")).putInt(frameSize)
      var y = height - 1
      while (y >= 0) {                   // bottom row first
        var x = 0
        while (x < width) {
          val c = f(y * width + x)
          b.put((c & 0xff).toByte)
          b.put(((c >> 8) & 0xff).toByte)
          b.put(((c >> 16) & 0xff).toByte)
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        y -= 1
      }
    }
    b.array()
  }

  /** Extract the uncompressed '00db' DIB frames of an AVI payload as
    * row-major packed 0xRRGGBB rasters. Walks RIFF chunks with the same
    * word-alignment and bounds rules as `parse`; frames whose chunk
    * size doesn't match the header's dimensions are skipped (they would
    * be compressed or malformed data this decoder has no business
    * touching). None when the container isn't AVI or no frame decodes.
    */
  def aviFrames(p: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    val meta = parse(p) match {
      case Some(m) if m.format == "avi" && m.width > 0 && m.height > 0 => m
      case _ => return None
    }
    val w = meta.width; val h = meta.height
    if (w.toLong * h > (1L << 24)) return None // corrupt-dims bound
    val stride = (w * 3 + 3) & ~3
    val frameSize = stride * h
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var o = 12L
    while (o + 8 <= p.length) {
      val oi = o.toInt
      val size = math.max(0, leInt(p, oi + 4)).toLong
      if (tag(p, oi, "LIST") && o + 12 <= p.length && tag(p, oi + 8, "movi")) {
        var fo = o + 12
        val end = math.min(p.length.toLong, o + 8 + size)
        while (fo + 8 <= end) {
          val fi = fo.toInt
          val fsz = math.max(0, leInt(p, fi + 4)).toLong
          if (tag(p, fi, "00db") && fsz == frameSize &&
              fo + 8 + fsz <= end) {
            val rgb = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              val rowOff = fi + 8 + (h - 1 - y) * stride
              var x = 0
              while (x < w) {
                val b0 = p(rowOff + x * 3) & 0xff
                val g = p(rowOff + x * 3 + 1) & 0xff
                val r = p(rowOff + x * 3 + 2) & 0xff
                rgb(y * w + x) = (r << 16) | (g << 8) | b0
                x += 1
              }
              y += 1
            }
            out += rgb
          }
          fo += 8L + fsz + (fsz & 1L)
        }
        o += 8L + size + (size & 1L)
      } else if (tag(p, oi, "LIST") && o + 12 <= p.length &&
          tag(p, oi + 8, "hdrl")) o += 12
      else o += 8L + size + (size & 1L)
    }
    if (out.isEmpty) None else Some((w, h, out.toArray))
  }

  def aviBytes(width: Int, height: Int, nFrames: Int, microSecPerFrame: Int,
      tail: Array[Byte]): Array[Byte] = {
    // RIFF('AVI ' LIST('hdrl' avih(56-byte main header))) + tail
    val b = ByteBuffer.allocate(12 + 12 + 8 + 56 + tail.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(4 + 12 + 8 + 56 + tail.length)
    b.put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
    b.put("hdrl".getBytes("US-ASCII"))
    b.put("avih".getBytes("US-ASCII")).putInt(56)
    b.putInt(microSecPerFrame)          // dwMicroSecPerFrame
    b.putInt(0).putInt(0).putInt(0)     // maxBytesPerSec, padding, flags
    b.putInt(nFrames)                   // dwTotalFrames
    b.putInt(0).putInt(1).putInt(0)     // initialFrames, streams, bufSize
    b.putInt(width).putInt(height)      // dwWidth, dwHeight
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    b.put(tail)
    b.array()
  }

  /** 24bpp BMP with a REAL pixel array: `rgb` is row-major top-down
    * packed 0xRRGGBB; the writer lays out the spec's bottom-up BGR rows
    * padded to 4-byte boundaries, with a correct pixel-data offset and
    * file size. Pixel decode (below) round-trips it exactly.
    */
  def bmpBytesRgb(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == width * height, s"need $width*$height pixels")
    val stride = (width * 3 + 3) & ~3
    val dataSize = stride * height
    val b = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + dataSize)
    b.putInt(0).putInt(54)
    b.putInt(40)
    b.putInt(width).putInt(height)      // positive height = bottom-up
    b.putShort(1).putShort(24)
    b.putInt(0).putInt(dataSize).putInt(0).putInt(0).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) {                    // bottom row first
      var x = 0
      while (x < width) {
        val c = rgb(y * width + x)
        b.put((c & 0xff).toByte)        // B
        b.put(((c >> 8) & 0xff).toByte) // G
        b.put(((c >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** PNG Paeth predictor (PNG spec §6.6, Paeth '91). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val b = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(data.length).put(t).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Spec-correct 8-bit RGB PNG (color type 2) with a REAL pixel array:
    * signature, IHDR, one zlib-DEFLATE IDAT of filtered scanlines, IEND
    * — real CRC32 chunk checksums, real compression (java.util.zip
    * ships in the JDK; PNG needs no external codec). `filterType`
    * selects the per-row filter (0 None, 1 Sub, 2 Up, 3 Average,
    * 4 Paeth), applied with the spec's encode-side arithmetic so each
    * choice exercises the matching decoder reconstruction path.
    */
  def pngBytesRgb(width: Int, height: Int, rgb: Array[Int],
      filterType: Int = 0): Array[Byte] = {
    require(rgb.length == width * height, s"need $width*$height pixels")
    require(filterType >= 0 && filterType <= 4,
      s"PNG filter type must be 0-4, got $filterType")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0; var o = 0
    while (y < height) {
      var i = 0
      while (i < width) {
        val c = rgb(y * width + i)
        cur(i * 3) = (c >> 16) & 0xff
        cur(i * 3 + 1) = (c >> 8) & 0xff
        cur(i * 3 + 2) = c & 0xff
        i += 1
      }
      raw(o) = filterType.toByte; o += 1
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = if (y > 0) prev(x) else 0
        val ul = if (x >= bpp && y > 0) prev(x - bpp) else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, ul)
        }
        raw(o) = ((cur(x) - pred) & 0xff).toByte; o += 1
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zout.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, none
      .array()
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", zout.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Decode an 8-bit truecolor PNG (color types 2 RGB / 6 RGBA, no
    * interlace) to row-major packed 0xRRGGBB: walks chunks, inflates
    * the concatenated IDAT stream, reconstructs all five scanline
    * filters; alpha is dropped. None for any other layout or for
    * corrupt/truncated payloads — bounds-checked and total like the
    * other decoders (bad zlib data is a None, never an exception).
    */
  def pngPixels(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 8 + 25 || !p.startsWith(PngSig)) return None
    var o = 8L
    var w = 0; var h = 0; var colorType = -1; var bitDepth = -1
    var interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && o + 12 <= p.length) {
      val oi = o.toInt
      val len = beInt(p, oi).toLong
      if (len < 0 || o + 12 + len > p.length) return None
      new String(p, oi + 4, 4, "US-ASCII") match {
        case "IHDR" if len == 13 =>
          w = beInt(p, oi + 8); h = beInt(p, oi + 12)
          bitDepth = p(oi + 16) & 0xff; colorType = p(oi + 17) & 0xff
          interlace = p(oi + 20) & 0xff
        case "IDAT" => idat.write(p, oi + 8, len.toInt)
        case "IEND" => sawEnd = true
        case _ => ()
      }
      o += 12 + len
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 ||
        (colorType != 2 && colorType != 6)) return None
    // bound decode memory against corrupt header dims (64M px ≈ 256 MB)
    if (w.toLong * h > (1L << 26)) return None
    val bpp = if (colorType == 2) 3 else 4
    val stride = w * bpp
    val rawLenL = (stride.toLong + 1) * h
    // plausibility gate BEFORE allocating: DEFLATE expands at most
    // ~1032:1 (one stored-block byte can encode ≤ 1032 output bytes), so
    // an IDAT too small to ever inflate to the declared raster is
    // corrupt — reject it without paying the (up to ~320 MB) raw-buffer
    // allocation a handful of adversarial headers per partition could
    // otherwise use to pressure executor memory
    if (idat.size().toLong * 1032L + 64L < rawLenL) return None
    val rawLen = rawLenL.toInt
    val raw = new Array[Byte](rawLen)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < rawLen && !infl.finished()) {
        val n = infl.inflate(raw, off, rawLen - off)
        if (n == 0 && (infl.needsInput() || infl.needsDictionary()))
          return None // truncated or preset-dictionary stream
        off += n
      }
      if (off < rawLen) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally infl.end()
    val out = new Array[Int](w * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0; var ro = 0
    while (y < h) {
      val ft = raw(ro) & 0xff; ro += 1
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val fv = raw(ro + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = if (y > 0) prev(x) else 0
        val ul = if (x >= bpp && y > 0) prev(x - bpp) else 0
        cur(x) = (fv + (ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, ul)
        })) & 0xff
        x += 1
      }
      var i = 0
      while (i < w) {
        out(y * w + i) =
          (cur(i * bpp) << 16) | (cur(i * bpp + 1) << 8) | cur(i * bpp + 2)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      ro += stride
      y += 1
    }
    Some((w, h, out))
  }

  /** 16-bit mono PCM WAV whose data chunk holds the REAL samples (the
    * text-tail variant of `wavBytes` declares a size its body doesn't
    * carry — fine for header parsing, useless for sample decode).
    * Delegates to `wavBytes`, whose declared data size for
    * (nSamples = samples.length, mono, 16-bit) is exactly the tail
    * length here.
    */
  def wavBytesPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val tail = ByteBuffer.allocate(samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(tail.putShort)
    wavBytes(sampleRate, 1, 16, samples.length, tail.array())
  }

  // ---- parser (the real decode path) ----------------------------------

  private def beInt(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
      ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)

  private def leInt(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)

  private def leShort(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)

  private def tag(p: Array[Byte], o: Int, t: String): Boolean =
    p.length >= o + 4 && p(o) == t(0).toByte && p(o + 1) == t(1).toByte &&
      p(o + 2) == t(2).toByte && p(o + 3) == t(3).toByte

  /** Parse real container metadata from the payload's header bytes.
    * Returns None for payloads that match no known magic (callers decide
    * the fallback). Bounds-checked: truncated headers yield None, never
    * an exception.
    */
  def parse(p: Array[Byte]): Option[Meta] = {
    if (p.length >= 24 && p.startsWith(PngSig) && tag(p, 12, "IHDR"))
      Some(Meta("png", beInt(p, 16), beInt(p, 20), 1, 0, 0))
    else if (p.length >= 26 && p(0) == 'B'.toByte && p(1) == 'M'.toByte)
      // negative height = top-down row order, not a negative dimension
      Some(Meta("bmp", leInt(p, 18), math.abs(leInt(p, 22)), 1, 0, 0))
    else if (tag(p, 0, "RIFF") && tag(p, 8, "WAVE")) {
      if (p.length < 44 || !tag(p, 12, "fmt ") || !tag(p, 36, "data")) None
      else {
        val channels = leShort(p, 22)
        val rate = leInt(p, 24)
        val bits = leShort(p, 34)
        val dataSize = leInt(p, 40)
        val bytesPerSample = math.max(1, channels * (bits / 8))
        val nSamples = dataSize / bytesPerSample
        val durMs = if (rate <= 0) 0
          else ((nSamples.toLong * 1000L) / rate).toInt
        Some(Meta("wav", 0, 0, nSamples, rate, durMs))
      }
    } else if (tag(p, 0, "RIFF") && tag(p, 8, "AVI ")) {
      // scan top-level chunk headers for the hdrl LIST and its avih.
      // RIFF rules honored: chunks are word-aligned (odd sizes carry a
      // pad byte), and only the 'hdrl' LIST is descended into — movi
      // lists hold frame data whose bytes could false-positive as tags
      // offset tracked as Long: a corrupt chunk size near Int.MaxValue
      // must walk o past the payload end, not wrap negative and index
      // out of bounds (parse is contractually total)
      var o = 12L
      var found: Option[Meta] = None
      while (found.isEmpty && o + 8 <= p.length) {
        val oi = o.toInt
        val size = math.max(0, leInt(p, oi + 4)).toLong
        if (tag(p, oi, "LIST") && tag(p, oi + 8, "hdrl")) o += 12
        else if (tag(p, oi, "avih") && o + 8 + 56 <= p.length) {
          val base = oi + 8
          val usPerFrame = leInt(p, base)
          val frames = leInt(p, base + 16)
          val w = leInt(p, base + 32)
          val h = leInt(p, base + 36)
          val durMs = ((frames.toLong * usPerFrame) / 1000L).toInt
          found = Some(Meta("avi", w, h, frames, 0, durMs))
        } else o += 8L + size + (size & 1L)
      }
      found
    } else None
  }

  // ---- pixel / sample decode (real, for the uncompressed formats) -----

  /** Decode a 24bpp uncompressed BMP's pixel array to row-major
    * top-down packed 0xRRGGBB. Honors the header's pixel-data offset,
    * 4-byte row stride padding and bottom-up row order (negative height
    * = top-down, also handled). None for non-BMP, compressed, non-24bpp
    * or truncated payloads — bounds-checked like parse().
    */
  def bmpPixels(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val off = leInt(p, 10)
    val w = leInt(p, 18)
    val hRaw = leInt(p, 22)
    val bpp = leShort(p, 28)
    val compression = leInt(p, 30)
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    // ALL raster arithmetic in Long: corrupt header dims (w ~ 2^30)
    // overflow Int stride/pixel-count math, sail past the bounds check
    // and die on allocation — the totality contract forbids that
    val strideL = (w.toLong * 3 + 3) & ~3L
    if (off < 0 || off.toLong + strideL * h > p.length) return None
    // implied by the length check (3 bytes/px on ≤2^31 payload bytes),
    // but keep the direct guard independent of that reasoning
    val nPx = w.toLong * h
    if (nPx > Int.MaxValue) return None
    val stride = strideL.toInt
    val out = new Array[Int](nPx.toInt)
    var y = 0
    while (y < h) {
      // positive height: rows stored bottom-up
      val srcRow = if (hRaw > 0) h - 1 - y else y
      var x = 0
      var o = off + srcRow * stride
      while (x < w) {
        val bl = p(o) & 0xff; val g = p(o + 1) & 0xff; val r = p(o + 2) & 0xff
        out(y * w + x) = (r << 16) | (g << 8) | bl
        x += 1; o += 3
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** Decode a MONO 16-bit PCM WAV's data chunk to samples. The sample
    * count is bounded by BOTH the declared data size and the actual
    * payload length (truncated files yield the prefix, never an
    * exception). None for non-WAV, non-PCM, non-16-bit or multi-channel
    * payloads — interleaved stereo decoded as one stream would feed
    * garbage zero-crossing/mean stats downstream, so it falls back.
    */
  def wavSamples(p: Array[Byte]): Option[Array[Short]] = {
    if (!(tag(p, 0, "RIFF") && tag(p, 8, "WAVE")) || p.length < 44 ||
      !tag(p, 12, "fmt ") || !tag(p, 36, "data")) return None
    if (leShort(p, 20) != 1 || leShort(p, 22) != 1 ||
      leShort(p, 34) != 16) return None
    val declared = math.max(0, leInt(p, 40))
    val avail = p.length - 44
    val n = math.min(declared, avail) / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((p(44 + 2 * i) & 0xff) |
        ((p(44 + 2 * i + 1) & 0xff) << 8)).toShort
      i += 1
    }
    Some(out)
  }
}
