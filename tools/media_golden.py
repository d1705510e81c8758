#!/usr/bin/env python3
"""Dev-only independent multimodal decode oracle (no Spark, no JVM).

Re-implements, from the PUBLIC container specs alone (PNG/W3C, BMP/
BITMAPINFOHEADER, RIFF WAVE canonical PCM, RIFF AVI avih + '00db'
uncompressed-DIB frames), BOTH sides of the multimodal pipeline that
`graft.llm.Multimodal` + `graft.llm.MediaHeaders` implement in Scala:

  1. payload GENERATION for doc_ids (the deterministic id-keyed recipe
     documented in Multimodal.syntheticMedia) with this file's OWN
     encoders — python zlib for PNG DEFLATE, binascii.crc32 for chunk
     CRCs, struct for the binary layouts;
  2. payload DECODE with this file's OWN parsers — chunk walks, zlib
     inflate + all five PNG scanline reconstructions, BMP bottom-up
     stride-padded rasters, WAV fmt/data math, AVI avih + DIB frames;
  3. FEATURE extraction (Rec.601 integer luma histogram, PCM
     rms/peak/zcr/mean/energy-thirds) with the same arithmetic contract.

It then freezes the decoded rows for doc_ids 0..29 (covers all five PNG
filter types, BMP, all three WAV rates, and a spread of AVI shapes) into
src/test/resources/multimodal_golden.csv, which MultimodalGoldenSpec
pins the Scala decode against. This is the same cross-implementation
agreement technique as tools/graph_golden.py froze for g6: two
independent implementations of the full generate->encode->decode->
feature pipeline must agree on every row.

Float contract: Scala accumulates PCM stats in Double and emits Float;
histogram counts are exact small integers divided once. Python computes
in float64; the spec compares with abs tol 1e-5, far above the float32
rounding gap and far below any real decode divergence (one wrong pixel
in a 16x16 histogram shifts a bin by ~4e-3).

Usage: python3 tools/media_golden.py [> prints summary]
"""
import binascii
import csv
import struct
import sys
import zlib

OUT = "src/test/resources/multimodal_golden.csv"
IDS = range(30)


# ---- generation recipe (mirrors Multimodal.syntheticMedia) -------------

def gen_image_rgb(i):
    pw, ph = 16 + i % 48, 16 + (i // 5) % 48
    rgb = []
    for p in range(pw * ph):
        x, y = p % pw, p // pw
        rgb.append((((x * 7 + i) % 256) << 16)
                   | (((y * 5 + i // 3) % 256) << 8)
                   | ((x + y + i) % 256))
    return pw, ph, rgb


def gen_audio(i):
    rate = 8000 * (1 + (i // 3) % 3)
    n = rate * (1 + i % 5) // 100
    period = 64 + i % 192
    half = max(1, period // 2)
    samples = []
    for k in range(n):
        ph = k % period
        tri = ph if ph < period // 2 else period - ph
        samples.append(tri * 4096 // half - 2048)
    return rate, samples


def gen_video(i):
    frames = 1 + i % 16
    fw, fh = 8 + i % 17, 8 + (i // 11) % 13
    fs = []
    for fi in range(frames):
        f = []
        for p in range(fw * fh):
            x, y = p % fw, p // fw
            f.append((((x * 3 + fi * 11 + i) % 256) << 16)
                     | (((y * 7 + fi * 5) % 256) << 8)
                     | ((x + y + fi + i) % 256))
        fs.append(f)
    return fw, fh, fs


# ---- independent encoders ---------------------------------------------

def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def png_bytes(w, h, rgb, filter_type):
    raw = bytearray()
    prev = [0] * (w * 3)
    for y in range(h):
        cur = []
        for x in range(w):
            c = rgb[y * w + x]
            cur += [(c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff]
        raw.append(filter_type)
        for x in range(w * 3):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x] if y > 0 else 0
            ul = prev[x - 3] if (x >= 3 and y > 0) else 0
            pred = [0, a, b, (a + b) // 2, paeth(a, b, ul)][filter_type]
            raw.append((cur[x] - pred) & 0xff)
        prev = cur

    def chunk(typ, data):
        body = typ + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", binascii.crc32(body) & 0xffffffff))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def bmp_bytes(w, h, rgb):
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):          # bottom row first
        for x in range(w):
            c = rgb[y * w + x]
            data += bytes([c & 0xff, (c >> 8) & 0xff, (c >> 16) & 0xff])
        data += b"\x00" * (stride - w * 3)
    hdr = (b"BM" + struct.pack("<IIIIiiHHIIIIII", 54 + len(data), 0, 54,
                               40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0))
    return hdr + bytes(data)


def wav_bytes(rate, samples):
    data = struct.pack("<%dh" % len(samples), *samples)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def avi_bytes(w, h, us_per_frame, frames):
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h
    movi = bytearray(b"movi")
    for f in frames:
        movi += b"00db" + struct.pack("<I", frame_size)
        for y in range(h - 1, -1, -1):
            for x in range(w):
                c = f[y * w + x]
                movi += bytes([c & 0xff, (c >> 8) & 0xff, (c >> 16) & 0xff])
            movi += b"\x00" * (stride - w * 3)
    avih = struct.pack("<14I", us_per_frame, 0, 0, 0, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + 56) + b"hdrl" \
        + b"avih" + struct.pack("<I", 56) + avih
    riff = b"AVI " + hdrl + b"LIST" + struct.pack("<I", len(movi)) \
        + bytes(movi)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---- independent decoders ---------------------------------------------

def png_decode(p):
    assert p[:8] == b"\x89PNG\r\n\x1a\n"
    o, w, h, idat = 8, 0, 0, bytearray()
    while o + 12 <= len(p):
        ln = struct.unpack(">I", p[o:o + 4])[0]
        typ = p[o + 4:o + 8]
        if typ == b"IHDR":
            w, h, depth, color, _, _, inter = struct.unpack(
                ">IIBBBBB", p[o + 8:o + 21])
            assert depth == 8 and color == 2 and inter == 0
        elif typ == b"IDAT":
            idat += p[o + 8:o + 8 + ln]
        elif typ == b"IEND":
            break
        o += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    out, prev = [0] * (w * h), [0] * stride
    ro = 0
    for y in range(h):
        ft = raw[ro]
        ro += 1
        cur = [0] * stride
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x] if y > 0 else 0
            ul = prev[x - 3] if (x >= 3 and y > 0) else 0
            pred = [0, a, b, (a + b) // 2, paeth(a, b, ul)][ft]
            cur[x] = (raw[ro + x] + pred) & 0xff
        for i in range(w):
            out[y * w + i] = (cur[i * 3] << 16) | (cur[i * 3 + 1] << 8) \
                | cur[i * 3 + 2]
        prev = cur
        ro += stride
    return w, h, out


def bmp_decode(p):
    assert p[:2] == b"BM"
    off = struct.unpack("<I", p[10:14])[0]
    w, h_raw = struct.unpack("<ii", p[18:26])
    bpp = struct.unpack("<H", p[28:30])[0]
    assert bpp == 24
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    out = [0] * (w * h)
    for y in range(h):
        src = (h - 1 - y) if h_raw > 0 else y
        o = off + src * stride
        for x in range(w):
            bl, g, r = p[o], p[o + 1], p[o + 2]
            out[y * w + x] = (r << 16) | (g << 8) | bl
            o += 3
    return w, h, out


def wav_decode(p):
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", p[20:36])
    assert fmt == 1 and ch == 1 and bits == 16
    size = struct.unpack("<I", p[40:44])[0]
    n = min(size, len(p) - 44) // 2
    return rate, list(struct.unpack("<%dh" % n, p[44:44 + 2 * n]))


def avi_decode(p):
    assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
    o, meta = 12, None
    while o + 8 <= len(p):
        tag = p[o:o + 4]
        size = struct.unpack("<I", p[o + 4:o + 8])[0]
        if tag == b"LIST" and p[o + 8:o + 12] == b"hdrl":
            o += 12
        elif tag == b"avih":
            vals = struct.unpack("<14I", p[o + 8:o + 64])
            meta = dict(us=vals[0], frames=vals[4], w=vals[8], h=vals[9])
            break
        else:
            o += 8 + size + (size & 1)
    w, h = meta["w"], meta["h"]
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h
    frames, o = [], 12
    while o + 8 <= len(p):
        tag = p[o:o + 4]
        size = struct.unpack("<I", p[o + 4:o + 8])[0]
        if tag == b"LIST" and p[o + 8:o + 12] == b"movi":
            fo, end = o + 12, min(len(p), o + 8 + size)
            while fo + 8 <= end:
                ftag = p[fo:fo + 4]
                fsz = struct.unpack("<I", p[fo + 4:fo + 8])[0]
                if ftag == b"00db" and fsz == frame_size \
                        and fo + 8 + fsz <= end:
                    rgb = [0] * (w * h)
                    for y in range(h):
                        ro = fo + 8 + (h - 1 - y) * stride
                        for x in range(w):
                            bl = p[ro + x * 3]
                            g = p[ro + x * 3 + 1]
                            r = p[ro + x * 3 + 2]
                            rgb[y * w + x] = (r << 16) | (g << 8) | bl
                    frames.append(rgb)
                fo += 8 + fsz + (fsz & 1)
            o += 8 + size + (size & 1)
        elif tag == b"LIST" and p[o + 8:o + 12] == b"hdrl":
            o += 12
        else:
            o += 8 + size + (size & 1)
    return meta, frames


# ---- features ----------------------------------------------------------

def luma_hist(rgb, bins=8):
    out = [0.0] * bins
    if not rgb:
        return out
    for c in rgb:
        r, g, b = (c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff
        luma = (r * 299 + g * 587 + b * 114) // 1000
        out[min(bins - 1, luma * bins // 256)] += 1
    return [v / len(rgb) for v in out]


def pcm_features(samples):
    n = len(samples)
    if n == 0:
        return [0.0] * 8
    s_sum = s_sq = peak = 0.0
    zc = 0
    third = max(1, n // 3)
    e = [0.0, 0.0, 0.0]
    for i, raw in enumerate(samples):
        s = raw / 32768.0
        s_sum += s
        s_sq += s * s
        peak = max(peak, abs(s))
        if i > 0 and (raw >= 0) != (samples[i - 1] >= 0):
            zc += 1
        e[min(2, i // third)] += s * s
    return [(s_sq / n) ** 0.5, peak, zc / n, s_sum / n, abs(s_sum / n),
            e[0] / n, e[1] / n, e[2] / n]


# ---- main: generate -> encode -> decode -> feature -> freeze -----------

def row_for(i):
    if i % 3 == 0:
        pw, ph, rgb = gen_image_rgb(i)
        if i % 2 == 0:
            payload = png_bytes(pw, ph, rgb, (i // 2) % 5)
            w, h, px = png_decode(payload)
            fmt = "png"
        else:
            payload = bmp_bytes(pw, ph, rgb)
            w, h, px = bmp_decode(payload)
            fmt = "bmp"
        return (i, "image", fmt, w, h, 1, 0, 0, luma_hist(px))
    if i % 3 == 1:
        rate, samples = gen_audio(i)
        payload = wav_bytes(rate, samples)
        drate, dsamples = wav_decode(payload)
        dur = len(dsamples) * 1000 // drate
        return (i, "audio", "wav", 0, 0, len(dsamples), drate, dur,
                pcm_features(dsamples))
    fw, fh, fs = gen_video(i)
    payload = avi_bytes(fw, fh, 33333, fs)
    meta, frames = avi_decode(payload)
    dur = meta["frames"] * meta["us"] // 1000
    acc = [0.0] * 8
    for f in frames:
        hist = luma_hist(f)
        for k in range(8):
            acc[k] += hist[k]
    feat = [v / len(frames) for v in acc]
    return (i, "video", "avi", meta["w"], meta["h"], meta["frames"], 0,
            dur, feat)


def main():
    rows = [row_for(i) for i in IDS]
    with open(OUT, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["media_id", "kind", "format", "width", "height",
                     "n_frames", "sample_rate", "duration_ms"]
                    + ["f%d" % k for k in range(8)])
        for r in rows:
            wr.writerow(list(r[:8]) + ["%.9g" % v for v in r[8]])
    fmts = {}
    for r in rows:
        fmts[r[2]] = fmts.get(r[2], 0) + 1
    print("wrote %s: %d rows, formats %s" % (OUT, len(rows), fmts))


if __name__ == "__main__":
    sys.exit(main())
