"""Throughput measurement for the repo's only Python-per-byte hot path:
``multimodal.decode_media`` / ``extract_features`` (VERDICT r5 item 3).

The decode stage is Arrow-batched and column-pruned (the right SHAPE), but at
100 TB of payloads the MB/s-per-core constant IS the capacity plan: cores
needed = corpus_bytes / (MB_per_s_per_core * deadline). This bench publishes
that constant per container format, two ways:

- ``python``: tight single-core loop over ``decode_media`` — the pure parser
  cost, no Spark, no Arrow (the number to compare against a C codec).
- ``spark``: the real ``extract_features`` path — parquet-free in-memory
  DataFrame, payloads replicated executor-side, ``mapInPandas`` decode on
  local[N]; aggregate MB/s and MB/s-per-core (includes Arrow transfer +
  scheduling, i.e. what a cluster would actually see).

Payloads are deterministic, spec-compliant containers built with stdlib only
(same construction discipline as tests/test_multimodal.py's independent byte
builders — real deflate PNGs, real RIFF/ISO-BMFF walks, not fixtures).

Usage: python tools/bench_media.py [mb_per_format] [out_json]
Writes a markdown-ish table to stdout and a JSON blob for evidence/.
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --- deterministic payload builders ----------------------------------------


def make_bmp(width: int, height: int) -> bytes:
    """BITMAPINFOHEADER + 24-bit pixel filler (decode reads the header; the
    payload body still crosses Arrow, so size it realistically)."""
    row = bytes((x * 3 + 1) % 256 for x in range(width * 3))
    body = row * height
    header = b"BM" + struct.pack(
        "<IHHIIiiHHIIiiII",
        54 + len(body), 0, 0, 54, 40, width, height, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return header + body


def make_wav(seconds: int, sample_rate: int = 16000) -> bytes:
    data = bytes((i * 7) % 256 for i in range(sample_rate * 2 * seconds))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def make_png(width: int, height: int, channels: int, seed: int) -> bytes:
    """Real deflate PNG with per-row filter types cycling 0..4 and PSEUDO-
    RANDOM pixels (multiplicative-hash noise): deflate cannot crush noise,
    so wire bytes ~ raw pixel bytes, like a photographic payload — a
    structured gradient compresses 60:1 and would make MB/s-of-wire-bytes a
    meaningless throughput denominator. Filters are ENCODED vectorized
    (prediction uses raw neighbors, no serial dependency on the encode
    side); the decoder under test still pays the full serial unfilter."""
    import numpy as np

    stride = width * channels
    bpp = channels
    idx = np.arange(stride, dtype=np.uint64)
    img = np.empty((height, stride), np.uint8)

    def splitmix(x):  # full-avalanche 64-bit mix -> deflate-incompressible
        x = x * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x = x * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    for r in range(height):
        img[r] = (
            splitmix(idx + np.uint64(r * stride + seed * 0x10001 + 1))
            & np.uint64(255)
        ).astype(np.uint8)

    def left(a):
        out = np.zeros_like(a)
        out[:, bpp:] = a[:, :-bpp]
        return out

    up = np.vstack([np.zeros((1, stride), np.uint8), img[:-1]])
    ia = img.astype(np.int16)
    la = left(img).astype(np.int16)
    ua = up.astype(np.int16)
    ca = left(up).astype(np.int16)
    stream = bytearray()
    for r in range(height):
        f = r % 5
        if f == 0:
            out = ia[r]
        elif f == 1:
            out = ia[r] - la[r]
        elif f == 2:
            out = ia[r] - ua[r]
        elif f == 3:
            out = ia[r] - ((la[r] + ua[r]) >> 1)
        else:
            p = la[r] + ua[r] - ca[r]
            pa = np.abs(p - la[r])
            pb = np.abs(p - ua[r])
            pc = np.abs(p - ca[r])
            pred = np.where(
                (pa <= pb) & (pa <= pc), la[r], np.where(pb <= pc, ua[r], ca[r])
            )
            out = ia[r] - pred
        stream.append(f)
        stream += (out % 256).astype(np.uint8).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + chunk(b"IEND", b"")
    )
    return png, int(img.sum(dtype=np.int64))


def make_jpeg(width: int, height: int, tail_kb: int) -> bytes:
    """SOI + APP0 + sized comment segments + SOF0 + SOS + entropy filler —
    the marker walk stops at SOS, but the whole payload crosses Arrow."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    com = b"\xff\xfe" + struct.pack(">H", 2 + 64) + bytes(64)
    sof = (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    sos = b"\xff\xda" + struct.pack(">H", 12) + bytes(10)
    tail = bytes((i * 11) % 255 for i in range(tail_kb * 1024))
    return b"\xff\xd8" + app0 + com + sof + sos + tail + b"\xff\xd9"


def make_mp4(duration_s: int, mdat_kb: int) -> bytes:
    """ftyp + moov(mvhd v0 + trak/tkhd) + mdat filler."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    timescale = 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration_s * timescale)
        + bytes(80),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1) + bytes(56)
        + struct.pack(">II", 640 << 16, 360 << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = box(b"mdat", bytes(mdat_kb * 1024))
    return ftyp + moov + mdat


FORMATS = {
    # name -> (builder of ~0.5-1 MB payloads, raw-pixel bytes or None)
    "bmp": (lambda i: make_bmp(592 + i, 592), None),        # header-only decode
    "wav": (lambda i: make_wav(16 + i % 3), None),          # RIFF chunk walk
    "png_gray": (lambda i: make_png(724, 724, 1, i)[0], 724 * 724),
    "png_rgb": (lambda i: make_png(418, 418, 3, i)[0], 418 * 418 * 3),
    "jpeg_meta": (lambda i: make_jpeg(1920, 1080, 512 + i), None),
    "mp4_meta": (lambda i: make_mp4(30 + i, 512 + i), None),
}


def main() -> int:
    mb_per_format = float(sys.argv[1]) if len(sys.argv) > 1 else 64.0
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    from projet_data_engineering_spark.operators.multimodal import (
        decode_media,
        extract_features,
    )
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bench-media")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    cores = sc.defaultParallelism

    # encoder/decoder round-trip self-check: the bench's own PNGs must decode
    # to the exact pixel sum of the noise image they were built from
    png, want = make_png(64, 64, 3, 1)
    got = decode_media(png)
    assert got["px_sum"] == want, (got["px_sum"], want)

    results: dict[str, dict] = {}
    warmed = False
    for name, (build, raw_px) in FORMATS.items():
        variants = [build(i) for i in range(8)]
        vbytes = sum(len(v) for v in variants)
        # python single-core: time-bounded loop over the distinct variants
        t0 = time.time()
        n_bytes = n_dec = 0
        while time.time() - t0 < 3.0:
            for v in variants:
                decode_media(v)
                n_bytes += len(v)
                n_dec += 1
        t_py = time.time() - t0
        py_mbs = n_bytes / t_py / 1e6
        py_dps = n_dec / t_py

        # spark path: replicate variants executor-side to the full target,
        # then run the REAL extract_features (Arrow transfer included).
        # Floor the row count at 16/core so steady-state decode — not task
        # scheduling of a near-empty partition — dominates the wall clock.
        reps = max(
            int(mb_per_format * 1024 * 1024 // vbytes),
            (cores * 16 + len(variants) - 1) // len(variants),
        )
        base = spark.createDataFrame(
            [(i, "image", bytearray(v)) for i, v in enumerate(variants)],
            "media_id bigint, kind string, payload binary",
        )
        big = (
            base.crossJoin(
                spark.range(reps).withColumnRenamed("id", "rep")
            )
            .selectExpr(
                "media_id * 100000 + rep as media_id", "kind", "payload"
            )
            .repartition(cores * 2)
            .localCheckpoint(eager=True)  # materialize BEFORE timing decode
        )
        if not warmed:  # JVM/Arrow-path warmup outside the timed window
            extract_features(big.limit(64)).count()
            warmed = True
        total = vbytes * reps
        n_rows = len(variants) * reps
        t0 = time.time()
        decoded = extract_features(big).select("mime", "px_sum").groupBy(
            "mime"
        ).count().collect()
        t_sp = time.time() - t0
        sp_mbs = total / t_sp / 1e6
        results[name] = {
            "payload_kb": round(vbytes / len(variants) / 1024, 1),
            "python_1core_MBps": round(py_mbs, 2),
            "python_1core_decodes_per_s": round(py_dps, 1),
            "spark_total_MB": round(total / 1e6, 1),
            "spark_rows": n_rows,
            "spark_wall_s": round(t_sp, 2),
            "spark_agg_MBps": round(sp_mbs, 1),
            "spark_MBps_per_core": round(sp_mbs / cores, 3),
            "spark_decodes_per_s_per_core": round(n_rows / t_sp / cores, 1),
        }
        if raw_px is not None:  # pixel formats: raw-pixel-byte throughput
            results[name]["python_1core_raw_px_MBps"] = round(
                n_dec * raw_px / t_py / 1e6, 2
            )
            results[name]["spark_raw_px_MBps_per_core"] = round(
                n_rows * raw_px / t_sp / cores / 1e6, 3
            )
        r = results[name]
        print(
            f"{name:10s} payload={r['payload_kb']:>7.1f}KB "
            f"py1core={r['python_1core_MBps']:>9.2f}MB/s "
            f"({r['python_1core_decodes_per_s']:>7.1f}dec/s) "
            f"spark[{cores}c]={r['spark_agg_MBps']:>7.1f}MB/s "
            f"({r['spark_MBps_per_core']:>6.3f}MB/s/core, "
            f"{r['spark_total_MB']}MB in {r['spark_wall_s']}s)"
            + (
                f" raw_px/core={r['spark_raw_px_MBps_per_core']}MB/s"
                if raw_px is not None
                else ""
            )
        )
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"cores": cores, "formats": results}, f, indent=1)
        print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
