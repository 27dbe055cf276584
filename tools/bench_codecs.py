"""Single-core codec microbench for SCALE.md's multimodal table.

Measures decode rates on a 64x64 (continuity with rounds 2-3) and a
512x512 photo-like image, per filter/format variant.  Paeth/Average
PNG streams are produced here with a numpy forward filter (the repo
encoder emits None/Sub only).

Usage: python tools/bench_codecs.py
"""

from __future__ import annotations

import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

from moera_search_spark.adpcm import encode_adpcm_wav  # noqa: E402
from moera_search_spark.jpeg import (  # noqa: E402
    decode_jpeg, encode_jpeg, encode_jpeg_progressive)
from moera_search_spark.operators.multimodal import decode_wav  # noqa: E402
from moera_search_spark.png import decode_png  # noqa: E402


def photo(n: int, seed: int = 7) -> np.ndarray:
    """Photo-like content: smooth gradients + mild noise."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    base = np.stack([
        128 + 80 * np.sin(x / 37.0) * np.cos(y / 23.0),
        128 + 60 * np.cos((x + y) / 41.0),
        128 + 70 * np.sin(y / 29.0),
    ], axis=-1)
    img = base + rng.normal(0, 6, base.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data \
        + struct.pack(">I", zlib.crc32(ctype + data))


def png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Forward-filter every scanline with ``ftype`` and wrap as PNG."""
    h, w, _ = img.shape
    flat = img.reshape(h, w * 3).astype(np.int32)
    prev = np.zeros(w * 3, np.int32)
    lines = bytearray()
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
        upl = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = prev
        elif ftype == 3:
            pred = (left + prev) // 2
        else:
            p = left + prev - upl
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upl)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upl))
        lines.append(ftype)
        lines += ((row - pred) % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + _chunk(b"IEND", b""))


def bench(label: str, fn, payload, px: float, reps: int):
    fn(payload)                                      # warm
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(payload)
        samples.append(time.perf_counter() - t0)
    best = min(samples)
    print(f"{label:34s} {best * 1e3:8.2f} ms  "
          f"{px / best / 1e6:8.2f} Mpx/s")
    return best


def main():
    for n, reps in ((64, 30), (512, 3)):
        img = photo(n)
        px = float(n * n)
        print(f"--- {n}x{n} RGB ---")
        for ft, name in ((1, "Sub"), (2, "Up"), (3, "Average"),
                         (4, "Paeth")):
            bench(f"PNG decode ({name})", decode_png,
                  png_with_filter(img, ft), px, reps)
        for sub in ("444", "420"):
            bench(f"JPEG decode (q85 {sub})", decode_jpeg,
                  encode_jpeg(img, 85, sub), px, reps)
        bench("JPEG decode (q85 420 ri=8)", decode_jpeg,
              encode_jpeg(img, 85, "420", restart_interval=8), px, reps)
        for sub in ("444", "420"):
            bench(f"progressive JPEG decode (q85 {sub})", decode_jpeg,
                  encode_jpeg_progressive(img, 85, sub), px, reps)
    sr, secs = 8000, 10.0
    t = np.arange(int(sr * secs)) / sr
    rng = np.random.RandomState(7)
    clip = (np.sin(2 * np.pi * 440 * t) * 12000
            + rng.normal(0, 40, t.shape)).astype(np.int16)

    def audio_bench(label, fn, payload, n, reps=5):
        fn(payload)
        best = min(_timed(fn, payload) for _ in range(reps))
        print(f"{label:34s} {best * 1e3:8.2f} ms  "
              f"{n / best / 1e6:8.3f} Msamples/s")

    def _timed(fn, payload):
        t0 = time.perf_counter()
        fn(payload)
        return time.perf_counter() - t0

    audio_bench("ADPCM decode (10 s @ 8 kHz)", decode_wav,
                encode_adpcm_wav(clip / 32767.0, sr), len(clip))
    from moera_search_spark.flac import decode_flac, encode_flac
    audio_bench("FLAC decode (10 s @ 8 kHz)", decode_flac,
                encode_flac(clip[None, :], sr), len(clip))
    from moera_search_spark.operators.multimodal import encode_g711_wav
    audio_bench("G.711 u-law decode (10 s @ 8 kHz)", decode_wav,
                encode_g711_wav(clip / 32767.0, sr), len(clip))


if __name__ == "__main__":
    main()
