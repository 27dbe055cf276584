"""Multimodal decode pipeline: real BMP decode → thumbnail → features
over Arrow batches, value-verified against an INDEPENDENT pure-python
byte-walking decoder (no numpy slicing shared with the implementation).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moera_search_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_bmp,
    encode_bmp,
    image_features,
    multimodal_decode_features,
    synth_image,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_decode_bmp(buf: bytes) -> list[list[tuple[int, int, int]]]:
    """Independent reference decoder: explicit byte walking, python
    ints only."""
    assert buf[0:2] == b"BM"
    offset = struct.unpack_from("<I", buf, 10)[0]
    w = struct.unpack_from("<i", buf, 18)[0]
    h = struct.unpack_from("<i", buf, 22)[0]
    bpp = struct.unpack_from("<H", buf, 28)[0]
    assert bpp == 24
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h):                      # stored bottom-up
        base = offset + y * stride
        row = []
        for x in range(w):
            b, g, r = buf[base + 3 * x: base + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    rows.reverse()                          # top-down
    return rows


class TestBmpCodec:
    @pytest.mark.parametrize("doc_id", [0, 3, 17, 64, 123, 500])
    def test_roundtrip_vs_independent_decoder(self, doc_id):
        img = synth_image(doc_id)
        buf = encode_bmp(img)
        ref = _py_decode_bmp(buf)
        got = decode_bmp(buf)
        assert got.shape == (len(ref), len(ref[0]), 3)
        for y, row in enumerate(ref):
            for x, px in enumerate(row):
                assert tuple(int(v) for v in got[y, x]) == px

    def test_unpadded_and_padded_widths(self):
        # width 4 → row 12 bytes (no pad); width 5 → row 15 + 1 pad
        for w in (4, 5, 6, 7):
            img = (np.arange(w * 3 * 3) % 256).astype(np.uint8) \
                .reshape(3, w, 3)
            assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_compressed_format_raises(self):
        img = synth_image(1)
        buf = bytearray(encode_bmp(img))
        struct.pack_into("<I", buf, 30, 1)   # compression = BI_RLE8
        with pytest.raises(NotImplementedError, match="PIL"):
            decode_bmp(bytes(buf))


def _py_features(rows) -> list[float]:
    """Independent feature computation from the reference decoder's
    nested-list image."""
    h, w = len(rows), len(rows[0])
    flat = [px for row in rows for px in row]
    mean_rgb = [sum(p[c] for p in flat) / len(flat) / 255.0
                for c in range(3)]
    lums = []
    ys = [0, h // 2, h]
    xs = [0, w // 2, w]
    for i in range(2):
        for j in range(2):
            block = [rows[y][x] for y in range(ys[i], ys[i + 1])
                     for x in range(xs[j], xs[j + 1])]
            r = sum(p[0] for p in block) / len(block)
            g = sum(p[1] for p in block) / len(block)
            b = sum(p[2] for p in block) / len(block)
            lums.append((0.299 * r + 0.587 * g + 0.114 * b) / 255.0)
    return mean_rgb + lums + [w / h]


class TestDecodePipeline:
    def test_features_match_independent_oracle(self):
        for doc_id in (0, 9, 42, 200):
            buf = encode_bmp(synth_image(doc_id))
            got = image_features(decode_bmp(buf))
            want = _py_features(_py_decode_bmp(buf))
            assert np.allclose(got, want, atol=1e-12)

    def test_spark_pipeline_matches_oracle(self, spark):
        rows = multimodal_decode_features(spark, SF_DIR).collect()
        assert rows and all(len(r["features"]) == FEATURE_DIM
                            for r in rows)
        by_id = {int(r["doc_id"]): r["features"] for r in rows}
        for doc_id in list(by_id)[:10]:
            buf = encode_bmp(synth_image(doc_id))
            want = _py_features(_py_decode_bmp(buf))
            assert np.allclose(by_id[doc_id], want, atol=1e-12)


class TestVideoFrameSampling:
    def test_sampled_features_match_per_frame_mean(self):
        from moera_search_spark.operators.multimodal import (
            encode_video,
            sample_video_features,
            synth_video,
        )

        frames = synth_video(7, n_frames=12)
        got = sample_video_features(encode_video(frames), every=4)
        # independent: decode every 4th frame through the reference
        # decoder and average its independently-computed features
        want_rows = [_py_features(_py_decode_bmp(encode_bmp(frames[i])))
                     for i in (0, 4, 8)]
        want = np.mean(np.array(want_rows), axis=0)
        assert np.allclose(got, want, atol=1e-12)

    def test_bad_container_rejected(self):
        from moera_search_spark.operators.multimodal import (
            sample_video_features,
        )

        with pytest.raises(ValueError, match="VID0"):
            sample_video_features(b"nope")

    def test_spark_pipeline(self, spark):
        from moera_search_spark.operators.multimodal import (
            video_frame_features,
        )

        rows = video_frame_features(spark, SF_DIR).collect()
        assert rows and all(len(r["features"]) == FEATURE_DIM
                            for r in rows)


class TestAudioDecode:
    def test_wav_roundtrip_independent(self):
        from moera_search_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
            synth_audio,
        )

        samples = synth_audio(3)
        buf = encode_wav(samples, rate=8000)
        # independent header walk with the stdlib wave module
        import io
        import wave

        with wave.open(io.BytesIO(buf)) as w:
            assert w.getframerate() == 8000
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            raw = w.readframes(w.getnframes())
        want = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
        got, rate = decode_wav(buf)
        assert rate == 8000
        assert np.allclose(got, want, atol=0)
        # quantization-level fidelity to the source signal
        assert np.allclose(got, np.clip(samples, -1, 1), atol=1.0 / 32000)

    def test_non_pcm_rejected(self):
        from moera_search_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
            synth_audio,
        )
        import struct as _s

        buf = bytearray(encode_wav(synth_audio(1)))
        _s.pack_into("<H", buf, 20, 85)     # fmt tag: MP3
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            decode_wav(bytes(buf))

    def test_spark_pipeline(self, spark):
        from moera_search_spark.operators.multimodal import (
            audio_window_features,
            synth_audio,
            audio_features,
        )

        rows = audio_window_features(spark, SF_DIR).collect()
        assert rows and all(len(r["features"]) == 8 for r in rows)
        by_id = {int(r["doc_id"]): r["features"] for r in rows}
        some = list(by_id)[0]
        # windowed RMS of the decoded signal matches the direct python
        # computation up to PCM16 quantization
        want = audio_features(np.clip(synth_audio(some), -1, 1))
        assert np.allclose(by_id[some], want, atol=1e-4)


class TestDecodeFeaturesSqlOracle:
    """The catalog's full SQL oracle for ``multimodal_decode_features``
    (MULTIMODAL_DECODE_FEATURES_SQL) must agree with the real decode
    pipeline: run the oracle in DuckDB over the documents table and the
    python encode→decode→features pipeline per doc_id, compare the
    e6-rounded strings exactly.  No Spark needed — this pins the oracle
    itself, so a future change to synth_image / thumbnail / features
    cannot silently diverge from the SQL twin."""

    def test_sql_oracle_matches_real_decode(self):
        import duckdb

        from moera_search_spark.operators.multimodal import (
            MULTIMODAL_DECODE_FEATURES_SQL,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
        got = dict(con.execute(MULTIMODAL_DECODE_FEATURES_SQL).fetchall())
        ids = [r[0] for r in con.execute(
            "SELECT doc_id FROM documents").fetchall()]
        assert set(got) == set(ids) and len(got) == len(ids)
        for doc_id in ids:
            f = image_features(decode_bmp(encode_bmp(synth_image(doc_id))))
            # HALF_UP at e6, matching Spark's F.round
            want = ",".join(
                str(int(np.floor(v * 1e6 + 0.5))) for v in f)
            assert got[doc_id] == want, doc_id


class TestVideoCompressedFrames:
    """The VID0 container is frame-format-agnostic: PNG frames decode
    through the same sniffing dispatch, and PNG's losslessness makes
    the sampled features identical to BMP frames."""

    def test_png_frames_feature_identical(self):
        from moera_search_spark.operators.multimodal import (
            encode_video, sample_video_features, synth_video)

        frames = synth_video(42)
        bmp = sample_video_features(encode_video(frames, "bmp"))
        png = sample_video_features(encode_video(frames, "png"))
        assert np.array_equal(bmp, png)

    def test_mixed_format_container(self):
        import struct as _s
        from moera_search_spark.operators.multimodal import (
            encode_bmp, sample_video_features, synth_video)
        from moera_search_spark.png import encode_png

        frames = synth_video(7, n_frames=4)
        out = bytearray(b"VID0") + _s.pack("<I", 4)
        for i, fr in enumerate(frames):
            buf = encode_png(fr) if i % 2 else encode_bmp(fr)
            out += _s.pack("<I", len(buf)) + buf
        got = sample_video_features(bytes(out), every=1)
        exp = sample_video_features(
            b"VID0" + _s.pack("<I", 4) + b"".join(
                _s.pack("<I", len(b)) + b
                for b in map(encode_bmp, frames)), every=1)
        assert np.allclose(got, exp)


class TestLibrarySeam:
    """The wired PIL path behind SPARK_GRAFT_IMAGE_LIBRARY."""

    def test_flag_off_means_native(self, monkeypatch):
        from moera_search_spark.operators.multimodal import (
            IMAGE_LIBRARY_ENV, _library_decode)

        monkeypatch.delenv(IMAGE_LIBRARY_ENV, raising=False)
        assert _library_decode(b"\xff\xd8") is None

    def test_flag_on_without_pil_falls_back_native(self, monkeypatch):
        from moera_search_spark.jpeg import encode_jpeg
        from moera_search_spark.operators.multimodal import (
            IMAGE_LIBRARY_ENV, decode_image, synth_image)

        monkeypatch.setenv(IMAGE_LIBRARY_ENV, "1")
        img = synth_image(12)
        out = decode_image(encode_jpeg(img, quality=95))
        assert out.shape == img.shape        # native decode ran

    def test_library_parity_on_baseline_jpeg(self, monkeypatch):
        """Skip-if-absent: with PIL installed, the library path must
        agree with the native T.81 decoder to IDCT rounding (libjpeg
        integer IDCT vs our float64: a few grey levels)."""
        pytest.importorskip("PIL")
        from moera_search_spark.jpeg import decode_jpeg, encode_jpeg
        from moera_search_spark.operators.multimodal import (
            IMAGE_LIBRARY_ENV, decode_image, synth_image)

        img = synth_image(33)
        buf = encode_jpeg(img, quality=90, subsampling="444")
        native = decode_jpeg(buf)
        monkeypatch.setenv(IMAGE_LIBRARY_ENV, "1")
        lib = decode_image(buf)
        assert lib.shape == native.shape
        assert np.abs(lib.astype(int) - native.astype(int)).max() <= 4


def test_binary_stats_matches_duckdb(spark):
    """multimodal_binary_stats yielded its driver-catalog slot to
    multimodal_audio_flac_features (see multimodal.QUERIES comment) —
    this keeps it value-verified cross-engine."""
    import duckdb

    from moera_search_spark.operators.multimodal import (
        MULTIMODAL_BINARY_STATS_SQL,
        multimodal_binary_stats,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    oracle = {int(r[0]): (int(r[1]), r[2], r[3]) for r in
              con.execute(MULTIMODAL_BINARY_STATS_SQL).fetchall()}
    got = {int(r["doc_id"]): (int(r["n_bytes"]), r["fp"], r["mime"])
           for r in multimodal_binary_stats(spark, sf).collect()}
    assert got == oracle


def test_audio_flac_features_lossless_vs_pcm_path(spark):
    """The driver entry's features must equal features computed from
    the UN-encoded samples — i.e. the FLAC round trip is lossless on
    the LCG synth (belt-and-braces next to the SQL oracle)."""
    import numpy as np

    from moera_search_spark.operators.multimodal import (
        AUDIO_N,
        AUDIO_WINDOWS,
        multimodal_audio_flac_features,
        synth_audio_lcg,
    )

    got = {int(r["doc_id"]): r["features_e6"] for r in
           multimodal_audio_flac_features(
               spark, "/root/testdata/sf0.001").collect()}
    w = AUDIO_N // AUDIO_WINDOWS
    for doc_id in list(got)[:25]:
        v = synth_audio_lcg(doc_id, AUDIO_N).astype(np.int64)
        feats = [np.sqrt(int((v[j * w:(j + 1) * w] ** 2).sum()) / w)
                 / 32767.0 for j in range(AUDIO_WINDOWS)]
        feats.append(int(v.sum()) / AUDIO_N / 32767.0)
        feats.append(int(np.abs(v).max()) / 32767.0)
        exp = ",".join(str(int(np.sign(f * 1e6)
                               * np.floor(abs(f * 1e6) + 0.5)))
                       for f in feats)
        assert got[doc_id] == exp


class TestAudioLibrarySeam:
    """The wired audio path behind SPARK_GRAFT_AUDIO_LIBRARY
    (round 5 — the audio twin of the PIL seam above)."""

    def test_flag_off_means_native(self, monkeypatch):
        from moera_search_spark.operators.multimodal import (
            AUDIO_LIBRARY_ENV, _library_decode_audio)

        monkeypatch.delenv(AUDIO_LIBRARY_ENV, raising=False)
        assert _library_decode_audio(b"fLaC") is None

    def test_flag_on_without_backend_falls_back_native(self, monkeypatch):
        """With the flag set but neither soundfile nor ffmpeg present,
        decode_audio must still decode FLAC natively."""
        import shutil

        from moera_search_spark.flac import encode_flac
        from moera_search_spark.operators.multimodal import (
            AUDIO_LIBRARY_ENV, decode_audio, synth_audio)

        has_backend = shutil.which("ffmpeg") is not None
        try:
            import soundfile  # noqa: F401
            has_backend = True
        except ImportError:
            pass
        monkeypatch.setenv(AUDIO_LIBRARY_ENV, "1")
        s = synth_audio(7)
        pcm = (np.clip(s, -1.0, 1.0) * 32767.0).astype(np.int16)
        mono, rate = decode_audio(encode_flac(pcm[None, :], 8000))
        assert rate == 8000 and mono.shape == s.shape
        if not has_backend:
            # native path ran: bit-exact int16 round trip
            assert np.array_equal(
                (mono * 32767.0).round().astype(np.int16), pcm)

    def test_library_parity_on_flac(self, monkeypatch):
        """Skip-if-absent: with a backend installed, the library path
        must agree with the native RFC-9639 decoder to full-scale
        normalization (libsndfile divides by 2^15, the native path by
        2^15 - 1: a 3e-5 relative difference)."""
        import shutil

        try:
            import soundfile  # noqa: F401
        except ImportError:
            if shutil.which("ffmpeg") is None:
                pytest.skip("no audio library backend installed")
        from moera_search_spark.flac import encode_flac
        from moera_search_spark.operators.multimodal import (
            AUDIO_LIBRARY_ENV, decode_audio, synth_audio)

        s = synth_audio(21)
        pcm = (np.clip(s, -1.0, 1.0) * 32767.0).astype(np.int16)
        buf = encode_flac(pcm[None, :], 8000)
        monkeypatch.delenv(AUDIO_LIBRARY_ENV, raising=False)
        native, nrate = decode_audio(buf)
        monkeypatch.setenv(AUDIO_LIBRARY_ENV, "1")
        lib, lrate = decode_audio(buf)
        assert lrate == nrate and lib.shape == native.shape
        assert np.allclose(lib, native, atol=2e-4)

    def test_library_parity_on_g711_wav(self, monkeypatch):
        """Skip-if-absent: the seam must also agree on a native-WAV
        payload (G.711 mu-law), proving it is a superset, not a
        different contract."""
        import shutil

        try:
            import soundfile  # noqa: F401
        except ImportError:
            if shutil.which("ffmpeg") is None:
                pytest.skip("no audio library backend installed")
        from moera_search_spark.operators.multimodal import (
            AUDIO_LIBRARY_ENV, decode_audio, encode_g711_wav,
            synth_audio)

        buf = encode_g711_wav(synth_audio(5), law="ulaw")
        monkeypatch.delenv(AUDIO_LIBRARY_ENV, raising=False)
        native, nrate = decode_audio(buf)
        monkeypatch.setenv(AUDIO_LIBRARY_ENV, "1")
        lib, lrate = decode_audio(buf)
        assert lrate == nrate and lib.shape == native.shape
        assert np.allclose(lib, native, atol=2e-4)
