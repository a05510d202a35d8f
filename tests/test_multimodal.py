"""Multimodal column plumbing tests: image/audio/video payloads as opaque
binary + typed metadata, Arrow-batched kernels, quarantine posture."""

import struct

import pytest

from activestorage_ocr_spark.operators import multimodal as mm


def _wav(rate=16000, channels=1, bits=16, n_samples=320, audio_format=1):
    body = bytes(n_samples * channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", audio_format, channels, rate,
                      rate * channels * bits // 8, channels * bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


class TestWavParse:
    def test_pcm_wav_metadata(self):
        m = mm.parse_wav_header(_wav(rate=44100, channels=2, n_samples=4410))
        assert m["sample_rate"] == 44100
        assert m["channels"] == 2
        assert m["bits_per_sample"] == 16
        assert m["n_samples"] == 4410
        assert m["duration_ms"] == 100

    def test_compressed_wav_rejected(self):
        with pytest.raises(ValueError, match="compressed WAV"):
            mm.parse_wav_header(_wav(audio_format=85))

    def test_truncated_rejected(self):
        with pytest.raises(ValueError):
            mm.parse_wav_header(_wav()[:30])


def _mp3(n_frames=4, bitrate_idx=9, rate_idx=0, channel_bits=0, xing_frames=None):
    """CBR MPEG-1 Layer III frames (optionally Xing-tagged) behind ID3v2."""
    hdr = 0xFFFB0000 | (bitrate_idx << 12) | (rate_idx << 10) | (channel_bits << 6)
    bitrate = mm.MP3_BITRATES_V1L3[bitrate_idx] * 1000
    rate = mm.MP3_SAMPLE_RATES_V1[rate_idx]
    frame_len = 144 * bitrate // rate
    body = bytearray(struct.pack(">I", hdr)) + bytes(frame_len - 4)
    if xing_frames is not None:
        off = 4 + (17 if channel_bits == 3 else 32)
        body[off : off + 12] = b"Xing" + struct.pack(">II", 1, xing_frames)
    id3 = b"ID3\x04\x00\x00" + b"\x00\x00\x00\x00"
    return id3 + bytes(body) * n_frames


class TestMp3Parse:
    def test_cbr_frame_walk(self):
        # 5 frames at 44100 Hz -> 5*1152 samples -> 130 ms
        m = mm.parse_mp3_metadata(_mp3(n_frames=5))
        assert m["sample_rate"] == 44100 and m["channels"] == 2
        assert m["n_samples"] == 5 * 1152
        assert m["duration_ms"] == 5 * 1152 * 1000 // 44100
        assert m["bits_per_sample"] is None

    def test_xing_frame_count_wins(self):
        # container holds 2 physical frames but Xing declares 100
        m = mm.parse_mp3_metadata(_mp3(n_frames=2, xing_frames=100))
        assert m["n_samples"] == 100 * 1152

    def test_mono_and_other_rates(self):
        m = mm.parse_mp3_metadata(_mp3(rate_idx=1, channel_bits=3))
        assert m["sample_rate"] == 48000 and m["channels"] == 1

    def test_garbage_after_id3_rejected(self):
        with pytest.raises(ValueError, match="frame sync"):
            mm.parse_mp3_metadata(b"ID3\x04\x00\x00\x00\x00\x00\x00" + bytes(16))

    def test_non_mpeg1_l3_rejected(self):
        bad = bytearray(_mp3())
        bad[11] = 0xF3  # MPEG-2 version bits
        with pytest.raises(ValueError, match="MPEG-1 Layer III"):
            mm.parse_mp3_metadata(bytes(bad[10:]))


class TestOggParse:
    def test_vorbis_and_opus_metadata(self):
        from activestorage_ocr_spark.fixtures.gen_media import make_ogg_payload

        v = mm.parse_ogg_metadata(make_ogg_payload(0))
        assert v["container"] == "ogg-vorbis" and v["sample_rate"] == 8000
        assert v["duration_ms"] == 1000
        o = mm.parse_ogg_metadata(make_ogg_payload(1))
        assert o["container"] == "ogg-opus" and o["sample_rate"] == 48000
        assert o["channels"] == 1

    def test_unknown_codec_rejected(self):
        page = (b"OggS\x00\x02" + bytes(8) + bytes(8) + b"\x00\x00\x00\x00"
                + bytes([1, 4]) + b"zzzz")
        with pytest.raises(ValueError, match="unknown Ogg codec"):
            mm.parse_ogg_metadata(page)

    def test_truncated_rejected(self):
        with pytest.raises(ValueError):
            mm.parse_ogg_metadata(b"OggS" + bytes(5))


class TestAudioKernel:
    def test_metadata_and_stub_errors(self, spark):
        df = spark.createDataFrame(
            [
                ("u1", _wav(rate=8000, channels=1, n_samples=800)),
                ("u2", _mp3(n_frames=3)),                # mp3 -> real metadata
                ("u3", b"OggS" + bytes(16)),             # truncated ogg -> error
                ("u4", b"not audio at all"),             # skipped
                ("u5", _wav()[:20]),                     # truncated wav -> error
                ("u6", b"ID3\x04" + bytes(16)),          # malformed mp3 -> error
            ],
            "url string, audio binary",
        )
        rows = {r.url: r for r in mm.audio_metadata(df).collect()}
        assert set(rows) == {"u1", "u2", "u3", "u5", "u6"}
        assert rows["u1"].duration_ms == 100 and rows["u1"].decode_error is None
        assert rows["u2"].container == "mp3" and rows["u2"].decode_error is None
        assert rows["u2"].n_samples == 3 * 1152
        assert "Ogg" in rows["u3"].decode_error
        assert rows["u5"].decode_error is not None
        assert "sync" in rows["u6"].decode_error


class TestVideoFrameSample:
    def test_fanout_and_sampling(self, spark):
        frames = [bytes([i]) * 32 for i in range(10)]  # 10 frames at 40ms
        df = spark.createDataFrame(
            [
                ("v1", mm.encode_fake_video(frames, frame_ms=40)),
                ("v2", b"\x00\x00\x00\x20ftypisom" + bytes(24)),  # real codec
            ],
            "url string, video binary",
        )
        out = mm.video_frame_sample(df, every_ms=120).collect()
        by_url = {}
        for r in out:
            by_url.setdefault(r.url, []).append(r)
        # one input row fans out to sampled frame rows: ts 0,120,240,360
        got = sorted((r.frame_idx, r.ts_ms) for r in by_url["v1"])
        assert got == [(0, 0), (3, 120), (6, 240), (9, 360)]
        # frame bytes round-trip the fake container exactly
        for r in by_url["v1"]:
            assert r.frame == frames[r.frame_idx]
        # a real-codec payload drops (NotImplementedError path), job lives
        assert "v2" not in by_url

    def test_real_codec_marked_not_implemented(self):
        with pytest.raises(NotImplementedError, match="not available in this sandbox"):
            list(mm._iter_fake_video_frames(b"\x00\x00\x00\x20ftypisom"))


class TestMp4Metadata:
    def test_parse_versions_tracks_and_error_paths(self):
        from activestorage_ocr_spark.fixtures.gen_media import make_mp4_payload
        from activestorage_ocr_spark.operators.multimodal import parse_mp4_metadata

        m0 = parse_mp4_metadata(make_mp4_payload(0))  # v0 boxes, audio+video
        assert m0 == {"container": "mp4", "brand": "isom", "duration_ms": 1000,
                      "width": 320, "height": 240, "n_tracks": 2}
        m1 = parse_mp4_metadata(make_mp4_payload(1))  # v1 (64-bit) boxes
        assert (m1["duration_ms"], m1["width"], m1["n_tracks"]) == (1337, 336, 1)
        import pytest as _pt
        with _pt.raises(ValueError, match="no moov"):
            parse_mp4_metadata(make_mp4_payload(4))
        with _pt.raises(ValueError, match="not an ISO-BMFF"):
            parse_mp4_metadata(b"\x00\x01\x02")

    def test_largesize_and_zero_size_boxes(self):
        import struct
        from activestorage_ocr_spark.operators.multimodal import parse_mp4_metadata

        def box(typ, body):
            return struct.pack(">I", 8 + len(body)) + typ + body

        mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", 1000, 2500) + bytes(80))
        tkhd = box(b"tkhd", bytes(76) + struct.pack(">II", 64 << 16, 48 << 16))
        moov_body = mvhd + box(b"trak", tkhd)
        # moov with 64-bit largesize header
        moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_body)) + moov_body
        # trailing size-0 mdat (extends to EOF)
        payload = box(b"ftyp", b"isom" + bytes(4) + b"isom") + moov + struct.pack(">I", 0) + b"mdat" + bytes(7)
        m = parse_mp4_metadata(payload)
        assert (m["duration_ms"], m["width"], m["height"]) == (2500, 64, 48)

    def test_malformed_box_size_raises(self):
        import struct
        from activestorage_ocr_spark.operators.multimodal import parse_mp4_metadata

        bad = struct.pack(">I", 8) + b"ftypisomxxxx" + struct.pack(">I", 3) + b"moov"
        with pytest.raises(ValueError):
            parse_mp4_metadata(bad)

    def test_video_meta_row_asvf_and_nonvideo(self):
        from activestorage_ocr_spark.operators.multimodal import (
            encode_fake_video, video_meta_row,
        )

        row = video_meta_row("u", encode_fake_video([b"\x00" * 64] * 5, frame_ms=40))
        assert (row["container"], row["duration_ms"], row["n_tracks"]) == ("asvf", 200, 1)
        assert video_meta_row("u", b"not a video at all") is None

    def test_video_meta_kernel(self, spark):
        from activestorage_ocr_spark.fixtures.gen_media import synthetic_media_rows
        from activestorage_ocr_spark.operators.multimodal import video_metadata

        rows = synthetic_media_rows(40, "video")
        df = spark.createDataFrame(rows, "url string, video binary")
        out = video_metadata(df).collect()
        by_container = {}
        for r in out:
            by_container.setdefault(r.container, []).append(r)
        assert len(by_container["asvf"]) == 30
        assert len(by_container["mp4"]) == 10
        errs = [r for r in by_container["mp4"] if r.decode_error]
        oks = [r for r in by_container["mp4"] if not r.decode_error]
        assert errs and oks
        assert all(r.width and r.height and r.duration_ms for r in oks)
