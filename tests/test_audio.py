"""WAV/PCM codec + envelope fingerprint near-dup (operators/audio.py)."""

import math
import struct

import pytest

from sparkcrawl.operators import audio


def _sine(freq, n=800, rate=8000, amp=0.5):
    return [amp * math.sin(2 * math.pi * freq * i / rate) for i in range(n)]


def test_wav_roundtrip_within_quantization():
    s = _sine(440)
    rate, out = audio.decode_wav(audio.encode_wav(s, 8000))
    assert rate == 8000 and len(out) == len(s)
    assert max(abs(a - b) for a, b in zip(s, out)) < 1.5 / 32768


def test_wav_stereo_mean_mixed_and_8bit():
    # hand-build a stereo 8-bit file: L=+0.5, R=-0.5 -> mono 0
    data = bytes([192, 64] * 100)  # 8-bit unsigned: 192 ~ +0.5, 64 ~ -0.5
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, s = audio.decode_wav(payload)
    assert rate == 8000 and len(s) == 100
    assert all(abs(v) < 0.01 for v in s)


def test_wav_rejects_garbage_and_compressed():
    with pytest.raises(ValueError):
        audio.decode_wav(b"OggS junk")
    with pytest.raises(ValueError):
        audio.decode_wav(b"")
    # format 85 (mp3-in-wav) must raise, not mis-decode
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError):
        audio.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_stats_hand_computed():
    # constant zeros: silent
    st = audio.audio_stats(audio.encode_wav([0.0] * 400, 8000))
    assert st["rms"] == 0.0 and st["silence_ratio"] == 1.0
    assert st["duration_s"] == pytest.approx(0.05)
    # full-scale square wave alternating each sample: rms ~1, zcr ~1
    sq = [1.0 if i % 2 == 0 else -1.0 for i in range(400)]
    st = audio.audio_stats(audio.encode_wav(sq, 8000))
    assert st["rms"] == pytest.approx(1.0, abs=1e-3)
    assert st["zero_crossing_rate"] == pytest.approx(1.0, abs=1e-3)
    assert st["silence_ratio"] == 0.0
    assert st["peak"] == pytest.approx(1.0, abs=1e-3)


def test_fingerprint_volume_invariant_and_discriminative():
    a = _sine(200) + _sine(700) + _sine(350)
    quiet = [v * 0.3 for v in a]
    b = _sine(900) + _sine(150) + _sine(500)
    fa = audio.audio_fingerprint64(audio.encode_wav(a))
    fq = audio.audio_fingerprint64(audio.encode_wav(quiet))
    fb = audio.audio_fingerprint64(audio.encode_wav(b))
    assert fa == fq  # neighbor-energy comparisons survive volume scaling
    assert bin((fa ^ fb) & ((1 << 64) - 1)).count("1") > 10


def test_audio_near_dup_end_to_end(spark):
    clip_a = _sine(200) + _sine(700) + _sine(350)
    rows = [
        ("a", bytearray(audio.encode_wav(clip_a))),
        ("a_quiet", bytearray(audio.encode_wav([v * 0.4 for v in clip_a]))),
        ("b", bytearray(audio.encode_wav(_sine(900) + _sine(150) + _sine(500)))),
        ("junk", bytearray(b"ID3 not a wav")),
    ]
    media = spark.createDataFrame(rows, ["media_ref", "payload"])
    feats = {r["id"]: r for r in audio.audio_features(media).collect()}
    assert set(feats) == {"a", "a_quiet", "b"}
    assert feats["a"]["duration_s"] == pytest.approx(2400 / 8000)
    pairs = audio.audio_near_dup_pairs(media, max_distance=4).collect()
    assert [(p["id_a"], p["id_b"], p["distance"]) for p in pairs] == [
        ("a", "a_quiet", 0)
    ]
