"""Native/python WAV decoder edge cases: extra RIFF chunks, short files,
pad/truncate semantics, failure accounting, and the librosa.load(sr=16000)
ingest semantics — wrong-rate resampling, stereo downmix, PCM24/32 and
IEEE-float sample formats (reference src/precompute/process.py:28)."""
import os
import struct
import wave

import numpy as np
import pytest

from tpu_breath.data import wav as wav_io


def _pack_samples(samples, fmt_code, bits):
    a = np.asarray(samples)
    if fmt_code == 3:
        return a.astype("<f4" if bits == 32 else "<f8").tobytes()
    if bits == 16:
        return a.astype("<i2").tobytes()
    if bits == 32:
        return a.astype("<i4").tobytes()
    if bits == 24:
        v = a.astype(np.int64) & 0xFFFFFF
        b = np.empty((len(v), 3), np.uint8)
        b[:, 0], b[:, 1], b[:, 2] = v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF
        return b.tobytes()
    raise ValueError(bits)


def _write_wav(path, samples, sr=16000, extra_chunk=False, channels=1,
               fmt_code=1, bits=16):
    """Hand-rolled RIFF writer so we can inject a LIST chunk before data and
    emit arbitrary rates / channel counts / sample formats. `samples` is
    interleaved when channels > 1."""
    data = _pack_samples(samples, fmt_code, bits)
    chunks = b""
    if extra_chunk:
        info = b"INFOICMT" + struct.pack("<I", 4) + b"test"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, channels, sr, sr * block, block,
                      bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + chunks
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def _python_only(paths, **kw):
    """Force the pure-python decode path (native lib bypassed)."""
    return np.stack([wav_io.load_wav(p, **kw) for p in paths])


@pytest.mark.parametrize("extra_chunk", [False, True])
def test_decoder_handles_extra_chunks(tmp_path, extra_chunk):
    samples = (np.sin(np.arange(16000) * 0.01) * 20000).astype(np.int16)
    p = str(tmp_path / "clip.wav")
    _write_wav(p, samples, extra_chunk=extra_chunk)
    got = wav_io.load_wav_batch([p])
    np.testing.assert_allclose(got[0], samples.astype(np.float32) / 32768.0)


def test_short_clip_zero_padded(tmp_path):
    samples = np.full(1000, 1234, np.int16)
    p = str(tmp_path / "short.wav")
    _write_wav(p, samples)
    got = wav_io.load_wav_batch([p])
    assert got.shape == (1, 16000)
    assert np.all(got[0, 1000:] == 0.0)
    np.testing.assert_allclose(got[0, :1000], 1234 / 32768.0)


def test_long_clip_truncated(tmp_path):
    samples = np.arange(20000, dtype=np.int16)
    p = str(tmp_path / "long.wav")
    _write_wav(p, samples)
    got = wav_io.load_wav_batch([p])
    np.testing.assert_allclose(got[0], samples[:16000].astype(np.float32) / 32768.0)


def _tone(sr, freq=1000.0, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def _dominant_freq(y, sr=16000):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(spec) * sr / len(y)


@pytest.mark.parametrize("sr_in", [8000, 22050, 44100, 48000])
def test_wrong_rate_is_resampled(tmp_path, sr_in):
    """A non-16 kHz file must arrive resampled, not consumed at the wrong
    rate: a 1 kHz tone stays a 1 kHz tone at ~unchanged amplitude."""
    tone = _tone(sr_in)
    p = str(tmp_path / f"tone{sr_in}.wav")
    _write_wav(p, (tone * 32767).astype(np.int16), sr=sr_in)
    for got in (wav_io.load_wav_batch([p])[0], _python_only([p])[0]):
        assert got.shape == (16000,)
        assert abs(_dominant_freq(got) - 1000.0) < 2.0
        mid = got[2000:14000]  # away from filter edge effects
        assert abs(np.max(np.abs(mid)) - 0.5) < 0.01
        # time alignment: output t sits at input time t*sr_in/16000
        ref = 0.5 * np.sin(2 * np.pi * 1000.0 * np.arange(16000) / 16000.0)
        assert np.max(np.abs(mid - ref[2000:14000])) < 0.01


def test_native_matches_python_resample(tmp_path):
    rng = np.random.default_rng(7)
    y = rng.standard_normal(44100) * 0.2
    p = str(tmp_path / "noise.wav")
    _write_wav(p, (y * 32767).astype(np.int16), sr=44100)
    native = wav_io.load_wav_batch([p])[0]
    python = _python_only([p])[0]
    if wav_io._native_lib() is None:
        import shutil
        if shutil.which("g++"):
            pytest.fail("native decoder unavailable despite a toolchain — "
                        "the build_native_decoder fixture should have built it")
        pytest.skip("native decoder not built (no toolchain)")
    np.testing.assert_allclose(native, python, atol=2e-6)


def test_stereo_downmix(tmp_path):
    """Multi-channel audio downmixes by channel mean (librosa mono=True)."""
    left = (np.arange(16000) % 100 - 50).astype(np.int16) * 100
    right = np.full(16000, 5000, np.int16)
    inter = np.empty(32000, np.int16)
    inter[0::2], inter[1::2] = left, right
    p = str(tmp_path / "stereo.wav")
    _write_wav(p, inter, channels=2)
    want = (left.astype(np.float64) + right) / 2.0 / 32768.0
    np.testing.assert_allclose(wav_io.load_wav_batch([p])[0], want, atol=1e-7)
    np.testing.assert_allclose(_python_only([p])[0], want, atol=1e-7)


@pytest.mark.parametrize("fmt_code,bits", [(1, 24), (1, 32), (3, 32), (3, 64)])
def test_sample_formats(tmp_path, fmt_code, bits):
    rng = np.random.default_rng(3)
    y = rng.uniform(-0.9, 0.9, 16000)
    if fmt_code == 1:  # int PCM: full-scale divisor is 2^(bits-1)
        divisor = float(1 << (bits - 1))
        stored = np.round(y * divisor).astype(np.int64)
        want = stored / divisor
    else:  # IEEE float stored as-is
        stored = y
        want = y.astype(np.float32).astype(np.float64) if bits == 32 else y
    p = str(tmp_path / f"fmt{fmt_code}_{bits}.wav")
    _write_wav(p, stored, fmt_code=fmt_code, bits=bits)
    np.testing.assert_allclose(wav_io.load_wav_batch([p])[0], want, atol=3e-7)
    np.testing.assert_allclose(_python_only([p])[0], want, atol=3e-7)


def test_16k_mono_pcm16_bit_exact_fast_path(tmp_path):
    """The competition format must decode bit-identically to int16/32768
    (no resampler in the path)."""
    samples = np.array([-32768, -1, 0, 1, 32767] * 3200, np.int16)
    p = str(tmp_path / "exact.wav")
    _write_wav(p, samples)
    want = samples.astype(np.float32) / 32768.0
    assert np.array_equal(wav_io.load_wav_batch([p])[0], want)
    assert np.array_equal(_python_only([p])[0], want)


def test_failure_accounting(tmp_path):
    good = str(tmp_path / "good.wav")
    _write_wav(good, np.zeros(16000, np.int16))
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    errors: list = []
    out = wav_io.load_wav_batch([good, bad, str(tmp_path / "missing.wav")],
                                errors=errors)
    assert out.shape == (3, 16000)
    assert len(errors) == 2
    assert not out[1].any() and not out[2].any()
