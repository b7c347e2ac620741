"""Native/python WAV decoder edge cases: extra RIFF chunks, short files,
pad/truncate semantics, failure accounting."""
import os
import struct
import wave

import numpy as np
import pytest

from tpu_breath.data import wav as wav_io


def _write_wav(path, samples, sr=16000, extra_chunk=False):
    """Hand-rolled RIFF writer so we can inject a LIST chunk before data."""
    data = np.asarray(samples, np.int16).tobytes()
    chunks = b""
    if extra_chunk:
        info = b"INFOICMT" + struct.pack("<I", 4) + b"test"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + chunks
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


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
