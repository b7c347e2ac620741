"""Host-side WAV ingestion.

Decodes the competition's 1s/16kHz/mono/PCM16 clips into a single [N, 16000]
float32 array for the batched device feature graph — the replacement for the
reference's per-file librosa.load calls (src/precompute/process.py:28). A
C++ decoder (native/wavio.cpp, loaded via ctypes) handles the byte-level
parsing off the GIL when built; the pure-python `wave` fallback keeps the
pipeline dependency-free.
"""
from __future__ import annotations

import ctypes
import os
import wave

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native_lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                            "libwavio.so")
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.decode_wav_batch.restype = ctypes.c_int
                lib.decode_wav_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                    ctypes.c_int,
                ]
                _LIB = lib
            except OSError:
                _LIB = None
    return _LIB


def load_wav(path: str, expected_len: int = 16_000) -> np.ndarray:
    """One clip -> float32 [expected_len], PCM16 scaled by 1/32768 with tail
    zero-padding / truncation (librosa.load + pad_or_truncate semantics,
    reference src/precompute/methods.py:24-28)."""
    with wave.open(path) as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(f"{path}: expected mono PCM16")
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    y = data.astype(np.float32) / 32768.0
    if len(y) >= expected_len:
        return y[:expected_len]
    return np.pad(y, (0, expected_len - len(y)))


def load_wav_batch(paths: list[str], expected_len: int = 16_000,
                   n_threads: int = 0,
                   errors: list | None = None) -> np.ndarray:
    """[N, expected_len] float32. Uses the native threaded decoder if built.

    Per-file failure accounting mirrors the reference's precompute tally
    (src/precompute/process.py:107-108, core.py:36-45): a failed clip decodes
    to zeros and, when `errors` is given, (path, message) is appended to it
    instead of raising."""
    lib = _native_lib()
    out = np.zeros((len(paths), expected_len), dtype=np.float32)
    if lib is not None:
        c_paths = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        rc = lib.decode_wav_batch(
            c_paths, len(paths),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            expected_len, n_threads)
        if rc == 0:
            return out
        # some files failed: fall through to the python pass to identify them
    for i, p in enumerate(paths):
        try:
            out[i] = load_wav(p, expected_len)
        except Exception as e:
            out[i] = 0.0
            if errors is not None:
                errors.append((p, str(e)))
            else:
                raise
    return out
