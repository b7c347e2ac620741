"""Test environment: force CPU with 8 virtual devices so pjit/Mesh sharding is
testable without a TPU pod (must run before jax is imported anywhere)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest
import wave


REFERENCE_WAVS = "/root/reference/input/test"


def load_wav(path: str) -> np.ndarray:
    with wave.open(path) as w:
        assert w.getnchannels() == 1 and w.getframerate() == 16000
        data = w.readframes(w.getnframes())
    return np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0


@pytest.fixture(scope="session")
def real_clips() -> np.ndarray:
    """A small batch of real stethoscope clips from the reference test set."""
    import glob
    paths = sorted(glob.glob(os.path.join(REFERENCE_WAVS, "*.wav")))[:4]
    if not paths:
        pytest.skip("reference wav data not available")
    return np.stack([load_wav(p)[:16000] for p in paths])


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
