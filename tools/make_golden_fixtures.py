"""Regenerate the committed golden feature fixtures from the NumPy oracle.

Usage: PYTHONPATH=. python tools/make_golden_fixtures.py

The fixtures pin the full per-clip feature pipeline (tests/
test_golden_fixtures.py). Regenerate ONLY when the oracle intentionally
changes (e.g. the round-2 switch of chroma_cens to the librosa-faithful
multirate CQT + per-clip tuning estimation); the git history of the .npz
files is the record of every such numeric contract change.
"""
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_breath.config import FeatureSpec
from tpu_breath.baseline import feature_np

CLIPS = [
    "/root/reference/input/test/steth_20180814_09_37_59_010.wav",
    "/root/reference/input/test/steth_20180814_09_38_51_004.wav",
]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def load_wav(path: str) -> np.ndarray:
    with wave.open(path) as w:
        assert w.getnchannels() == 1 and w.getframerate() == 16000
        data = w.readframes(w.getnframes())
    return np.frombuffer(data, dtype=np.int16).astype(np.float32)[:16000] / 32768.0


def main() -> None:
    spec = FeatureSpec()
    os.makedirs(OUT_DIR, exist_ok=True)
    for path in CLIPS:
        y = load_wav(path)
        out = feature_np.process_clip(y, spec)
        name = os.path.splitext(os.path.basename(path))[0]
        arrays = {"wav": y, "scalars": out["scalars"]}
        for k in spec.channel_order:
            arrays[k] = out[k]
        dest = os.path.join(OUT_DIR, f"golden_{name}.npz")
        np.savez(dest, **arrays)
        print("wrote", dest)


if __name__ == "__main__":
    main()
