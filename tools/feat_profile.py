"""Per-subgraph throughput profiler for the feature stack (one TPU chip).

Thin CLI over tpu_breath.utils.profiling — the same stage table backs the
production `cli precompute --profile DIR` observability path.

Usage: PYTHONPATH=. python tools/feat_profile.py [stage ...]
       (no args = all stages; see profiling.feature_stages())
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_breath.data import wav as wav_io
from tpu_breath.utils import profiling

B = 2048


def main() -> None:
    names = sys.argv[1:] or None
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:B]
    wavs = wav_io.load_wav_batch(paths)
    profiling.profile_feature_stages(wavs, names=names)


if __name__ == "__main__":
    main()
