"""Production batched extraction (features.extract_features_batched): the
scan layout (lax.scan over chunk bodies inside one jit) must be numerically
identical to the per-chunk dispatch layout, including the ragged-tail padding
path (n not a multiple of chunk). Covers the host API used by `cli
precompute`/the feature cache (reference hot loop:
/root/reference/src/precompute/process.py:25-108)."""
import numpy as np

from tpu_breath.config import FeatureSpec
from tpu_breath.features import extract_features_batched

SPEC = FeatureSpec()


def test_scan_matches_dispatch_ragged(real_clips):
    # n=3, chunk=2: exercises the pad-to-whole-chunks path and the trim back.
    wavs = np.asarray(real_clips[:3])
    f_scan, s_scan = extract_features_batched(wavs, SPEC, chunk=2, scan=True)
    f_disp, s_disp = extract_features_batched(wavs, SPEC, chunk=2, scan=False)

    assert f_scan.shape == f_disp.shape == (3, SPEC.n_channels, SPEC.n_mels,
                                            SPEC.t_fixed)
    assert s_scan.shape == s_disp.shape == (3, SPEC.n_scalars)
    np.testing.assert_array_equal(f_scan, f_disp)
    np.testing.assert_array_equal(s_scan, s_disp)
    assert np.isfinite(f_scan).all() and np.isfinite(s_scan).all()


def test_mesh_matches_dispatch(real_clips):
    # Mesh-sharded extraction (precompute --mesh): the batch axis of each
    # dispatch is sharded over a 4-device mesh; per-clip math means zero
    # collectives. The feature channels (everything z-scored / argmax-gated)
    # are bit-identical; the SPMD-partitioned module may fuse the scalar
    # descriptors' long clip-axis reductions differently, so scalars carry a
    # ~1-ulp tolerance (measured max 9.5e-7). Also covers the ragged tail
    # (3 clips, super-chunk 4 -> pad + trim).
    import jax
    from tpu_breath.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(jax.devices()[:4])
    wavs = np.asarray(real_clips[:3])
    f_mesh, s_mesh = extract_features_batched(wavs, SPEC, chunk=1, mesh=mesh)
    f_disp, s_disp = extract_features_batched(wavs, SPEC, chunk=1, scan=False)
    np.testing.assert_array_equal(f_mesh, f_disp)
    np.testing.assert_allclose(s_mesh, s_disp, rtol=1e-6, atol=2e-6)


def test_mesh_rejects_scan(real_clips):
    import jax
    import pytest
    from tpu_breath.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(jax.devices()[:4])
    with pytest.raises(ValueError, match="scan=True with mesh"):
        extract_features_batched(np.asarray(real_clips[:2]), SPEC, chunk=1,
                                 scan=True, mesh=mesh)


def test_default_layout_selection(real_clips):
    # scan=None defaults to the dispatch layout (scan is opt-in: it pays a
    # fresh whole-dataset compile per batch geometry — features.py docstring);
    # equality with the explicit flag pins the default route.
    wavs = np.asarray(real_clips[:2])
    f_auto, s_auto = extract_features_batched(wavs, SPEC, chunk=2)
    f_disp, s_disp = extract_features_batched(wavs, SPEC, chunk=2, scan=False)
    np.testing.assert_array_equal(f_auto, f_disp)
    np.testing.assert_array_equal(s_auto, s_disp)
