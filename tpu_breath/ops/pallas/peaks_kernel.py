"""Pallas kernel: find_peaks greedy distance suppression, VMEM-resident.

The production find_peaks path (ops/peaks.py, distance = sr//10) runs ~12
sequential rounds of "per-clip argmax over candidate scores, then mask out
a +/-distance window". XLA executes each round as separate reduction/select
kernels that re-read the [B, 16000] score array from HBM every round; here
the whole loop runs inside one pallas_call with the scores resident in
VMEM, 64 clips per grid step so every round's reductions stay vectorized
across the batch (grid steps run sequentially on the single TensorCore —
a per-clip grid would serialize what XLA vectorizes, measured 17% SLOWER;
this layout reuses the batch parallelism AND keeps the rounds in VMEM).

Semantics match ops/peaks.py::find_peaks_stats's fast path exactly (ties
resolved to the lowest index), asserted by tests/test_pallas_peaks.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = np.float32(-np.inf)  # numpy scalar: jnp scalars become captured consts
_CLIPS = 64  # clips per grid step: scores block 64 x 16000 f32 = 4.1 MB VMEM


def _suppress_kernel(scores_ref, vals_ref, kept_ref, *, distance: int,
                     rounds: int):
    scores = scores_ref[:]                      # [C, n] f32
    c, n = scores.shape
    pos = lax.broadcasted_iota(jnp.int32, (c, n), 1)
    big = jnp.int32(n)
    out_cols = vals_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (c, out_cols), 1)

    def body(i, carry):
        # results accumulate in registers via lane masks: a single-lane
        # dynamic store per round cannot be lowered (lane offsets must be
        # 128-multiples); one full store happens after the loop
        scores, vals_acc, kept_acc = carry
        m = jnp.max(scores, axis=1, keepdims=True)          # [C, 1]
        take = m > _NEG
        # lowest index among ties, like argmax / top_k
        idx = jnp.min(jnp.where((scores == m) & take, pos, big),
                      axis=1, keepdims=True)
        near = jnp.abs(pos - idx) < distance
        new_scores = jnp.where(near, _NEG, scores)
        this_lane = lane == i
        vals_acc = jnp.where(this_lane & take, m, vals_acc)
        kept_acc = jnp.where(this_lane & take, 1.0, kept_acc)
        return new_scores, vals_acc, kept_acc

    zeros = jnp.zeros((c, out_cols), jnp.float32)
    _, vals_acc, kept_acc = lax.fori_loop(0, rounds, body,
                                          (scores, zeros, zeros))
    vals_ref[:] = vals_acc
    kept_ref[:] = kept_acc


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def suppress_peaks_pallas(scores: jax.Array, distance: int, rounds: int,
                          interpret: bool | None = None):
    """scores [B, n] (candidate heights, -inf elsewhere) ->
    (vals [B, rounds], kept [B, rounds]) of greedy suppression survivors."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n = scores.shape
    c = min(_CLIPS, b) if b % min(_CLIPS, b) == 0 else b
    b_pad = -(-b // c) * c - b
    if b_pad:
        scores = jnp.pad(scores, ((0, b_pad), (0, 0)),
                         constant_values=-np.inf)
    out_cols = -(-rounds // 128) * 128
    vals, kept = pl.pallas_call(
        functools.partial(_suppress_kernel, distance=distance,
                          rounds=rounds),
        grid=((b + b_pad) // c,),
        in_specs=[pl.BlockSpec((c, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((c, out_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, out_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b + b_pad, out_cols), jnp.float32),
            jax.ShapeDtypeStruct((b + b_pad, out_cols), jnp.float32),
        ],
        interpret=interpret,
    )(scores)
    return vals[:b, :rounds], kept[:b, :rounds] > 0.5
