"""scipy.signal.find_peaks (height + distance) as a fixed-shape JAX routine.

The reference counts envelope peaks with find_peaks(height=mean,
distance=sr//10) (src/precompute/methods.py:76-82). scipy's algorithm:
local maxima (plateau-aware) -> height filter -> greedy distance suppression
in descending height order. Here candidates are capped at K (top-K by height)
and the greedy pass is a K-step lax.scan over boolean masks. Real 1s
breathing-envelope clips show 250-600 above-mean local maxima, so K=2048 makes
the truncation immaterial (a candidate outside the top K could only matter if
>K higher candidates all fell in other suppression windows).

Plateau semantics match scipy's _local_maxima_1d: a run of equal samples is
ONE peak at the run's floor-midpoint, iff the samples just outside both run
edges are strictly lower; runs touching either signal boundary never qualify.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def local_maxima(x: jax.Array) -> jax.Array:
    """Boolean mask of plateau-aware local maxima (scipy _local_maxima_1d).

    Vectorized run-length trick: left_edge[i]/right_edge[i] are the first/last
    index of the equal-value run containing i (two cumulative max/min scans);
    a run is a peak iff both run-adjacent samples exist and are strictly
    lower, and only the run's floor-midpoint carries the peak.
    """
    n = x.shape[-1]
    idx = jnp.arange(n)
    starts = jnp.concatenate([jnp.array([True]), x[1:] != x[:-1]])
    ends = jnp.concatenate([x[1:] != x[:-1], jnp.array([True])])
    left_edge = lax.cummax(jnp.where(starts, idx, -1))
    right_edge = -lax.cummax(jnp.where(ends, -idx, -n), reverse=True)
    left_ok = (left_edge > 0) & (x[jnp.clip(left_edge - 1, 0, n - 1)] < x)
    right_ok = (right_edge < n - 1) & (x[jnp.clip(right_edge + 1, 0, n - 1)] < x)
    mid = (left_edge + right_edge) // 2
    return left_ok & right_ok & (idx == mid)


def find_peaks_stats(x: jax.Array, height: jax.Array, distance: int,
                     k_max: int = 2048):
    """One signal x[n]: returns (n_peaks, mean_height, std_height) of the
    surviving peaks with the reference's empty/singleton conventions
    (mean=0 when none, std=0 unless n>1)."""
    k_max = min(k_max, x.shape[-1])
    is_peak = local_maxima(x)
    candidate = is_peak & (x >= height)
    scores = jnp.where(candidate, x, -jnp.inf)
    heights, pos = lax.top_k(scores, k_max)  # descending
    valid = jnp.isfinite(heights)

    def body(carry, i):
        alive = carry
        take = alive[i] & valid[i]
        # suppress everything within `distance` of this peak (except itself)
        near = (jnp.abs(pos - pos[i]) < distance) & (jnp.arange(k_max) != i)
        alive = jnp.where(take, alive & ~near, alive)
        return alive, take

    alive0 = jnp.ones(k_max, bool)
    _, kept = lax.scan(body, alive0, jnp.arange(k_max))
    n_peaks = jnp.sum(kept)
    kh = jnp.where(kept, heights, 0.0)
    mean_h = jnp.where(n_peaks > 0, jnp.sum(kh) / jnp.maximum(n_peaks, 1), 0.0)
    var_h = jnp.where(
        n_peaks > 0,
        jnp.sum(jnp.where(kept, (heights - mean_h) ** 2, 0.0))
        / jnp.maximum(n_peaks, 1),
        0.0)
    std_h = jnp.where(n_peaks > 1, jnp.sqrt(var_h), 0.0)
    return n_peaks.astype(x.dtype), mean_h, std_h
