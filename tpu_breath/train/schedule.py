"""LR schedule: linear warmup (start factor 0.1, 5% of total steps) into
cosine annealing to eta_min — exact optax reimplementation of the reference's
SequentialLR(LinearLR, CosineAnnealingLR) stepped per *batch*
(reference src/train.py:41-50,101)."""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(base_lr: float, total_steps: int, warmup_frac: float = 0.05,
                  start_factor: float = 0.1, eta_min: float = 1e-6):
    warmup_steps = int(warmup_frac * total_steps)
    t_max = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            frac = jnp.minimum(step / warmup_steps, 1.0)
            warm = base_lr * (start_factor + (1.0 - start_factor) * frac)
        else:
            warm = jnp.asarray(base_lr)
        t = jnp.clip(step - warmup_steps, 0, t_max)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t / t_max))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
