"""Orbax checkpointing with true resume.

The reference only *saves* on improvement (torch.save of model/opt/sched
state, src/train.py:152-164) and cannot resume a training run; here the full
TrainState (params, batch_stats, optimizer state, step) plus metadata goes
through Orbax, and restore_latest() continues an interrupted run.
"""
from __future__ import annotations

import json
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _dir(save_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(save_dir), f"best_epoch{epoch:03d}")


def save(save_dir: str, state, epoch: int, metadata: dict) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = _dir(save_dir, epoch)
    # Multi-process: every process calls save with the SAME path (Orbax's
    # coordinated protocol — host-numpy values are written by the primary
    # only); side files are primary-only.
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"epoch": epoch,
                       **{k: float(v) for k, v in metadata.items()}}, f)
    return path


def latest_checkpoint(save_dir: str) -> str | None:
    if not os.path.isdir(save_dir):
        return None
    best = None
    for name in os.listdir(save_dir):
        m = re.fullmatch(r"best_epoch(\d+)", name)
        if not m:
            continue
        # metadata.json is written LAST in save(): a directory without it is
        # a save interrupted mid-write — skip it so resume/predict fall back
        # to the newest INTACT checkpoint instead of crashing on a partial
        if not os.path.exists(os.path.join(save_dir, name, "metadata.json")):
            continue
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), os.path.join(save_dir, name))
    return best[1] if best else None


def restore(path: str, target_state):
    """Restore a TrainState (shapes/dtypes from target_state)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(target_state))


def restore_latest(save_dir: str, target_state):
    path = latest_checkpoint(save_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {save_dir}")
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    return restore(path, target_state), int(meta["epoch"])


def load_metadata(path: str) -> dict:
    with open(os.path.join(path, "metadata.json")) as f:
        return json.load(f)
