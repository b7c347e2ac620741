"""CLI surface tests: parser wiring, reference back-compat, config overrides."""
import argparse

import pytest

from tpu_breath.cli import build_parser
from tpu_breath.config import CNN8_TRAIN, VGG_TRAIN, TrainCfg, Paths


def test_subcommands_exist():
    p = build_parser()
    for cmd in ("precompute", "train", "predict", "e2e"):
        args = p.parse_args([cmd])
        assert args.cmd == cmd


def test_legacy_precompute_flag():
    p = build_parser()
    args = p.parse_args(["--precompute"])
    assert args.precompute and args.cmd is None


def test_train_flags():
    p = build_parser()
    a = p.parse_args(["train", "--archs", "vgg", "--epochs", "7", "--fused",
                      "--seed", "3", "--resume", "--root", "/data"])
    assert a.archs == "vgg" and a.epochs == 7 and a.fused and a.seed == 3
    assert a.resume and a.root == "/data"


def test_orchestrator_hyperparams_match_reference():
    # reference src/scripts.py:19-34 (CNN8) and :38-46 (VGG uses defaults, D5)
    assert (CNN8_TRAIN.num_epochs, CNN8_TRAIN.base_lr) == (100, 4e-4)
    assert (CNN8_TRAIN.cutmix_prob, CNN8_TRAIN.mixup_prob) == (0.6, 0.4)
    assert (CNN8_TRAIN.patience, CNN8_TRAIN.warmup_epochs) == (25, 4)
    assert (VGG_TRAIN.num_epochs, VGG_TRAIN.patience) == (140, 55)
    d = TrainCfg()
    assert (VGG_TRAIN.base_lr, VGG_TRAIN.cutmix_prob, VGG_TRAIN.mixup_prob,
            VGG_TRAIN.warmup_epochs) == (d.base_lr, d.cutmix_prob,
                                         d.mixup_prob, d.warmup_epochs)


def test_paths_single_root():
    p = Paths(root="data")
    assert p.precomputed_dir.startswith("data")
    assert p.feature_cache.startswith("data")
    assert p.train_csv == "data/train.csv"
