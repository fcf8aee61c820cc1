#!/usr/bin/env python
"""Sequence + dense-feature ranking model (reference demo: seq_and_dense).

A behavior-sequence model: a shared dynamic-embedding table feeds both the
user's recent-item sequence (mean-pooled over the valid prefix) and the
dense-side categorical features, concatenated with dense floats into an MLP.

Usage: python examples/seq_and_dense_train.py [--steps 200]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from recommenders_addons_tpu.models.seq_and_dense import run_demo

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=256)
    a = p.parse_args()
    train_mse, eval_mse = run_demo(
        steps=a.steps, batch_size=a.batch_size, log_every=25)
    print(f"final: train_mse={train_mse:.4f} eval_mse={eval_mse:.4f}")
