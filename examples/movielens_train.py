#!/usr/bin/env python
"""MovieLens rating model (reference demo: movielens-1m-keras).

Usage: python examples/movielens_train.py [--steps 300] [--multi-hot]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from recommenders_addons_tpu.models.movielens import run_demo

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--multi-hot", action="store_true")
    a = p.parse_args()
    train_mse, eval_mse = run_demo(
        steps=a.steps, batch_size=a.batch_size, multi_hot=a.multi_hot,
        log_every=50,
    )
    print(f"final: train_mse={train_mse:.4f} eval_mse={eval_mse:.4f}")
