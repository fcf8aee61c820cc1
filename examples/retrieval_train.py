#!/usr/bin/env python
"""Two-tower retrieval (reference demo: MovieLens two-tower)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from recommenders_addons_tpu.models.retrieval import run_demo

if __name__ == "__main__":
    loss, recall = run_demo(log_every=50)
    print(f"final: loss={loss:.4f} group-recall@10={recall:.3f}")
