"""DLRM acceptance run on the real chip through the FULL data pipeline.

The environment has no dataset egress (Kaggle/Criteo downloads are
unreachable), so this fabricates a Criteo-FORMAT dataset with realistic
structure — power-law categorical vocabularies, multi-feature signal,
label noise — and drives the production path end to end:

    TSV file -> CriteoTSVReader (string fingerprinting, log1p dense)
             -> Prefetcher (background thread + device_put)
             -> examples/dlrm_train.py-style training on the TPU
             -> held-out AUC.

Records the SURVEY §6 acceptance evidence the review asked for, with the
documented synthetic fallback (VERDICT item #7 / BASELINE.md).

    python tools/acceptance_dlrm.py [rows] [steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 90
BATCH = 4096
PATH = "/tmp/criteo_synth.tsv"


def gen(path: str, rows: int, seed: int = 7) -> None:
    """Criteo-format rows with CTR-like structure: 26 categorical
    features with power-law vocabularies; the label mixes contributions
    from several features + dense signal + noise."""
    rng = np.random.default_rng(seed)
    vocab_sizes = rng.integers(50, 100_000, size=26)
    # per-feature, per-token propensity weights for the signal features
    signal_feats = [0, 3, 7, 12, 20]
    weights = {
        j: rng.normal(0, 1.2, size=min(int(vocab_sizes[j]), 4096))
        for j in signal_feats
    }
    t0 = time.time()
    with open(path, "w") as f:
        for off in range(0, rows, 50_000):
            n = min(50_000, rows - off)
            # zipf-ish ids: square a uniform to skew toward small ids
            u = rng.random((n, 26))
            ids = (u * u * vocab_sizes[None, :]).astype(np.int64)
            dense = rng.integers(0, 1000, size=(n, 13))
            logit = 0.3 * (np.log1p(dense[:, 0]) - 3.0)
            for j in signal_feats:
                w = weights[j]
                logit = logit + w[ids[:, j] % len(w)]
            p = 1.0 / (1.0 + np.exp(-0.8 * logit))
            label = (rng.random(n) < p).astype(np.int64)
            lines = []
            for i in range(n):
                cats = [f"{ids[i, j]:x}" for j in range(26)]
                dn = [str(int(x)) for x in dense[i]]
                lines.append("\t".join([str(label[i])] + dn + cats))
            f.write("\n".join(lines) + "\n")
    print(f"generated {rows} rows -> {path} "
          f"({os.path.getsize(path) / 1e6:.0f} MB, {time.time()-t0:.0f}s)",
          flush=True)


def main():
    if not (os.path.exists(PATH)
            and os.path.getsize(PATH) > ROWS * 100):
        gen(PATH, ROWS)
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "dlrm_train.py"),
         "--data", PATH, "--steps", str(STEPS), "--batch-size", str(BATCH),
         "--dim", "32", "--eval-batches", "8"],
        capture_output=True, text=True, timeout=3000, cwd=repo,
    )
    print(out.stdout[-2000:], flush=True)
    if out.returncode != 0:
        print(out.stderr[-3000:], flush=True)
        raise SystemExit(1)
    print(f"wall {time.time()-t0:.0f}s "
          f"({STEPS * BATCH} examples trained, device="
          f"{'tpu' if 'JAX_PLATFORMS' not in os.environ else os.environ['JAX_PLATFORMS']})",
          flush=True)


if __name__ == "__main__":
    main()
