"""Input-pipeline tests: Criteo TSV reader, prefetcher, string hashing."""

import numpy as np
import jax.numpy as jnp
import pytest

from recommenders_addons_tpu.data import CriteoTSVReader, prefetch
from recommenders_addons_tpu.ops.hashing import (
    _fnv1a64_vectorized,
    _native_hash,
    hash_strings,
)


def _write_criteo(path, n=10):
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for i in range(n):
            label = i % 2
            dense = [str(rng.integers(0, 100)) if j != 3 else ""
                     for j in range(13)]
            cats = [f"{rng.integers(0, 0xffff):x}" if j != 5 else ""
                    for j in range(26)]
            f.write("\t".join([str(label)] + dense + cats) + "\n")


@pytest.mark.slow
def test_dlrm_example_trains_on_tsv_file(tmp_path):
    """End-to-end: examples/dlrm_train.py consumes a REAL Criteo-format
    TSV through CriteoTSVReader + Prefetcher and reports a held-out AUC
    (round-2 review item #7: the loader is wired into the example, not
    just unit-tested on fabricated rows)."""
    import os
    import subprocess
    import sys

    p = str(tmp_path / "train.tsv")
    # learnable signal: label correlates with a categorical feature
    rng = np.random.default_rng(1)
    with open(p, "w") as f:
        for i in range(2000):
            hot = rng.integers(0, 2)
            label = hot if rng.random() < 0.9 else 1 - hot
            dense = [str(rng.integers(0, 100)) for _ in range(13)]
            cats = [f"v{rng.integers(0, 50)}" for _ in range(26)]
            cats[0] = f"hot{hot}"
            f.write("\t".join([str(label)] + dense + cats) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "dlrm_train.py"),
         "--data", p, "--steps", "60", "--batch-size", "256",
         "--dim", "8", "--eval-batches", "2"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("AUC")][-1]
    auc = float(line.rsplit(" ", 1)[1])
    assert auc > 0.8, (auc, out.stdout)


def test_criteo_reader(tmp_path):
    p = str(tmp_path / "day.tsv")
    _write_criteo(p, 10)
    batches = list(CriteoTSVReader(p, batch_size=4))
    assert [len(b["label"]) for b in batches] == [4, 4, 2]
    b = batches[0]
    assert b["dense"].shape == (4, 13) and b["dense"].dtype == np.float32
    assert b["sparse"].shape == (4, 26) and b["sparse"].dtype == np.int64
    # missing dense column -> 0; missing cat -> a stable sentinel token
    assert (b["dense"][:, 3] == 0).all()
    assert len(set(b["sparse"][:, 5].tolist())) == 1
    # per-column tokens don't collide across columns
    assert b["sparse"][0, 0] != b["sparse"][0, 1]


def test_reader_repeat_and_prefetch(tmp_path):
    p = str(tmp_path / "day.tsv")
    _write_criteo(p, 8)
    src = CriteoTSVReader(p, batch_size=8, repeat=True)
    it = prefetch(src, depth=2)
    seen = [next(it) for _ in range(3)]  # repeats past one epoch
    assert all(s["label"].shape == (8,) for s in seen)
    assert isinstance(seen[0]["dense"], jnp.ndarray)  # device-placed


def test_prefetch_propagates_errors():
    def bad_source():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = prefetch(bad_source(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in it:
            pass


def test_hash_native_matches_python():
    strs = [f"k{i}" for i in range(1000)] + ["", "x" * 100]
    py = _fnv1a64_vectorized(strs)
    nat = _native_hash(strs)
    if nat is not None:
        np.testing.assert_array_equal(py, nat)
    out = hash_strings(strs)
    assert len(set(out.tolist())) == len(set(strs))
    out2 = hash_strings(strs, algo="blake2")
    assert len(set(out2.tolist())) == len(set(strs))


def _write_movielens(path, n=3000, fmt="dat"):
    """Fabricated ratings with a latent structure (user x movie parity)."""
    rng = np.random.default_rng(2)
    sep = "::" if fmt == "dat" else "\t"
    with open(path, "w") as f:
        for _ in range(n):
            u = int(rng.integers(1, 200))
            m = int(rng.integers(1, 300))
            r = 4.0 if (u + m) % 2 == 0 else 2.0
            f.write(sep.join([str(u), str(m), str(r), "978300760"]) + "\n")


def test_movielens_reader_both_formats(tmp_path):
    from recommenders_addons_tpu.data import MovieLensRatingsReader

    for fmt in ("dat", "tsv"):
        p = str(tmp_path / f"ratings.{fmt}")
        _write_movielens(p, n=1000, fmt=fmt)
        batches = list(MovieLensRatingsReader(p, batch_size=256))
        assert sum(b["user"].shape[0] for b in batches) == 1000
        b = batches[0]
        assert b["user"].dtype == np.int64
        assert b["rating"].dtype == np.float32
        assert set(np.unique(b["rating"])) <= {2.0, 4.0}
        # shuffled: file order is not preserved
        assert b["user"].shape[0] == 256


def test_movielens_reader_shuffles_and_repeats(tmp_path):
    from recommenders_addons_tpu.data import MovieLensRatingsReader

    p = str(tmp_path / "ratings.dat")
    _write_movielens(p, n=768)
    it = iter(MovieLensRatingsReader(p, batch_size=256, repeat=True,
                                     seed=3))
    seen = [next(it) for _ in range(6)]  # two epochs of 3 batches
    assert all(b["user"].shape[0] == 256 for b in seen)
    # two epochs' first batches differ (reshuffled)
    assert not np.array_equal(seen[0]["user"], seen[3]["user"])


@pytest.mark.slow
def test_movielens_example_trains_on_ratings_file(tmp_path):
    """End-to-end: examples/movielens_train.py consumes a REAL
    MovieLens-format ratings file through MovieLensRatingsReader +
    Prefetcher and reports a held-out MSE that beats the variance of the
    fabricated signal."""
    import os
    import subprocess
    import sys

    p = str(tmp_path / "ratings.dat")
    _write_movielens(p, n=4000)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples",
                                      "movielens_train.py"),
         "--data", p, "--steps", "80", "--batch-size", "256",
         "--eval-batches", "2"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if "eval_mse" in l][-1]
    mse = float(line.rsplit(" ", 1)[1])
    # label variance is 1.0 (ratings 2/4 with equal mass); learning the
    # parity structure must do clearly better
    assert mse < 0.8, out.stdout[-2000:]
