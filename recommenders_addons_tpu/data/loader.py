"""Data loading for recommender training.

The reference's demos feed from tf.data (C++ input pipelines). The TPU
framework equivalent here:

  * :class:`CriteoTSVReader` — chunked reader for Criteo-format TSV
    (label \\t 13 numeric \\t 26 categorical-hex), hashing the categorical
    tokens through the native batch hasher (ops/hashing.hash_strings) and
    log-normalizing the numeric features (standard Criteo recipe).
  * :class:`Prefetcher` — a background thread that prepares the next
    batches (host-side numpy work + device_put) while the accelerator
    trains, i.e. tf.data's prefetch(AUTOTUNE) role.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from recommenders_addons_tpu.ops import hashing


class CriteoTSVReader:
    """Chunked Criteo TSV -> training batches.

    Yields dicts: ``dense [B, 13] float32`` (log1p-normalized, missing=0),
    ``sparse [B, 26] int64`` (feature-tagged fingerprints; missing gets a
    per-column sentinel token so it stays a valid, learnable id),
    ``label [B] float32``.
    """

    NUM_DENSE = 13
    NUM_SPARSE = 26

    def __init__(self, path: str, batch_size: int = 4096,
                 repeat: bool = False):
        self.path = path
        self.batch_size = batch_size
        self.repeat = repeat

    def __iter__(self) -> Iterator[dict]:
        while True:
            with open(self.path, "r") as f:
                rows = []
                for line in f:
                    rows.append(line.rstrip("\n").split("\t"))
                    if len(rows) == self.batch_size:
                        yield self._make_batch(rows)
                        rows = []
                if rows:
                    yield self._make_batch(rows)
            if not self.repeat:
                return

    def _make_batch(self, rows) -> dict:
        n = len(rows)
        label = np.zeros((n,), np.float32)
        dense = np.zeros((n, self.NUM_DENSE), np.float32)
        cat_tokens = []
        for i, r in enumerate(rows):
            label[i] = float(r[0] or 0)
            for j in range(self.NUM_DENSE):
                v = r[1 + j]
                dense[i, j] = np.log1p(max(float(v), 0.0)) if v else 0.0
            for j in range(self.NUM_SPARSE):
                tok = r[1 + self.NUM_DENSE + j] if len(r) > 14 + j else ""
                cat_tokens.append(f"{j}:{tok or '<missing>'}")
        sparse = hashing.hash_strings(cat_tokens).reshape(
            n, self.NUM_SPARSE
        )
        return {"dense": dense, "sparse": sparse, "label": label}


class MovieLensRatingsReader:
    """MovieLens ratings file -> training batches (the reference demos'
    tfds movielens feed; demo/dynamic_embedding/movielens-1m-keras).

    Auto-detects the two public formats by delimiter:

      * ml-1m/ml-10m ``ratings.dat``: ``UserID::MovieID::Rating::Timestamp``
      * ml-100k ``u.data``: tab-separated ``user item rating timestamp``

    Yields dicts ``{"user" [B] int64, "movie" [B] int64,
    "rating" [B] float32}``; shuffles within a buffer of
    ``shuffle_buffer`` rows (file order is user-sorted, which would make
    sequential batches degenerate).
    """

    def __init__(self, path: str, batch_size: int = 256,
                 repeat: bool = False, shuffle_buffer: int = 100_000,
                 seed: int = 0):
        self.path = path
        self.batch_size = batch_size
        self.repeat = repeat
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed

    def _parse(self, line: str):
        line = line.strip()
        if not line:
            return None
        parts = line.split("::") if "::" in line else line.split()
        if len(parts) < 3:
            return None
        return int(parts[0]), int(parts[1]), float(parts[2])

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed)
        while True:
            buf = []
            with open(self.path, "r") as f:
                for line in f:
                    rec = self._parse(line)
                    if rec is None:
                        continue
                    buf.append(rec)
                    if len(buf) >= self.shuffle_buffer:
                        yield from self._drain(buf, rng)
                        buf = []
            yield from self._drain(buf, rng, final=True)
            if not self.repeat:
                return

    def _drain(self, buf, rng, final: bool = False):
        idx = rng.permutation(len(buf))
        for s in range(0, len(buf), self.batch_size):
            take = idx[s:s + self.batch_size]
            if len(take) < self.batch_size and not final:
                break
            rows = [buf[i] for i in take]
            yield {
                "user": np.asarray([r[0] for r in rows], np.int64),
                "movie": np.asarray([r[1] for r in rows], np.int64),
                "rating": np.asarray([r[2] for r in rows], np.float32),
            }


class Prefetcher:
    """Background batch preparation + optional device placement.

    ``source`` is any iterator of batch dicts (numpy). The worker thread
    stays ``depth`` batches ahead; ``placement`` (e.g. a
    ``lambda b: jax.device_put(b, sharding)``) runs on the worker so the
    training loop only dequeues ready device arrays.
    """

    _DONE = object()

    def __init__(self, source, depth: int = 2,
                 placement: Optional[Callable] = None):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._placement = placement or jax.device_put
        self._err = None
        self._thread = threading.Thread(
            target=self._run, args=(iter(source),), daemon=True
        )
        self._thread.start()

    def _run(self, it):
        try:
            for batch in it:
                self._q.put(self._placement(batch))
        except Exception as e:  # surfaced on next dequeue
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(source, depth: int = 2, placement=None) -> Prefetcher:
    """tf.data-style ``.prefetch()`` over any batch iterator."""
    return Prefetcher(source, depth=depth, placement=placement)
