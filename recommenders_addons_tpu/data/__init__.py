"""Input pipeline: readers + device prefetching (the reference defers to
tf.data's C++ pipelines; here a thin native-accelerated equivalent)."""

from recommenders_addons_tpu.data.loader import (  # noqa: F401
    CriteoTSVReader,
    MovieLensRatingsReader,
    Prefetcher,
    prefetch,
)
