"""Utilities: config, metrics, profiling (reference utils/ + SURVEY.md §5)."""

from recommenders_addons_tpu.utils.config import env_config  # noqa: F401
from recommenders_addons_tpu.utils import metrics  # noqa: F401
from recommenders_addons_tpu.utils import profiling  # noqa: F401
