"""`de.keras` — layer/callback/model utilities namespace
(reference python/keras/: layers, callbacks, models)."""

from recommenders_addons_tpu.keras import callbacks  # noqa: F401
from recommenders_addons_tpu.keras import layers  # noqa: F401
from recommenders_addons_tpu.keras import models  # noqa: F401
