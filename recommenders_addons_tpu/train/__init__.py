"""`de.train` — checkpoint / saver subsystem (reference python/train/)."""

from recommenders_addons_tpu.train.checkpoint import (  # noqa: F401
    DECheckpoint,
    DE_DIR_NAME,
    latest_checkpoint,
    load_dynamic_embedding,
    load_tier,
    save_dynamic_embedding,
    save_tier,
)
from recommenders_addons_tpu.train.loop import (  # noqa: F401
    LoopConfig,
    LoopReport,
    train_loop,
)
from recommenders_addons_tpu.train.saver import DEHvdSaver  # noqa: F401
