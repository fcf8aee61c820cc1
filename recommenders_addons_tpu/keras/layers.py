"""`de.keras.layers` parity surface (reference python/keras/layers/__init__.py:1-7).

The layer implementations live in recommenders_addons_tpu.nn; this module
re-exports them under the reference's import path."""

from recommenders_addons_tpu.nn.layers import (  # noqa: F401
    AllToAllEmbedding,
    BasicEmbedding,
    Embedding,
    FieldWiseEmbedding,
    HvdAllToAllEmbedding,
    LayerNormalization,
    SquashedEmbedding,
)
