from recommenders_addons_tpu.nn.layers import (  # noqa: F401
    AllToAllEmbedding,
    BasicEmbedding,
    Embedding,
    FieldWiseEmbedding,
    HvdAllToAllEmbedding,
    LayerNormalization,
    SquashedEmbedding,
)
from recommenders_addons_tpu.nn import mlp  # noqa: F401
