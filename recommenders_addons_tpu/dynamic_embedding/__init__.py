"""Public `dynamic_embedding` API — parity with the reference's
``tfra.dynamic_embedding`` (reference dynamic_embedding/__init__.py:17-52).

Usage::

    from recommenders_addons_tpu import dynamic_embedding as de
"""

from recommenders_addons_tpu.ops.hashing import (  # noqa: F401
    EMPTY_KEY,
    default_partition_fn,
    hash_strings,
)
from recommenders_addons_tpu.ops.hashtable import (  # noqa: F401
    TableSpec,
    TableState,
    unique_static,
)
from recommenders_addons_tpu.ops import hashtable as raw_table  # noqa: F401
from recommenders_addons_tpu.ops.variable import (  # noqa: F401
    EvictStrategy,
    EvictStrategy as HkvEvictStrategy,  # reference name
    GraphKeys,
    LookupContext,
    ModelMode,
    Variable,
    clear_variable_store,
    enable_inference_mode,
    enable_train_mode,
    get_model_mode,
    get_variable,
)
from recommenders_addons_tpu.ops.optimizer import (  # noqa: F401
    SGD,
    Adagrad,
    Adam,
    AdamW,
    DynamicEmbeddingOptimizer,
    FTRL,
    Momentum,
    OptaxSparseOptimizer,
    RMSprop,
    SparseOptimizer,
    apply_gradients,
    create_slots,
)
from recommenders_addons_tpu.ops import initializers  # noqa: F401
from recommenders_addons_tpu.ops import de_math as math  # noqa: F401
from recommenders_addons_tpu.ops import data_flow  # noqa: F401
from recommenders_addons_tpu.ops.sparse import (  # noqa: F401
    RaggedIds,
    RaggedValues,
    SparseIds,
    SparseLookupContext,
    apply_sparse_gradients,
    dense_to_sparse,
    embedding_lookup_ragged,
    embedding_lookup_sparse,
    ragged_fill_empty_rows,
    safe_embedding_lookup_sparse,
    sparse_fill_empty_rows,
    sparse_reshape,
)
from recommenders_addons_tpu.ops import sparse as ragged_embedding_ops  # noqa: F401
from recommenders_addons_tpu.ops.table_api import (  # noqa: F401
    CuckooHashTable,
    CuckooHashTableConfig,
    CuckooHashTableCreator,
    DynamicEmbeddingSaver,
    FileSystemSaver,
    HkvHashTable,
    HkvHashTableConfig,
    HkvHashTableCreator,
    KVCreator,
    RedisTable,
    RedisTableConfig,
    RedisTableCreator,
)
from recommenders_addons_tpu.ops import shadow_ops  # noqa: F401
from recommenders_addons_tpu.ops.shadow_ops import (  # noqa: F401
    DEResourceVariable,
    DistributedVariableWrapper,
    EmbeddingWeights,
    HvdVariable,
    ShadowVariable,
    TrainableWrapper,
    trainable_wrapper_filter,
)
from recommenders_addons_tpu.ops.restrict import (  # noqa: F401
    FrequencyRestrictPolicy,
    RestrictPolicy,
    TimestampRestrictPolicy,
)
from recommenders_addons_tpu.ops.warm_start import (  # noqa: F401
    WarmStartHook,
    warm_start,
)
from recommenders_addons_tpu.ops.spill import (  # noqa: F401
    HostKVStore,
    HybridTable,
    ShardedSpillTier,
    SpillTier,
    make_spill_tier,
)
from recommenders_addons_tpu.ops import serving  # noqa: F401
from recommenders_addons_tpu.ops.serving import (  # noqa: F401
    FrozenTable,
    export_compressed,
    freeze,
    load_compressed,
)
from recommenders_addons_tpu import train  # noqa: F401
from recommenders_addons_tpu import keras  # noqa: F401


def patch_on_tf(*_a, **_k):
    """Parity no-op: the reference monkey-patches TF's optimizer/saver
    machinery at import (tf_patch.py:396-409); a functional design owns its
    state tree and needs no patches."""
    return None


def patch_on_tf_save_restore(*_a, **_k):
    """Parity no-op (reference tf_save_restore_patch.py:562-583)."""
    return None


def embedding_lookup(var, state, ids, **kwargs):
    """Functional parity wrapper (reference dynamic_embedding_ops.py):
    trainable lookup with dedup; returns (emb, ctx)."""
    return var.embedding_lookup(state, ids, **kwargs)


# the TPU path always dedups (reference embedding_lookup_unique,
# dynamic_embedding_ops.py:64-117)
embedding_lookup_unique = embedding_lookup
embedding_lookup_trainable = embedding_lookup  # explicit-name alias
