from recommenders_addons_tpu.ops import hashing, hashtable  # noqa: F401
