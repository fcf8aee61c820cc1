from recommenders_addons_tpu.models import dlrm, movielens  # noqa: F401
