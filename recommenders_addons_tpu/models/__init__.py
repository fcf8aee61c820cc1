from recommenders_addons_tpu.models import dcn, dlrm, movielens  # noqa: F401
