from . import asof, dedup, keys, merge, similarity, transforms  # noqa: F401
