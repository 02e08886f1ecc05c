from . import asof, dedup, keys, merge, similarity, skew, transforms  # noqa: F401
