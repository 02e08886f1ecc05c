from . import asof, banding, dedup, keys, merge, similarity, skew, transforms  # noqa: F401
