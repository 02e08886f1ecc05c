from . import dedup, keys, merge, similarity, transforms  # noqa: F401
