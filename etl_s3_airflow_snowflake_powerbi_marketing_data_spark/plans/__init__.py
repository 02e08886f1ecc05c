from . import marketing, pipeline, relational  # noqa: F401
