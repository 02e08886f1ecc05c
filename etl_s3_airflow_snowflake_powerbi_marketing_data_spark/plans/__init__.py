from . import marketing, relational  # noqa: F401
