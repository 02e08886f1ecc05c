from . import pipeline, sessions  # noqa: F401
