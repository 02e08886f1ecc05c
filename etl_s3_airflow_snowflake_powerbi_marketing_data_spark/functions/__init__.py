from . import multimodal, text  # noqa: F401
