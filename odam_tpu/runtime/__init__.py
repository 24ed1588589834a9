from . import tracker, processor  # noqa: F401
