from . import scan2cad, detection  # noqa: F401
