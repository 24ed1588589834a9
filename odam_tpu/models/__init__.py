from . import resnet, position, transformer, detr, associator  # noqa: F401
