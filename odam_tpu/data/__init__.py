from . import scannet, transforms  # noqa: F401
