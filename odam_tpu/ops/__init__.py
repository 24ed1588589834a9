from . import surface, sampler, sinkhorn, lap  # noqa: F401
