from . import superquadric, optimizer, quadric, constraints, merge, prior  # noqa: F401
