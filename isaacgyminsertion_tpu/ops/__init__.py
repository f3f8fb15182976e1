from . import rotations, sdf, control  # noqa: F401
