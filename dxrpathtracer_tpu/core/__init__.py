from . import constants, math3, cmj, sampling, brdf, quaternion  # noqa: F401
