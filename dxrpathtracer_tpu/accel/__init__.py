from .lbvh import FlatBVH, build_bvh  # noqa: F401
from .traverse import closest_hit, any_hit  # noqa: F401
