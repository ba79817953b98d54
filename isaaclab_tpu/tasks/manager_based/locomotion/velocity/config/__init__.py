from . import anymal_c, unitree_go2  # noqa: F401
