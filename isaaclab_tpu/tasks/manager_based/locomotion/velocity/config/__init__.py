from . import (  # noqa: F401
    anymal_b,
    anymal_c,
    anymal_d,
    cassie,
    g1,
    h1,
    spot,
    unitree_a1,
    unitree_go1,
    unitree_go2,
)
