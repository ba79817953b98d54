"""Direct-workflow task families (reference isaaclab_tasks/direct/)."""
from . import (  # noqa: F401
    allegro_hand,
    ant,
    anymal_c,
    cart_double_pendulum,
    cartpole,
    factory,
    franka_cabinet,
    humanoid,
    humanoid_amp,
    quadcopter,
    shadow_hand,
    shadow_hand_over,
)
