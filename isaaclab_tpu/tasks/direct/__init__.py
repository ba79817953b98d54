"""Direct-workflow task families (reference isaaclab_tasks/direct/)."""
from . import cartpole, quadcopter, shadow_hand  # noqa: F401
