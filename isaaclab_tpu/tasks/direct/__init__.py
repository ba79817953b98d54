"""Direct-workflow task families (reference isaaclab_tasks/direct/)."""
from . import cartpole, quadcopter  # noqa: F401
