"""Manager-based task families (reference isaaclab_tasks/manager_based/)."""
from . import classic, locomotion, manipulation, navigation  # noqa: F401
