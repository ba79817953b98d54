"""Classic control tasks (reference manager_based/classic/)."""
from . import cartpole  # noqa: F401
