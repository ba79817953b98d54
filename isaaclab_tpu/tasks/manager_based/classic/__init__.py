"""Classic control tasks (reference manager_based/classic/)."""
from . import ant, cartpole, humanoid  # noqa: F401
