"""Asset base (reference ``assets/asset_base.py``).

In the reference this handles lazy init via timeline callbacks; here assets are
plain host objects bound to the merged world model at scene-build time, and the
reset/update contract is functional.
"""

from __future__ import annotations

from dataclasses import MISSING

from ..utils.configclass import configclass


@configclass
class AssetBaseCfg:
    """Reference ``AssetBaseCfg``: prim path becomes a logical entity name."""

    prim_path: str = ""
    debug_vis: bool = False


class AssetBase:
    """Common interface: bind to world model, init/reset entity state."""

    cfg: AssetBaseCfg

    def bind(self, world_model, eslice):
        raise NotImplementedError

    def init_entity_state(self, num_envs: int, env_origins):
        raise NotImplementedError
