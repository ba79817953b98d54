"""Scene entity resolution (reference ``managers/scene_entity_cfg.py``).

Regex joint/body names resolve to static index arrays at env-build time
(scene_entity_cfg.py:112-254); the resolved indices become gather constants
inside the jitted step.
"""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass


@configclass
class SceneEntityCfg:
    """Reference ``SceneEntityCfg``."""

    name: str = MISSING
    joint_names: object = None  # str | list[str] regex
    joint_ids: object = slice(None)
    body_names: object = None
    body_ids: object = slice(None)
    fixed_tendon_names: object = None
    fixed_tendon_ids: object = slice(None)
    preserve_order: bool = False

    def resolve(self, scene):
        """Resolve regex names to index arrays against the scene entity."""
        entity = scene[self.name]
        if self.joint_names is not None and isinstance(self.joint_ids, slice):
            ids, names = entity.find_joints(self.joint_names, self.preserve_order)
            self.joint_ids = np.asarray(ids, dtype=np.int32)
            self.joint_names = names
        if self.body_names is not None and isinstance(self.body_ids, slice):
            ids, names = entity.find_bodies(self.body_names, self.preserve_order)
            self.body_ids = np.asarray(ids, dtype=np.int32)
            self.body_names = names
        if self.fixed_tendon_names is not None and isinstance(
            self.fixed_tendon_ids, slice
        ):
            ids, names = entity.find_fixed_tendons(
                self.fixed_tendon_names, self.preserve_order
            )
            self.fixed_tendon_ids = np.asarray(ids, dtype=np.int32)
            self.fixed_tendon_names = names
        return self
