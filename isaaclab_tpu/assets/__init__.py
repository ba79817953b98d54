"""Scene entities (reference ``isaaclab/assets/``, SURVEY.md §2.4)."""

from .articulation import (  # noqa: F401
    Articulation,
    ArticulationCfg,
    ArticulationData,
    ArticulationEntityState,
    ArticulationInitStateCfg,
)
from .asset_base import AssetBase, AssetBaseCfg  # noqa: F401
from .rigid_object import (  # noqa: F401
    RigidObject,
    RigidObjectCfg,
    RigidObjectData,
    RigidObjectEntityState,
    RigidObjectInitStateCfg,
)
from .rigid_object_collection import (  # noqa: F401
    RigidObjectCollection,
    RigidObjectCollectionCfg,
)
from .deformable_object import (  # noqa: F401
    DeformableObject,
    DeformableObjectCfg,
    DeformableObjectData,
)
