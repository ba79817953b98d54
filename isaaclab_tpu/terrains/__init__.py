"""Terrains (reference ``isaaclab/terrains/``, SURVEY.md §2.7)."""

from .height_field_terrains import (  # noqa: F401
    HfDiscreteObstaclesTerrainCfg,
    HfDiscreteObstaclesWallTerrainCfg,
    HfFlatTerrainCfg,
    HfWallTerrainCfg,
    HfPyramidSlopedTerrainCfg,
    HfPyramidStairsTerrainCfg,
    HfRandomUniformTerrainCfg,
    HfSteppingStonesTerrainCfg,
    HfWaveTerrainCfg,
    SubTerrainCfg,
)
from .terrain_generator import TerrainGenerator, TerrainGeneratorCfg  # noqa: F401
from .terrain_importer import TerrainImporter, TerrainImporterCfg  # noqa: F401
from .mesh_terrains import (  # noqa: F401
    MeshBoxTerrainCfg,
    MeshFloatingRingTerrainCfg,
    MeshGapTerrainCfg,
    MeshPitTerrainCfg,
    MeshPlaneTerrainCfg,
    MeshPyramidStairsTerrainCfg,
    MeshRailsTerrainCfg,
    MeshRandomGridTerrainCfg,
    MeshRepeatedBoxesTerrainCfg,
    MeshRepeatedCylindersTerrainCfg,
    MeshRepeatedObjectsTerrainCfg,
    MeshRepeatedPyramidsTerrainCfg,
    MeshStarTerrainCfg,
)
