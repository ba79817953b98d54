"""Simulation configuration (reference ``sim/simulation_cfg.py``).

Keeps the reference's knob surface where it is physically meaningful for the
in-repo engine; PhysX GPU-buffer-capacity knobs have no TPU analogue (shapes
are static by construction) and are accepted-but-ignored for config parity.
"""

from __future__ import annotations

from ..physics.solver import SolverCfg
from ..utils.configclass import configclass


@configclass
class RigidBodyMaterialCfg:
    """Default contact material (reference sim/simulation_cfg.py:317)."""

    static_friction: float = 1.0
    dynamic_friction: float = 1.0
    restitution: float = 0.0


@configclass
class PhysxCfg:
    """Solver knobs (reference sim/simulation_cfg.py:37-151). TGS position/
    velocity iterations map onto the projected-Jacobi iteration count."""

    solver_type: int = 1  # 0: PGS, 1: TGS (naming parity; both map to Jacobi)
    min_position_iteration_count: int = 1
    max_position_iteration_count: int = 255
    min_velocity_iteration_count: int = 0
    max_velocity_iteration_count: int = 255
    solver_iteration_count: int = 16
    enable_ccd: bool = False
    enable_stabilization: bool = True
    enable_enhanced_determinism: bool = False
    bounce_threshold_velocity: float = 0.5
    friction_offset_threshold: float = 0.04
    friction_correlation_distance: float = 0.025
    # GPU buffer capacities: accepted for cfg parity, meaningless on TPU
    gpu_max_rigid_contact_count: int = 2**23
    gpu_max_rigid_patch_count: int = 5 * 2**15
    gpu_found_lost_pairs_capacity: int = 2**21
    gpu_heap_capacity: int = 2**26
    gpu_temp_buffer_capacity: int = 2**24


@configclass
class RenderCfg:
    """Rendering knobs (reference sim/simulation_cfg.py RenderCfg). Headless
    TPU build: retained for config parity; no renderer exists."""

    enable_translucency: bool = False
    enable_reflections: bool = False
    antialiasing_mode: str = "off"


@configclass
class SimulationCfg:
    """Reference ``SimulationCfg`` (sim/simulation_cfg.py:256)."""

    dt: float = 1.0 / 60.0
    render_interval: int = 1
    gravity: tuple = (0.0, 0.0, -9.81)
    device: str = "tpu"
    use_fabric: bool = True  # parity only
    physx: PhysxCfg = PhysxCfg()
    render: RenderCfg = RenderCfg()
    physics_material: RigidBodyMaterialCfg = RigidBodyMaterialCfg()
    # engine-specific extras
    baumgarte: float = 0.2
    contact_slop: float = 0.005
    # top-K active-set contact compaction (solver.SolverCfg.active_contacts);
    # 0 keeps every candidate row
    max_active_contacts: int = 0

    def solver_cfg(self) -> SolverCfg:
        import os

        # experiment override: ISAACLAB_TPU_ACTIVE_CONTACTS=<K> (-1 keeps
        # the task cfg value) — lets bench A/B the compaction without edits
        k_env = int(os.environ.get("ISAACLAB_TPU_ACTIVE_CONTACTS", "-1"))
        return SolverCfg(
            iterations=int(self.physx.solver_iteration_count),
            relaxation=1.0,
            baumgarte=float(self.baumgarte),
            contact_slop=float(self.contact_slop),
            restitution_threshold=float(self.physx.bounce_threshold_velocity),
            active_contacts=(
                k_env if k_env >= 0 else int(self.max_active_contacts)
            ),
        )
