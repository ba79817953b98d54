"""Process bootstrap (reference ``app/app_launcher.py:63``).

The reference boots the Omniverse Kit process and resolves torchrun ranks
(app_launcher.py:646-652). The TPU equivalent is a thin bootstrap: CLI arg
injection with the same flag surface, ``jax.distributed`` initialization from
environment variables, device mesh construction — no windowing runtime exists
or is needed (SURVEY.md §2.1 TPU note).
"""

from __future__ import annotations

import argparse
import os


class AppLauncher:
    """Same constructor/arg contract as the reference; ``app`` is a stub
    object so ``simulation_app.close()``-style code keeps working."""

    def __init__(self, launcher_args: argparse.Namespace | dict | None = None,
                 **kwargs):
        if isinstance(launcher_args, argparse.Namespace):
            launcher_args = vars(launcher_args)
        launcher_args = {**(launcher_args or {}), **kwargs}

        self.headless = bool(launcher_args.get("headless", True))
        self.livestream = int(launcher_args.get("livestream", -1))
        self.enable_cameras = bool(launcher_args.get("enable_cameras", False))
        self.device = launcher_args.get("device", "tpu")
        self.distributed = bool(launcher_args.get("distributed", False))

        # rank resolution (reference app_launcher.py:646-652 reads
        # LOCAL_RANK/RANK set by torchrun; jax.distributed uses its own env
        # contract but we honor the same variables when present)
        self.local_rank = int(
            os.environ.get("LOCAL_RANK", os.environ.get("JAX_LOCAL_RANK", 0))
        )
        self.global_rank = int(
            os.environ.get("RANK", os.environ.get("JAX_RANK", 0))
        )

        if self.distributed:
            import jax

            coord = os.environ.get("COORDINATOR_ADDRESS")
            nproc = os.environ.get("WORLD_SIZE")
            if coord and nproc:
                jax.distributed.initialize(
                    coordinator_address=coord,
                    num_processes=int(nproc),
                    process_id=self.global_rank,
                )
            else:
                # TPU pod slices auto-discover via the runtime metadata
                jax.distributed.initialize()

        self.app = _SimulationAppStub()

    @staticmethod
    def add_app_launcher_args(parser: argparse.ArgumentParser) -> None:
        """Reference ``add_app_launcher_args`` (app_launcher.py:180)."""
        group = parser.add_argument_group("app_launcher")
        group.add_argument("--headless", action="store_true", default=True)
        group.add_argument("--livestream", type=int, default=-1)
        group.add_argument("--enable_cameras", action="store_true", default=False)
        group.add_argument("--device", type=str, default="tpu")
        group.add_argument("--distributed", action="store_true", default=False)
        group.add_argument("--kit_args", type=str, default="")
        group.add_argument("--experience", type=str, default="")


class _SimulationAppStub:
    """Minimal stand-in for ``SimulationApp`` (no Kit process on TPU)."""

    def update(self):
        pass

    def close(self):
        pass

    def is_running(self) -> bool:
        return True
