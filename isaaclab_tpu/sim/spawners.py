"""Multi-asset random spawn (reference ``sim/spawners/wrappers/``:
``MultiAssetSpawnerCfg`` / ``spawn_multi_asset``).

TPU-native design: per-env USD cloning does not exist — every env shares one
merged world model, so heterogeneous per-env assets become a UNION model
(one body carrying every variant's geoms, tagged by variant id) plus a
static per-env variant choice made at spawn time (the reference also picks
once at spawn, ``wrappers.py:24-120``). The choice materializes as a per-env
contact-candidate activation mask (``BodyParams.cand_active``): candidates
whose geom belongs to a non-chosen variant read as separated, so each env
collides — and visually renders, via the same tag — as exactly one variant.
Mass/inertia follow the chosen variant through the standard per-env
``BodyParams`` arrays.
"""

from __future__ import annotations

import numpy as np

from ..utils.configclass import configclass


@configclass
class MultiAssetCfg:
    """Drop-in for ``RigidObjectCfg.model``: a list of variant model
    sources (RobotModel | callable), one chosen per env at spawn."""

    assets: list = None
    random_choice: bool = True  # False: round-robin env -> variant
    seed: int = 0


def build_union_model(cfg: MultiAssetCfg):
    """(union RobotModel, geom_variant list) — variant v's geoms tagged v;
    body params from variant 0 (per-env overrides applied at init)."""
    import dataclasses

    from ..scene.interactive_scene import _resolve_model

    models = [_resolve_model(a) for a in cfg.assets]
    assert models, "MultiAssetCfg.assets is empty"
    for m in models:
        assert m.nbody == 1, (
            "multi-asset spawn supports single-body rigid objects "
            f"(variant has {m.nbody} bodies)")
    base = models[0]
    geoms = []
    geom_variant = []
    for v, m in enumerate(models):
        for i, g in enumerate(m.geoms):
            # variant tag in the NAME: merge_models re-creates geom objects,
            # so identity maps don't survive — names do
            geoms.append(dataclasses.replace(
                g, body=0, name=f"__mv{v}__{g.name or f'g{i}'}"))
            geom_variant.append(v)
    union = dataclasses.replace(base)
    union.geoms = geoms
    return union, geom_variant, models


def variant_of_geom(geom) -> int | None:
    """Variant index encoded in a union geom's name, or None."""
    n = geom.name or ""
    if not n.startswith("__mv"):
        return None
    return int(n[4:n.index("__", 4)])


def choose_variants(cfg: MultiAssetCfg, num_envs: int) -> np.ndarray:
    """(E,) static spawn-time variant indices."""
    n = len(cfg.assets)
    if cfg.random_choice:
        rng = np.random.RandomState(cfg.seed)
        return rng.randint(0, n, size=num_envs).astype(np.int32)
    return (np.arange(num_envs) % n).astype(np.int32)


def candidate_mask(plan, entity_slices_choices) -> np.ndarray | None:
    """(E, ncon) 0/1 activation, or None when no candidate is variant-gated.

    A candidate is active unless one of its geoms carries a variant tag
    whose variant is NOT the env's chosen one for that geom's entity.
    ``entity_slices_choices``: list of ((body_start, body_count), (E,) choices).
    """
    cand = plan.candidate_geoms()
    if not entity_slices_choices or not cand:
        return None
    E = entity_slices_choices[0][1].shape[0]
    mask = np.ones((E, len(cand)), dtype=np.float32)
    gated = False
    for c, (ga, gb) in enumerate(cand):
        for g in (ga, gb):
            if g is None:
                continue
            v = variant_of_geom(g)
            if v is None:
                continue
            for (b0, bn), choices in entity_slices_choices:
                if b0 <= g.body < b0 + bn:
                    mask[:, c] *= (choices == v).astype(np.float32)
                    gated = True
                    break
    return mask if gated else None


def variant_body_params(models, choices: np.ndarray):
    """Per-env (mass, inertia, com) rows for the union body, from each
    env's chosen variant."""
    mass = np.stack([float(m.mass[0]) for m in models])[choices]
    inertia = np.stack([np.asarray(m.inertia[0]) for m in models])[choices]
    com = np.stack([np.asarray(m.com[0]) for m in models])[choices]
    return mass, inertia, com
