"""XPBD particle soft bodies (the TPU-native replacement for PhysX FEM soft
bodies used by ``DeformableObject``, reference assets/deformable_object/ +
``physx.SoftBodyView``; SURVEY.md §2.4).

Design: fixed-topology particle lattices with compliant distance constraints
solved by Jacobi-style XPBD iterations — fully batched ``(E, P, 3)`` state,
static constraint lists, no data-dependent shapes, so the whole step jits and
vmaps. Ground contact is a projection with Coulomb friction.

Rigid-soft coupling (round 3): ONE-WAY particle-vs-rigid-collider contact —
particles are projected out of sphere/capsule/box colliders with friction
computed RELATIVE to the collider's motion (a particle resting on or pinched
by a moving collider is carried with it, which is what makes soft-object
grasping work). The rigid side feels no reaction (the reference couples
two-way through PhysX's unified solver; the one-way approximation is
documented and fine for robot >> soft-object mass ratios).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SoftBodyModel(NamedTuple):
    """Static particle-lattice description (host numpy)."""

    rest_pos: np.ndarray  # (P, 3) in body frame
    inv_mass: np.ndarray  # (P,)
    edges: np.ndarray  # (C, 2) particle index pairs
    rest_len: np.ndarray  # (C,)
    compliance: np.ndarray  # (C,) XPBD alpha (m/N); 0 = rigid constraint
    friction: float


class SoftBodyState(NamedTuple):
    pos: jnp.ndarray  # (E, P, 3) world
    vel: jnp.ndarray  # (E, P, 3)
    kinematic_target: jnp.ndarray  # (E, P, 4): xyz target + enable flag
    # (E, nbody_world, 6) reaction wrench [torque, force] the particles
    # exert on rigid bodies (two-way coupling; applied to the rigid solve
    # on the NEXT substep — explicit weak coupling, one-step lag)
    reaction_wrench: jnp.ndarray = None


def make_soft_cube(size=(0.1, 0.1, 0.1), resolution=3, mass=0.1,
                   youngs_modulus=5e4, friction=0.8) -> SoftBodyModel:
    """Cubic particle lattice with structural + diagonal shear edges
    (the mesh-free stand-in for the reference's FEM tet cube)."""
    nx = ny = nz = int(resolution)
    xs = np.linspace(-size[0] / 2, size[0] / 2, nx)
    ys = np.linspace(-size[1] / 2, size[1] / 2, ny)
    zs = np.linspace(-size[2] / 2, size[2] / 2, nz)
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    P = pts.shape[0]
    idx = np.arange(P).reshape(nx, ny, nz)
    edges = set()

    def add(a, b):
        edges.add((min(a, b), max(a, b)))

    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                a = idx[i, j, k]
                for di, dj, dk in (
                    (1, 0, 0), (0, 1, 0), (0, 0, 1),  # structural
                    (1, 1, 0), (1, 0, 1), (0, 1, 1),  # face shear
                    (1, -1, 0), (1, 0, -1), (0, 1, -1),
                    (1, 1, 1), (1, 1, -1), (1, -1, 1), (1, -1, -1),  # volume
                ):
                    ii, jj, kk = i + di, j + dj, k + dk
                    if 0 <= ii < nx and 0 <= jj < ny and 0 <= kk < nz:
                        add(a, idx[ii, jj, kk])
    edges = np.asarray(sorted(edges), dtype=np.int32)
    rest_len = np.linalg.norm(pts[edges[:, 0]] - pts[edges[:, 1]], axis=-1)
    # compliance from Young's modulus: alpha ~ 1 / (E * L) (per-edge spring)
    compliance = 1.0 / (youngs_modulus * np.maximum(rest_len, 1e-6))
    inv_mass = np.full(P, P / mass, dtype=np.float32)
    return SoftBodyModel(
        rest_pos=pts.astype(np.float32),
        inv_mass=inv_mass.astype(np.float32),
        edges=edges,
        rest_len=rest_len.astype(np.float32),
        compliance=compliance.astype(np.float32),
        friction=float(friction),
    )


def init_soft_state(model: SoftBodyModel, num_envs: int, origin,
                    nbody: int = 0) -> SoftBodyState:
    pos = jnp.asarray(model.rest_pos)[None] + jnp.asarray(origin)[None, None]
    pos = jnp.tile(pos, (num_envs, 1, 1))
    return SoftBodyState(
        pos=pos,
        vel=jnp.zeros_like(pos),
        kinematic_target=jnp.concatenate(
            [pos, jnp.zeros(pos.shape[:-1] + (1,))], axis=-1
        ),
        reaction_wrench=jnp.zeros((num_envs, nbody, 6)),
    )


def collide_particles_with_geoms(pred, pos_prev, colliders, friction,
                                 inv_mass=None, dt=None):
    """Project particles out of rigid colliders; friction vs collider motion.

    ``pred``: (E, P, 3) predicted positions; ``pos_prev``: (E, P, 3) start
    positions; ``colliders``: list of (gtype, size, pos_prev, quat_prev,
    pos_now, quat_now[, body_idx, body_pos_w]) with per-env (E, 3)/(E, 4)
    poses. Returns corrected positions, or — when ``inv_mass``/``dt`` are
    given and colliders carry body info — ``(positions, reactions)`` where
    reactions is a list of (body_idx, (E, 6) [torque, force]) wrenches the
    particles exert back on each collider body (two-way coupling: f =
    m * dx / dt^2, the position-level impulse the pushout applied, reversed;
    a resting particle contributes exactly its weight).
    """
    from ..utils import math as mu
    from .model import GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE

    def sdf_normal(gtype, size, local):
        # signed distance (negative inside) + outward normal, geom frame
        if gtype == GEOM_SPHERE:
            r = size[0]
            d = jnp.linalg.norm(local + 1e-9, axis=-1, keepdims=True)
            return d - r, local / d
        if gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
            r, hl = size[0], size[1]
            z = jnp.clip(local[..., 2:3], -hl, hl)
            axis_pt = jnp.concatenate([jnp.zeros_like(z), jnp.zeros_like(z), z], -1)
            delta = local - axis_pt
            d = jnp.linalg.norm(delta + 1e-9, axis=-1, keepdims=True)
            return d - r, delta / d
        if gtype == GEOM_BOX:
            half = jnp.asarray(size[:3])
            q = jnp.abs(local) - half
            outside = jnp.maximum(q, 0.0)
            d_out = jnp.linalg.norm(outside + 1e-9, axis=-1, keepdims=True)
            d_in = jnp.max(q, axis=-1, keepdims=True)
            inside = d_in < 0
            # inside: push along the closest face
            ax = jnp.argmax(q, axis=-1)
            n_in = jax.nn.one_hot(ax, 3) * jnp.sign(local)
            n_out = outside * jnp.sign(local) / d_out
            d = jnp.where(inside, d_in, d_out)
            n = jnp.where(inside, n_in, n_out)
            return d, n
        raise NotImplementedError(f"soft contact vs geom type {gtype}")

    out = pred
    reactions = []
    want_wrench = inv_mass is not None and dt is not None
    for col in colliders:
        gtype, size, g_pos_prev, g_quat_prev, g_pos_now, g_quat_now = col[:6]
        body_idx = col[6] if len(col) > 6 else None
        body_pos_w = col[7] if len(col) > 7 else None
        local = mu.quat_apply_inverse(
            g_quat_now[:, None], out - g_pos_now[:, None]
        )
        d, n_local = sdf_normal(int(gtype), size, local)
        pen = jnp.maximum(-d, 0.0)  # (E, P, 1)
        n_w = mu.quat_apply(g_quat_now[:, None], n_local)
        pushed = out + n_w * pen
        # friction: displacement relative to the rigidly-carried point.
        # carried = where the particle's START position would be now if it
        # were glued to the collider — sticking friction cancels relative
        # tangential motion up to mu * penetration
        prev_local = mu.quat_apply_inverse(
            g_quat_prev[:, None], pos_prev - g_pos_prev[:, None]
        )
        carried = g_pos_now[:, None] + mu.quat_apply(
            g_quat_now[:, None], prev_local
        )
        rel = pushed - carried
        rel_t = rel - n_w * jnp.sum(rel * n_w, axis=-1, keepdims=True)
        t_norm = jnp.linalg.norm(rel_t + 1e-9, axis=-1, keepdims=True)
        stick = jnp.minimum(friction * pen / t_norm, 1.0)
        corrected = pushed - rel_t * stick
        new_out = jnp.where(pen > 0.0, corrected, out)
        if want_wrench and body_idx is not None:
            # particle force = m * dx / dt^2 (position-level pushout as an
            # impulse over the step); reaction on the body is its negative.
            # Kinematic particles (inv_mass 0) carry no finite mass: skip.
            m_p = jnp.where(inv_mass > 0.0, 1.0 / jnp.maximum(inv_mass, 1e-9),
                            0.0)[None, :, None]
            dx = new_out - out  # (E, P, 3)
            f_p = m_p * dx / (dt * dt)
            F = -jnp.sum(f_p, axis=1)  # (E, 3) force on body
            arm = new_out - body_pos_w[:, None]
            tau = -jnp.sum(jnp.cross(arm, f_p), axis=1)
            reactions.append((body_idx, jnp.concatenate([tau, F], axis=-1)))
        out = new_out
    if want_wrench:
        return out, reactions
    return out


def step_soft_body(model: SoftBodyModel, state: SoftBodyState, dt: float,
                   gravity=(-0.0, 0.0, -9.81), iterations: int = 8,
                   relaxation: float = 0.35, colliders=None,
                   nbody: int = 0) -> SoftBodyState:
    """One XPBD substep: predict -> Jacobi constraint projection -> rigid
    collider pushout -> ground contact -> velocity update. All shapes
    static; jit/vmap friendly. ``colliders``: see
    :func:`collide_particles_with_geoms` (None = terrain only). When
    colliders carry body info and ``nbody`` > 0, the returned state's
    ``reaction_wrench`` holds the (E, nbody, 6) wrench the particles exert
    on rigid bodies (consumed by the scene on the next rigid substep)."""
    g = jnp.asarray(gravity)
    inv_m = jnp.asarray(model.inv_mass)[None, :, None]  # (1, P, 1)
    e0 = jnp.asarray(model.edges[:, 0])
    e1 = jnp.asarray(model.edges[:, 1])
    rest = jnp.asarray(model.rest_len)[None, :, None]
    alpha = jnp.asarray(model.compliance)[None, :, None] / (dt * dt)

    kin_on = state.kinematic_target[..., 3:4]
    kin_pos = state.kinematic_target[..., 0:3]
    inv_m_eff = inv_m * (1.0 - kin_on)

    vel = state.vel + dt * g[None, None]
    pred = state.pos + dt * vel
    pred = jnp.where(kin_on > 0.5, kin_pos, pred)

    def solve_iter(p, _):
        d = p[:, e1] - p[:, e0]  # (E, C, 3)
        length = jnp.linalg.norm(d + 1e-9, axis=-1, keepdims=True)
        n = d / length
        w0 = inv_m_eff[:, e0]
        w1 = inv_m_eff[:, e1]
        c = length - rest
        lam = -c / (w0 + w1 + alpha + 1e-12)
        dp0 = -lam * n * w0
        dp1 = lam * n * w1
        # Jacobi scatter-add with under-relaxation (stable under vmap)
        corr = jnp.zeros_like(p)
        corr = corr.at[:, e0].add(dp0)
        corr = corr.at[:, e1].add(dp1)
        return p + relaxation * corr, None

    pred, _ = jax.lax.scan(solve_iter, pred, None, length=iterations)

    E = pred.shape[0]
    wrench = (
        jnp.zeros((E, nbody, 6)) if nbody else state.reaction_wrench
    )
    if colliders:
        res = collide_particles_with_geoms(
            pred, state.pos, colliders, model.friction,
            inv_mass=jnp.asarray(model.inv_mass), dt=dt,
        )
        if isinstance(res, tuple):
            pred, reactions = res
            if nbody:
                for body_idx, w in reactions:
                    wrench = wrench.at[:, body_idx].add(w)
        else:
            pred = res

    # ground plane z=0 with Coulomb friction
    below = pred[..., 2] < 0.0
    # tangential displacement since last step, scaled by friction
    disp = pred - state.pos
    t_disp = disp.at[..., 2].set(0.0)
    pen = jnp.maximum(-pred[..., 2], 0.0)[..., None]
    friction_scale = jnp.minimum(
        model.friction * pen / (jnp.linalg.norm(t_disp + 1e-9, axis=-1,
                                                keepdims=True)), 1.0
    )
    pred = jnp.where(
        below[..., None],
        (pred - t_disp * friction_scale).at[..., 2].set(
            jnp.maximum(pred[..., 2], 0.0)
        ),
        pred,
    )

    new_vel = (pred - state.pos) / dt
    new_vel = jnp.where(kin_on > 0.5, 0.0, new_vel)
    return state._replace(pos=pred, vel=new_vel, reaction_wrench=wrench)
