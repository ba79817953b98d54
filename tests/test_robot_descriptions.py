"""Robot description files through the production URDF converter
(reference pattern: presets point at description files —
``isaaclab_assets/robots/*.py`` + SURVEY.md §2.13).

ANYmal-C's preset IS built from its URDF (assets_presets/anymal.py); the
Franka URDF is committed and kept in lock-step with the hand-built model it
will replace (these tests pin the parity)."""

import os

import numpy as np

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "isaaclab_tpu", "assets_presets", "data",
)


def test_anymal_c_urdf_matches_programmatic():
    from isaaclab_tpu.assets_presets.anymal import (
        build_anymal_c_model,
        build_anymal_c_model_programmatic,
    )

    urdf = build_anymal_c_model()
    hand = build_anymal_c_model_programmatic()
    assert list(urdf.jnt_names) == list(hand.jnt_names)
    assert list(urdf.body_names) == list(hand.body_names)
    assert urdf.nu == hand.nu == 12
    # total mass within 2% (51.3 vs 51.8 kg)
    assert abs(np.sum(urdf.mass) - np.sum(hand.mass)) < 0.02 * np.sum(hand.mass)
    np.testing.assert_allclose(
        urdf.dof_limit_lower, hand.dof_limit_lower, atol=1e-6
    )
    np.testing.assert_allclose(
        urdf.dof_limit_upper, hand.dof_limit_upper, atol=1e-6
    )
    assert urdf.floating_base


def test_franka_urdf_matches_preset_model():
    from isaaclab_tpu.assets_presets.franka import build_franka_model
    from isaaclab_tpu.sim.converters import load_urdf

    # merge_fixed=False keeps panda_hand/fingers as named bodies (sensors
    # and factory filters address them)
    urdf = load_urdf(
        os.path.join(DATA, "franka_panda.urdf"), name="franka_panda",
        merge_fixed=False,
    )
    hand = build_franka_model()
    # same articulated joints in the same order
    def arts(m):
        return [j for j in m.jnt_names
                if "panda_joint" in j or "finger_joint" in j]
    assert arts(urdf) == arts(hand)
    assert urdf.nu == hand.nu == 9
    np.testing.assert_allclose(
        urdf.dof_limit_lower, hand.dof_limit_lower, atol=1e-6
    )
    np.testing.assert_allclose(
        urdf.dof_limit_upper, hand.dof_limit_upper, atol=1e-6
    )
    # fingertip pads carry their collision names (factory filters + grasp
    # sensors address geoms by regex)
    names = [g.name for g in urdf.geoms]
    assert any(n and "left_fingertip" in n for n in names)
    assert any(n and "right_fingertip" in n for n in names)


def test_urdf_collision_names_parse():
    from isaaclab_tpu.sim.converters import load_urdf

    urdf_str = """<robot name="t">
      <link name="base">
        <inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial>
        <collision name="pad"><geometry><sphere radius="0.1"/></geometry></collision>
      </link>
    </robot>"""
    m = load_urdf(urdf_str, floating_base=True, name="t")
    assert m.geoms[0].name == "pad"
