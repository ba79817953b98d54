"""Tests for configclass, string resolution, buffers, noise, modifiers."""

from dataclasses import MISSING

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaaclab_tpu.utils import modifiers, noise, string
from isaaclab_tpu.utils.buffers import CircularBuffer, DelayBuffer
from isaaclab_tpu.utils.configclass import configclass


class TestConfigclass:
    def test_basic_and_nested(self):
        @configclass
        class Inner:
            a: int = 1
            items: list = [1, 2]

        @configclass
        class Outer:
            inner: Inner = Inner()
            name: str = "x"

        o1, o2 = Outer(), Outer()
        o1.inner.items.append(3)
        assert o2.inner.items == [1, 2]  # no shared mutable defaults
        d = o1.to_dict()
        assert d["inner"]["items"] == [1, 2, 3]
        o3 = Outer().from_dict({"inner": {"a": 7}})
        assert o3.inner.a == 7
        o4 = o3.replace(name="y")
        assert o4.name == "y" and o3.name == "x"

    def test_validate_missing(self):
        @configclass
        class C:
            x: int = MISSING

        with pytest.raises(TypeError):
            C().validate()


class TestStringResolution:
    NAMES = ["LF_HAA", "LF_HFE", "LF_KFE", "RF_HAA", "RF_HFE", "RF_KFE"]

    def test_resolve(self):
        idx, names = string.resolve_matching_names(".*_HAA", self.NAMES)
        assert idx == [0, 3]
        idx, names = string.resolve_matching_names([".*_KFE", ".*_HAA"], self.NAMES)
        assert idx == [0, 2, 3, 5]
        idx, _ = string.resolve_matching_names(
            [".*_KFE", ".*_HAA"], self.NAMES, preserve_order=True
        )
        assert idx == [2, 5, 0, 3]
        with pytest.raises(ValueError):
            string.resolve_matching_names("nonexistent", self.NAMES)

    def test_resolve_values(self):
        idx, names, vals = string.resolve_matching_names_values(
            {".*_HAA": 1.0, ".*_HFE": 2.0}, self.NAMES
        )
        assert idx == [0, 1, 3, 4]
        assert vals == [1.0, 2.0, 1.0, 2.0]

    def test_case_conversion(self):
        assert string.to_snake_case("CamelCaseTest") == "camel_case_test"
        assert string.to_camel_case("snake_case_test", "CC") == "SnakeCaseTest"


class TestBuffers:
    def test_circular(self):
        buf = CircularBuffer.create(3, 2, (2,))
        v1 = jnp.ones((2, 2)) * 1
        buf = buf.append(v1)
        # backfill: whole history equals v1
        np.testing.assert_allclose(buf.history(), jnp.tile(v1, (3, 1, 1)))
        buf = buf.append(v1 * 2)
        buf = buf.append(v1 * 3)
        hist = buf.history()
        np.testing.assert_allclose(hist[-1], v1 * 3)
        np.testing.assert_allclose(hist[0], v1 * 1)
        buf = buf.append(v1 * 4)
        np.testing.assert_allclose(buf.history()[0], v1 * 2)

    def test_circular_reset_mask(self):
        buf = CircularBuffer.create(2, 2, ())
        buf = buf.append(jnp.array([1.0, 10.0]))
        buf = buf.append(jnp.array([2.0, 20.0]))
        buf = buf.reset(jnp.array([True, False]))
        buf = buf.append(jnp.array([5.0, 30.0]))
        hist = buf.history()
        np.testing.assert_allclose(hist[:, 0], [5.0, 5.0])  # backfilled
        np.testing.assert_allclose(hist[:, 1], [20.0, 30.0])

    def test_delay(self):
        buf = DelayBuffer.create(2, 2, ())
        buf = buf.set_time_lag(jnp.array([0, 2]))
        outs = []
        for v in [1.0, 2.0, 3.0, 4.0]:
            buf, out = buf.compute(jnp.array([v, v]))
            outs.append(out)
        np.testing.assert_allclose(outs[-1], jnp.array([4.0, 2.0]))


class TestNoise:
    def test_noise_cfgs(self):
        key = jax.random.PRNGKey(0)
        data = jnp.zeros((4, 3))
        out = noise.GaussianNoiseCfg(mean=5.0, std=0.0).func(key, data)
        np.testing.assert_allclose(out, 5.0)
        out = noise.UniformNoiseCfg(n_min=1.0, n_max=1.0, operation="scale").func(
            key, jnp.ones((4, 3)) * 2
        )
        np.testing.assert_allclose(out, 2.0)
        out = noise.ConstantNoiseCfg(bias=3.0, operation="abs").func(key, data)
        np.testing.assert_allclose(out, 3.0)

    def test_additive_bias_model(self):
        cfg = noise.NoiseModelWithAdditiveBiasCfg(
            noise_cfg=noise.ConstantNoiseCfg(bias=0.0),
            bias_noise_cfg=noise.ConstantNoiseCfg(bias=2.0, operation="abs"),
        )
        state = cfg.init_state(3, 4)
        key = jax.random.PRNGKey(0)
        state = cfg.reset(state, key, jnp.array([True, False, True]))
        out = cfg.apply(state, key, jnp.zeros((3, 4)))
        np.testing.assert_allclose(out[0], 2.0)
        np.testing.assert_allclose(out[1], 0.0)


class TestModifiers:
    def test_stateless(self):
        data = jnp.array([-2.0, 0.5, 3.0])
        np.testing.assert_allclose(modifiers.clip(data, (-1.0, 1.0)), [-1, 0.5, 1])
        np.testing.assert_allclose(modifiers.bias(data, 1.0), data + 1)
        np.testing.assert_allclose(modifiers.scale(data, 2.0), data * 2)

    def test_integrator(self):
        cfg = modifiers.IntegratorCfg(dt=0.1)
        state = cfg.init_state((2,))
        x = jnp.ones((2,))
        for _ in range(10):
            state, out = cfg.apply(state, x)
        # trapezoid of constant 1 over 10 steps: first step 0.05, then 0.1 each
        np.testing.assert_allclose(out, 0.95, atol=1e-6)

    def test_digital_filter_dc_gain(self):
        # Simple first-order low-pass: y[n] = 0.5 x[n] + 0.5 y[n-1]
        cfg = modifiers.DigitalFilterCfg(A=[-0.5], B=[0.5])
        state = cfg.init_state((1,))
        x = jnp.ones((1,))
        for _ in range(50):
            state, y = cfg.apply(state, x)
        np.testing.assert_allclose(y, 1.0, atol=1e-3)  # unity DC gain


class TestMeshTerrains:
    """Trimesh terrain family rasterized to height fields (reference
    trimesh/mesh_terrains.py:23-721)."""

    def test_all_mesh_terrains_generate(self):
        import numpy as np

        from isaaclab_tpu import terrains as T

        cfgs = [
            T.MeshPlaneTerrainCfg(),
            T.MeshPyramidStairsTerrainCfg(),
            T.MeshPyramidStairsTerrainCfg(inverted=True),
            T.MeshRandomGridTerrainCfg(),
            T.MeshRailsTerrainCfg(),
            T.MeshPitTerrainCfg(),
            T.MeshPitTerrainCfg(double_pit=True),
            T.MeshBoxTerrainCfg(),
            T.MeshGapTerrainCfg(),
            T.MeshFloatingRingTerrainCfg(),
            T.MeshStarTerrainCfg(),
            T.MeshRepeatedPyramidsTerrainCfg(),
            T.MeshRepeatedBoxesTerrainCfg(),
            T.MeshRepeatedCylindersTerrainCfg(),
        ]
        for cfg in cfgs:
            h = cfg.function(0.7, cfg, np.random.default_rng(1))
            if isinstance(h, tuple):  # overhang terrains: (heights, slab)
                h, slab = h
                assert slab.shape == (80, 80, 2), type(cfg).__name__
            assert h.shape == (80, 80), type(cfg).__name__
            assert np.all(np.isfinite(h)), type(cfg).__name__

    def test_terrain_generator_accepts_mesh_terrains(self):
        from isaaclab_tpu import terrains as T

        gen_cfg = T.TerrainGeneratorCfg(
            size=(8.0, 8.0), num_rows=2, num_cols=2,
            horizontal_scale=0.1, vertical_scale=0.005,
            sub_terrains={
                "gap": T.MeshGapTerrainCfg(proportion=0.5),
                "star": T.MeshStarTerrainCfg(proportion=0.5),
            },
        )
        gen = T.TerrainGenerator(gen_cfg)
        import numpy as np
        assert gen.heights.shape == (160, 160)
        assert np.all(np.isfinite(gen.heights))


def test_pretrained_checkpoint_conventions(tmp_path, monkeypatch):
    """Reference utils/pretrained_checkpoint.py:25-122 discovery semantics:
    newest run dir -> newest checkpoint -> publish -> resolve."""
    from isaaclab_tpu.utils import pretrained_checkpoint as pc

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("ISAACLAB_TPU_CKPT_ROOT", str(tmp_path / "store"))
    task = "Isaac-Cartpole-v0"
    assert pc.get_pretrained_checkpoint_path("rsl_rl", task) is None
    assert not pc.has_pretrained_checkpoint_job_run("rsl_rl", task)
    run = tmp_path / "logs" / "rsl_rl" / task / "run1"
    run.mkdir(parents=True)
    (run / "model_5.msgpack").write_text("old")
    (run / "model_10.msgpack").write_text("new")
    import os
    os.utime(run / "model_5.msgpack", (0, 0))
    found = pc.get_pretrained_checkpoint_path("rsl_rl", task)
    assert found.endswith("model_10.msgpack")
    assert pc.has_pretrained_checkpoint_job_finished("rsl_rl", task)
    dst = pc.publish_pretrained_checkpoint("rsl_rl", task)
    assert pc.get_published_pretrained_checkpoint("rsl_rl", task) == dst
    assert pc.WORKFLOW_TRAINER["skrl"].endswith("skrl/train.py")
