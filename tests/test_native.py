"""Native host-kernel tests (C++ library via ctypes with NumPy fallback;
isaaclab_tpu/native)."""

import numpy as np
import pytest

from isaaclab_tpu import native


class TestNativeKernels:
    def test_library_builds(self):
        lib = native.get_lib()
        assert lib is not None, "g++ build of host kernels failed"

    def test_rasterize_pyramid(self):
        # square pyramid, apex at z=1 over a 2x2 base
        verts = np.array(
            [
                [-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0],  # base
                [0, 0, 1.0],  # apex
            ],
            dtype=np.float32,
        )
        tris = np.array(
            [[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], dtype=np.int32
        )
        hf = native.rasterize_mesh_to_heightfield(
            verts, tris, 40, 40, 0.05, -1.0, -1.0, fill=0.0
        )
        assert hf.shape == (40, 40)
        # apex cell near (20, 20) close to 1.0
        assert hf[19:21, 19:21].max() > 0.9
        # corners are on the base edge -> near zero
        assert hf[0, 0] < 0.1
        # height decreases radially
        assert hf[10, 20] < hf[15, 20] < hf[19, 20] + 1e-6

    def test_native_matches_fallback(self):
        rng = np.random.default_rng(3)
        verts = rng.uniform(-1, 1, size=(12, 3)).astype(np.float32)
        tris = rng.integers(0, 12, size=(8, 3)).astype(np.int32)
        lib = native.get_lib()
        if lib is None:
            pytest.skip("native lib unavailable")
        a = native.rasterize_mesh_to_heightfield(
            verts, tris, 25, 25, 0.08, -1.0, -1.0, fill=-2.0
        )
        # force fallback
        saved, native._lib = native._lib, None
        saved_t, native._tried = native._tried, True
        try:
            b = native.rasterize_mesh_to_heightfield(
                verts, tris, 25, 25, 0.08, -1.0, -1.0, fill=-2.0
            )
        finally:
            native._lib, native._tried = saved, saved_t
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_slope_limit(self):
        hf = np.zeros((10, 10), dtype=np.float32)
        hf[5, 5] = 1.0
        out = native.hf_limit_slope(hf.copy(), max_step=0.2, iterations=1)
        assert out[5, 5] <= 0.2 + 1e-6

    def test_mesh_terrain_importer(self, tmp_path):
        # write a tiny OBJ ramp and import it as terrain
        obj = tmp_path / "ramp.obj"
        obj.write_text(
            "v 0 0 0\nv 4 0 2\nv 4 4 2\nv 0 4 0\n"
            "f 1 2 3\nf 1 3 4\n"
        )
        from isaaclab_tpu.terrains import TerrainImporter, TerrainImporterCfg

        imp = TerrainImporter(
            TerrainImporterCfg(
                terrain_type="mesh", mesh_path=str(obj), mesh_resolution=0.25
            ),
            num_envs=4,
        )
        hf = np.asarray(imp.height_field.heights)
        # ramp rises along +x from 0 to 2
        assert hf[1, hf.shape[1] // 2] < 0.5
        assert hf[-1, hf.shape[1] // 2] > 1.2
