"""HDF5 episode dataset IO (reference ``utils/datasets/``).

``HDF5DatasetFileHandler`` mirrors the reference handler
(utils/datasets/hdf5_dataset_file_handler.py:17); falls back to an
npz-per-episode directory store when h5py is unavailable in the image.
"""

from __future__ import annotations

import json
import os

import numpy as np

try:
    import h5py

    _HAS_H5PY = True
except ImportError:  # pragma: no cover
    _HAS_H5PY = False


class HDF5DatasetFileHandler:
    """Write/read episodes under the robomimic-style ``data/demo_*`` layout."""

    def __init__(self):
        self._file = None
        self._path = None

    def open_or_create(self, path: str):
        self._path = path
        if _HAS_H5PY:
            self._file = h5py.File(path, "a")
            if "data" not in self._file:
                self._file.create_group("data")
        else:
            os.makedirs(path + ".npzstore", exist_ok=True)
        return self

    create = open_or_create
    open = open_or_create

    def write_episode(self, name: str, arrays: dict, success: bool = True):
        if _HAS_H5PY:
            grp = self._file["data"].create_group(name)
            grp.attrs["success"] = success
            grp.attrs["num_samples"] = len(next(iter(arrays.values()), []))
            for key, value in arrays.items():
                grp.create_dataset(key, data=np.asarray(value))
        else:
            np.savez(
                os.path.join(self._path + ".npzstore", f"{name}.npz"),
                __success__=np.asarray(success),
                **arrays,
            )

    def load_episode(self, name: str) -> dict:
        if _HAS_H5PY:
            grp = self._file["data"][name]
            out = {}

            def visit(key, obj):
                if isinstance(obj, h5py.Dataset):
                    out[key] = np.asarray(obj)

            grp.visititems(visit)
            return out
        data = np.load(os.path.join(self._path + ".npzstore", f"{name}.npz"))
        return {k: data[k] for k in data.files if k != "__success__"}

    def get_episode_names(self):
        if _HAS_H5PY:
            return list(self._file["data"].keys())
        store = self._path + ".npzstore"
        return [f[:-4] for f in os.listdir(store) if f.endswith(".npz")]

    @property
    def demo_count(self):
        return len(self.get_episode_names())

    def flush(self):
        if _HAS_H5PY and self._file is not None:
            self._file.flush()

    def close(self):
        if _HAS_H5PY and self._file is not None:
            self._file.close()
            self._file = None
