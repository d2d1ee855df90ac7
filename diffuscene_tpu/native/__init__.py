"""Native (C++) batch encoder: build-on-demand ctypes binding.

The shared object is compiled once per machine with g++ -O3 into the package
directory (falling back to a temp dir) and loaded via ctypes — no pybind11
needed.  `NativeBatchEncoder` produces the same packed (B, N, point_dim)
diffusion targets as the numpy pipeline (data/encoding.py); equivalence is
enforced by tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batcher.cpp")
_ABI_VERSION = 1

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _so_path() -> str:
    return os.path.join(_HERE, f"libdiffuscene_batcher_v{_ABI_VERSION}.so")


def _build() -> str:
    so = _so_path()
    if os.path.isfile(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    target_dir = _HERE if os.access(_HERE, os.W_OK) else tempfile.gettempdir()
    so = os.path.join(target_dir, os.path.basename(_so_path()))
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", so]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load the native library; None on failure."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        lib = ctypes.CDLL(_build())
        assert lib.diffuscene_native_abi_version() == _ABI_VERSION
        lib.encode_diffusion_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # translations
            ctypes.POINTER(ctypes.c_float),  # sizes
            ctypes.POINTER(ctypes.c_float),  # angles
            ctypes.POINTER(ctypes.c_float),  # class_labels
            ctypes.POINTER(ctypes.c_float),  # objfeats
            ctypes.POINTER(ctypes.c_int),    # lengths
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),  # bounds
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),  # out
            ctypes.c_int,
        ]
        lib.encode_diffusion_batch.restype = None
        _lib = lib
        return _lib
    except (subprocess.CalledProcessError, OSError, AssertionError) as e:
        _build_error = str(e)
        return None


def native_available() -> bool:
    return load_library() is not None


class NativeBatchEncoder:
    """Fused batch encoding of raw cached scenes on the C++ path.

    Same semantics as EncodingPipeline for the `cached_diffusion_cosin_angle_
    objfeatsnorm_lat32` family (scale + cos/sin + objfeatsnorm + permutation
    + fixed-rotation augmentation + diffusion padding/packing), executed as
    one multithreaded native pass per batch.
    """

    ROTATION_MODES = {None: 0, "none": 0, "fixed_rotations": 1, "rotations": 2}

    def __init__(self, bounds, max_length: int, n_classes: int,
                 objfeat_dim: int = 32, permute: bool = True,
                 rotation: Optional[str] = "fixed_rotations",
                 seed: int = 0, n_threads: Optional[int] = None):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError(f"native batcher unavailable: {_build_error}")
        self.max_length = max_length
        self.n_classes = n_classes
        self.objfeat_dim = objfeat_dim
        self.permute = permute
        self.rotation_mode = self.ROTATION_MODES[rotation]
        self.seed = seed
        self.n_threads = n_threads or (os.cpu_count() or 4)
        t_lo, t_hi = bounds.translations
        s_lo, s_hi = bounds.sizes
        a_lo, a_hi = bounds.angles
        f = bounds.objfeats_32 if objfeat_dim == 32 else bounds.objfeats
        self._bounds = np.concatenate([
            np.asarray(t_lo, np.float32).reshape(3),
            np.asarray(t_hi, np.float32).reshape(3),
            np.asarray(s_lo, np.float32).reshape(3),
            np.asarray(s_hi, np.float32).reshape(3),
            np.asarray([a_lo, a_hi], np.float32).reshape(2),
            np.asarray([f[1], f[2]], np.float32).reshape(2),
        ]).astype(np.float32)

    @property
    def point_dim(self) -> int:
        return 3 + 3 + 2 + (self.n_classes - 1) + self.objfeat_dim

    def __call__(self, raw_samples, seed: Optional[int] = None) -> np.ndarray:
        """raw_samples: list of dicts with unpadded (n_i, ...) arrays.
        Returns the packed (B, max_length, point_dim) float32 target."""
        B = len(raw_samples)
        max_in = max(len(s["translations"]) for s in raw_samples)
        f32 = lambda shape: np.zeros(shape, np.float32)
        trans = f32((B, max_in, 3))
        sizes = f32((B, max_in, 3))
        angles = f32((B, max_in))
        classes = f32((B, max_in, self.n_classes))
        feats = f32((B, max_in, max(self.objfeat_dim, 1)))
        lengths = np.zeros(B, np.int32)
        feat_key = "objfeats_32" if self.objfeat_dim == 32 else "objfeats"
        for i, s in enumerate(raw_samples):
            n = len(s["translations"])
            lengths[i] = n
            trans[i, :n] = s["translations"]
            sizes[i, :n] = s["sizes"]
            angles[i, :n] = np.asarray(s["angles"]).reshape(n)
            classes[i, :n] = s["class_labels"]
            if self.objfeat_dim > 0:
                feats[i, :n] = s[feat_key]

        out = np.empty((B, self.max_length, self.point_dim), np.float32)
        p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self.lib.encode_diffusion_batch(
            p(trans), p(sizes), p(angles), p(classes), p(feats),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            B, max_in, self.n_classes, self.objfeat_dim,
            p(self._bounds), self.max_length,
            ctypes.c_uint64(self.seed if seed is None else seed),
            int(self.permute), self.rotation_mode, p(out), self.n_threads,
        )
        return out
