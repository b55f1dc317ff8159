"""ctypes bindings for the native host-IO runtime (native/lvv_io.cpp).

Build once with `make -C native`; every function degrades gracefully to a
numpy fallback when the shared library is absent, so the framework never
hard-depends on the native build (mirrors how the reference ships prebuilt
CUDA .so files but guards imports, spconv_utils.py:1-37).
"""
from __future__ import annotations

import ctypes
import pathlib
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _find_lib() -> Optional[pathlib.Path]:
    here = pathlib.Path(__file__).resolve()
    for base in [here.parent.parent.parent / "native", here.parent]:
        cand = base / "liblvv_io.so"
        if cand.exists():
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        path = _find_lib()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.lvv_load_pcd.restype = ctypes.c_int
        lib.lvv_load_pcd.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.lvv_voxelize_mean.restype = ctypes.c_int
        lib.lvv_f32_to_f16.restype = None
        _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def load_points(path: str, max_points: int, in_dim: int = 5,
                out_dim: int = 4) -> Tuple[np.ndarray, int]:
    """nuScenes .pcd.bin -> ([max_points, out_dim] float32, n_valid)."""
    if out_dim > in_dim:
        raise ValueError(f"out_dim={out_dim} > in_dim={in_dim}")
    lib = get_lib()
    out = np.zeros((max_points, out_dim), np.float32)
    if lib is not None:
        n = lib.lvv_load_pcd(
            str(path).encode(), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)), max_points, in_dim, out_dim)
        if n >= 0:
            return out, int(n)
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, in_dim)[:, :out_dim]
    n = min(len(raw), max_points)
    out[:n] = raw[:n]
    return out, n


def voxelize_mean_host(points: np.ndarray, point_range, voxel_size,
                       max_voxels: int):
    """Host mean-VFE voxelizer -> (feats [V, D], coords [V, 3] zyx,
    counts [V], n_voxels). First-come slot order (insertion order)."""
    lib = get_lib()
    n, dim = points.shape
    feats = np.zeros((max_voxels, dim), np.float32)
    coords = np.full((max_voxels, 3), -1, np.int32)
    counts = np.zeros((max_voxels,), np.int32)
    if lib is not None:
        pr = np.asarray(point_range, np.float32)
        vs = np.asarray(voxel_size, np.float32)
        pts = np.ascontiguousarray(points, np.float32)
        nv = lib.lvv_voxelize_mean(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(n), ctypes.c_int(dim),
            pr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(max_voxels),
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return feats, coords, counts, int(nv)
    # numpy fallback
    pr = np.asarray(point_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    grid = ((pr[3:] - pr[:3]) / vs + 0.5).astype(int)
    ijk = np.floor((points[:, :3] - pr[:3]) / vs).astype(np.int64)
    ok = ((ijk >= 0) & (ijk < grid)).all(axis=1)
    lin = (ijk[:, 2] * grid[1] + ijk[:, 1]) * grid[0] + ijk[:, 0]
    slot_of, nv = {}, 0
    for i in np.nonzero(ok)[0]:
        key = lin[i]
        s = slot_of.get(key)
        if s is None:
            if nv >= max_voxels:
                continue
            s = slot_of[key] = nv
            coords[s] = ijk[i, ::-1]
            nv += 1
        feats[s] += points[i]
        counts[s] += 1
    feats[:nv] /= np.maximum(counts[:nv, None], 1)
    return feats, coords, counts, nv


def f32_to_f16(arr: np.ndarray) -> np.ndarray:
    lib = get_lib()
    flat = np.ascontiguousarray(arr, np.float32).reshape(-1)
    if lib is not None:
        out = np.empty(flat.shape, np.uint16)
        lib.lvv_f32_to_f16(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.c_int64(flat.size))
        return out.view(np.float16).reshape(arr.shape)
    return flat.astype(np.float16).reshape(arr.shape)
