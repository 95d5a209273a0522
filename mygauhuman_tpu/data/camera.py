"""Camera as a static-shape JAX pytree + projection-matrix builders.

Parity targets: reference scene/cameras.py:17-82 (Camera module),
utils/graphics_utils.py:31-108 (getWorld2View2 / getProjectionMatrix /
getProjectionMatrix_refine / fov<->focal).

Convention: all 4x4 matrices here act on COLUMN vectors (x_cam = w2c @ x_h),
i.e. the plain math form — the reference stores row-vector transposes for
torch.bmm; values are equivalent.
"""
from __future__ import annotations

import math
from typing import Any

import flax.struct
import numpy as np

Array = Any


@flax.struct.dataclass
class Camera:
    """Per-view data as a jit-friendly pytree: matrices/fovs are traced
    leaves (no retrace per camera), width/height are static aux data (they
    select the rasterizer's compiled grid)."""

    w2c: Array          # [4,4] world -> camera
    full_proj: Array    # [4,4] proj @ w2c
    cam_center: Array   # [3]
    tan_fovx: Array
    tan_fovy: Array
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)


def world2view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Dataset convention (R = c2w rotation block, t = w2c translation).

    Parity: getWorld2View2 with zero translate / unit scale.
    """
    w2c = np.zeros((4, 4), dtype=np.float64)
    w2c[:3, :3] = R.T
    w2c[:3, 3] = t.reshape(3)
    w2c[3, 3] = 1.0
    return w2c.astype(np.float32)


def projection_from_fov(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Symmetric-frustum projection. Parity: getProjectionMatrix."""
    tx = math.tan(fovx / 2)
    ty = math.tan(fovy / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tx
    P[1, 1] = 1.0 / ty
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -2.0 * zfar * znear / (zfar - znear)
    P[3, 2] = 1.0
    return P


def projection_from_K(
    K: np.ndarray, H: int, W: int, znear: float = 0.001, zfar: float = 1000.0
) -> np.ndarray:
    """Intrinsics-matrix projection. Parity: getProjectionMatrix_refine."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2 * fx / W
    P[0, 1] = 2 * s / W
    P[0, 2] = -1 + 2 * (cx / W)
    P[1, 1] = 2 * fy / H
    P[1, 2] = -1 + 2 * (cy / H)
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[2, 3] = -2 * zfar * znear / (zfar - znear)
    P[3, 2] = 1.0
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    width: int,
    height: int,
    K: np.ndarray | None = None,
    fovx: float | None = None,
    fovy: float | None = None,
    znear: float = 0.001,
    zfar: float = 1000.0,
) -> Camera:
    """Build a Camera from dataset extrinsics + either K or fovs."""
    w2c = world2view(R, t)
    if K is not None:
        P = projection_from_K(np.asarray(K, dtype=np.float64), height, width, znear, zfar)
        fovx = focal2fov(float(K[0, 0]), width)
        fovy = focal2fov(float(K[1, 1]), height)
    else:
        assert fovx is not None and fovy is not None
        P = projection_from_fov(znear, zfar, fovx, fovy)
    full_proj = (P.astype(np.float64) @ w2c.astype(np.float64)).astype(np.float32)
    c2w = np.linalg.inv(w2c.astype(np.float64))
    return Camera(
        w2c=w2c,
        full_proj=full_proj,
        cam_center=c2w[:3, 3].astype(np.float32),
        tan_fovx=math.tan(fovx / 2),
        tan_fovy=math.tan(fovy / 2),
        width=int(width),
        height=int(height),
    )
