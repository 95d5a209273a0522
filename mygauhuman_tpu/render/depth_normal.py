"""Depth-map -> world points -> normal map (alternative normal supervision).

Parity: utils/graphics_utils.py:111-172 (depth2point_world, depth_pcd2normal,
normal_from_depth_image) consumed by render_normal
(gaussian_renderer/__init__.py:40-50). The per-Gaussian `_normal` channel is
the active path in the reference; this derived-from-depth normal is the
drop-in alternative supervision.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_world_points(
    depth: jnp.ndarray,       # [H, W]
    intrinsic: jnp.ndarray,   # [3, 3] K
    c2w: jnp.ndarray,         # [4, 4] camera-to-world
) -> jnp.ndarray:
    """Back-project a depth map to world-space points [H, W, 3]."""
    H, W = depth.shape
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    u, v = jnp.meshgrid(xs, ys)
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    cam = jnp.stack([x, y, depth, jnp.ones_like(depth)], axis=-1)
    world = jnp.einsum("ij,hwj->hwi", c2w, cam)
    return world[..., :3]


def points_to_normals(points: jnp.ndarray) -> jnp.ndarray:
    """Central-difference cross-product normals from a point map [H, W, 3].

    Parity: depth_pcd2normal (utils/graphics_utils.py:127-146) — output
    zero-padded at the 1-pixel border.
    """
    dy = points[2:, 1:-1] - points[:-2, 1:-1]
    dx = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))


def normal_from_depth_image(
    depth: jnp.ndarray, intrinsic: jnp.ndarray, c2w: jnp.ndarray
) -> jnp.ndarray:
    """World-space normal map [H, W, 3] from a rendered depth map."""
    return points_to_normals(depth_to_world_points(depth, intrinsic, c2w))
