"""Gaussian scene model: fixed-capacity pytree + functional densify/prune.

TPU-native re-design of the reference `scene/gaussian_model.py` (GaussianModel,
:55-766). The reference mutates ragged torch Parameters and surgically edits
optimizer state on every densify event; under XLA that would force a re-trace
per event. Here the scene is a *fixed-capacity* pytree with an `alive` mask:

  * densify_and_clone / densify_and_split / KL variants / merge / prune are
    pure jittable functions `state -> state` — new Gaussians are scattered
    into free (dead) slots located by prefix-sum ranking, never concatenated.
  * capacity growth (rare) happens outside jit by padding every leaf; the
    per-capacity jit cache stays tiny because capacities are powers of two.
  * optimizer-state surgery (reference `_prune_optimizer`/
    `cat_tensors_to_optimizer`, :424-485) becomes `reset_adam_slots`: zero the
    Adam moments at rewritten slots.

Parity notes (reference file:line):
  * activations exp/sigmoid/normalize        — gaussian_model.py:44-52
  * create_from_pcd init values              — gaussian_model.py:215-248
    (opacity 0.1, scales log-sqrt mean-3NN dist, identity quats, albedo=1
    logit -> sigmoid(1), roughness=1 logit)
  * get_roughness reads `_albedo` in the reference (:197-199) — a bug we do
    NOT replicate; we read roughness.
  * densify selection rules                  — gaussian_model.py:517-564
  * KL-guided variants + closed-form kl_div  — gaussian_model.py:570-762
  * prune rules incl. SMPL prior             — gaussian_model.py:710-736
  * opacity reset to <=0.01                  — gaussian_model.py:348-351
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.ops.knn import knn, mean_knn_dist2
from mygauhuman_tpu.ops.sh import num_sh_coeffs, rgb2sh
from mygauhuman_tpu.utils.transforms import (
    covariance6_from_scaling_rotation,
    inverse_sigmoid,
    normalize,
    quat_to_rotmat,
    quat_to_rotmat_cols,
)


class GaussianParams(NamedTuple):
    """Trainable per-Gaussian parameters (raw, pre-activation). [cap, ...]"""

    xyz: jnp.ndarray            # [cap, 3] canonical big-pose positions
    features_dc: jnp.ndarray    # [cap, 1, 3] SH DC
    features_rest: jnp.ndarray  # [cap, (deg+1)^2-1, 3] SH rest
    scaling: jnp.ndarray        # [cap, 3] log-scale
    rotation: jnp.ndarray       # [cap, 4] unnormalized quaternion (w,x,y,z)
    opacity: jnp.ndarray        # [cap, 1] logit
    normal: jnp.ndarray         # [cap, 3] canonical normals
    albedo: jnp.ndarray         # [cap, 3] logit
    roughness: jnp.ndarray      # [cap, 1] logit


class GaussianState(NamedTuple):
    """Full scene state: params + alive mask + densification statistics."""

    params: GaussianParams
    alive: jnp.ndarray            # [cap] bool
    smpl_normal: jnp.ndarray      # [cap, 3] frozen SMPL mesh normals
    xyz_grad_accum: jnp.ndarray   # [cap] accumulated ||dL/dmean2D|| (NDC units)
    denom: jnp.ndarray            # [cap] accumulation counts
    max_radii2d: jnp.ndarray      # [cap] float32 max screen radius seen

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)


# ----------------------------------------------------------------------------
# Activations (reference gaussian_model.py:44-52,152-209)
# ----------------------------------------------------------------------------

def get_scaling(p: GaussianParams) -> jnp.ndarray:
    # clipped exp: the reference's bare exp (gaussian_model.py:44) overflows
    # to inf covariance if the log-scale drifts high; [-15, 8] spans 3e-7 m
    # to 3 km — far beyond any human scene, so the clamp is inert in normal
    # training and purely an anti-NaN guard
    return jnp.exp(jnp.clip(p.scaling, -15.0, 8.0))


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    return normalize(p.rotation)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_albedo(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.albedo)


def get_roughness(p: GaussianParams) -> jnp.ndarray:
    # Reference bug not replicated: its get_roughness reads _albedo (:197-199).
    return jax.nn.sigmoid(p.roughness)


def get_features(p: GaussianParams) -> jnp.ndarray:
    """[cap, (deg+1)^2, 3] concatenated SH features."""
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def get_covariance6(
    p: GaussianParams,
    scaling_modifier: float = 1.0,
    transforms: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Symmetric 6-vector world covariance, optionally LBS-conjugated.

    Parity: build_covariance_from_scaling_rotation (gaussian_model.py:35-42)
    — L = R S, Sigma = L L^T, then T Sigma T^T for per-Gaussian LBS 3x3 T.
    """
    return covariance6_from_scaling_rotation(
        get_scaling(p), p.rotation, scaling_modifier, transforms
    )


def get_minimum_axis(p: GaussianParams) -> jnp.ndarray:
    """Unit axis of the smallest scale — the splat's pseudo-normal.

    Parity: utils/general_utils.py:144-150 (R column of argmin scale).
    """
    scales = get_scaling(p)
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = quat_to_rotmat_cols(
        p.rotation
    )                                              # R columns = local axes
    idx = jnp.argmin(scales, axis=-1)              # [cap]
    # componentwise column select (no [cap,3,3] materialization / gather)
    pick0 = idx == 0
    pick1 = idx == 1

    def col(c0, c1, c2):
        return jnp.where(pick0, c0, jnp.where(pick1, c1, c2))

    return jnp.stack(
        [col(r00, r01, r02), col(r10, r11, r12), col(r20, r21, r22)],
        axis=-1,
    )


def flip_align_view(normal: jnp.ndarray, viewdir: jnp.ndarray):
    """Flip normals to face the viewer; returns (flipped, positive_mask).

    Parity: utils/general_utils.py:152-157 (dot(n, -viewdir) >= 0 keeps n).
    """
    dot = jnp.sum(normal * (-viewdir), axis=-1, keepdims=True)
    positive = dot >= 0.0
    return jnp.where(positive, normal, -normal), positive


# ----------------------------------------------------------------------------
# Construction
# ----------------------------------------------------------------------------

def _round_capacity(n: int) -> int:
    cap = 1024
    while cap < n:
        cap *= 2
    return cap


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    normals: np.ndarray,
    sh_degree: int = 3,
    capacity: int | None = None,
) -> GaussianState:
    """Init the scene from a point cloud (SMPL big-pose vertices).

    Parity: gaussian_model.py:215-248 — colors to SH DC, scales from
    log sqrt(mean 3-NN squared distance), identity quats, opacity 0.1,
    albedo/roughness raw value 1.0 (activated by sigmoid).
    """
    n = points.shape[0]
    cap = capacity or _round_capacity(n)
    return _create_from_pcd_jit(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(normals, jnp.float32),
        int(sh_degree), int(cap),
    )


@functools.partial(jax.jit, static_argnums=(3, 4))
def _create_from_pcd_jit(points, colors, normals, sh_degree: int, cap: int):
    """One program for the whole init (eager op-by-op paid a tiny-program
    compile + tunnel round trip per op on remote backends, ~17 s/process)."""
    n = points.shape[0]
    rest = num_sh_coeffs(sh_degree) - 1

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_knn_dist2(pts, k=3), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (cap - n,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    fdc = rgb2sh(jnp.asarray(colors, jnp.float32))[:, None, :]
    quats = jnp.concatenate(
        [jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 3), jnp.float32)], axis=1
    )
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    nrm = jnp.asarray(normals, jnp.float32)

    params = GaussianParams(
        xyz=pad(pts),
        features_dc=pad(fdc),
        features_rest=pad(jnp.zeros((n, rest, 3), jnp.float32)),
        scaling=pad(scales, fill=-10.0),
        rotation=pad(quats, fill=0.0).at[n:, 0].set(1.0),
        opacity=pad(opac, fill=-10.0),
        normal=pad(nrm),
        albedo=pad(jnp.ones((n, 3), jnp.float32)),
        roughness=pad(jnp.ones((n, 1), jnp.float32)),
    )
    alive = jnp.arange(cap) < n
    # distinct zero buffers: leaves must not alias one array, or donating
    # the state to the jitted train step (donate_argnums) is rejected
    def zeros():
        return jnp.zeros((cap,), jnp.float32)

    return GaussianState(
        params=params,
        alive=alive,
        smpl_normal=pad(nrm),
        xyz_grad_accum=zeros(),
        denom=zeros(),
        max_radii2d=zeros(),
    )


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Pad every leaf to a larger capacity (outside jit; triggers re-trace).

    New dead slots get the SAME safe fills as create_from_pcd: tiny scale
    (log -10), ~zero opacity (logit -10), unit quaternion — zero-padding
    would put scale-1.0, opacity-0.5, degenerate-quat ghosts in the pool
    (masked by `alive`, but one mask bug away from artifacts and a NaN
    hazard through normalize-at-zero gradients)."""
    cap = state.capacity
    assert new_capacity >= cap
    extra = new_capacity - cap

    def pad_leaf(x, fill=0.0):
        if x.ndim == 0 or x.shape[0] != cap:
            return x
        pad = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    p = state.params
    params = p._replace(
        xyz=pad_leaf(p.xyz),
        features_dc=pad_leaf(p.features_dc),
        features_rest=pad_leaf(p.features_rest),
        scaling=pad_leaf(p.scaling, -10.0),
        rotation=pad_leaf(p.rotation).at[cap:, 0].set(1.0),
        opacity=pad_leaf(p.opacity, -10.0),
        normal=pad_leaf(p.normal),
        albedo=pad_leaf(p.albedo),
        roughness=pad_leaf(p.roughness),
    )
    rest = jax.tree_util.tree_map(
        pad_leaf, state._replace(params=None)
    )
    return rest._replace(params=params)


def compact_state(state: GaussianState, capacity: int | None = None,
                  multiple: int = 256) -> GaussianState:
    """Repack alive Gaussians into a tight capacity (outside jit).

    Training runs with headroom capacity for densification, but rendering
    pays sort/preprocess/binning cost per CAPACITY slot, dead or alive —
    the reference renders exactly its N Gaussians. Call this once after
    loading a checkpoint for eval/serving: alive rows move to the front,
    capacity shrinks to the next `multiple` (or the given value), and dead
    slots get the same safe fills as create_from_pcd/grow_capacity.
    """
    alive = np.asarray(jax.device_get(state.alive))
    idx = np.nonzero(alive)[0]
    n = int(idx.size)
    # explicit capacities are rounded UP to `multiple` too: the TPU kernels
    # assume lane-aligned capacities (the Pallas KNN grids 128-query blocks)
    cap = max(multiple, -(-(capacity or n) // multiple) * multiple)
    assert cap >= n, (cap, n)

    fills = {"scaling": -10.0, "opacity": -10.0}

    def take(x, name=""):
        x = np.asarray(jax.device_get(x))
        if x.ndim == 0 or x.shape[0] != state.capacity:
            return jnp.asarray(x)
        out = np.full((cap,) + x.shape[1:], fills.get(name, 0.0), x.dtype)
        out[:n] = x[idx]
        if name == "rotation":
            out[n:, 0] = 1.0   # unit quaternion in dead slots
        return jnp.asarray(out)

    params = GaussianParams(
        **{f: take(getattr(state.params, f), f)
           for f in GaussianParams._fields}
    )
    return GaussianState(
        params=params,
        alive=jnp.arange(cap) < n,
        smpl_normal=take(state.smpl_normal),
        xyz_grad_accum=take(state.xyz_grad_accum),
        denom=take(state.denom),
        max_radii2d=take(state.max_radii2d),
    )


# ----------------------------------------------------------------------------
# Densification statistics (reference add_densification_stats, :764-766)
# ----------------------------------------------------------------------------

def add_densification_stats(
    state: GaussianState,
    means2d_grad_ndc: jnp.ndarray,   # [cap, 2] dL/dmean2D in reference NDC units
    radii: jnp.ndarray,              # [cap] int32
) -> GaussianState:
    visible = radii > 0
    norm = jnp.linalg.norm(means2d_grad_ndc, axis=-1)
    return state._replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(visible, norm, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(
            visible,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
    )


# ----------------------------------------------------------------------------
# Slot allocation: scatter `selected` source rows into free slots
# ----------------------------------------------------------------------------

def _alloc_slots(alive: jnp.ndarray, selected: jnp.ndarray):
    """Map each selected source row to a distinct dead slot.

    Returns (dest [cap] int32, ok [cap] bool, dropped int32): for selected row
    i with rank r among selected, dest[i] = index of the (r+1)-th dead slot.
    Rows beyond the number of free slots are dropped (counted, never silent).
    """
    cap = alive.shape[0]
    free = ~alive
    # free_idx[r] = index of r-th dead slot (stable): sort (alive, arange).
    order = jnp.argsort(alive)                       # dead slots first, stable
    rank = jnp.cumsum(selected) - 1                  # rank among selected
    n_free = jnp.sum(free)
    ok = selected & (rank < n_free)
    dest = order[jnp.clip(rank, 0, cap - 1)]
    dropped = jnp.sum(selected) - jnp.sum(ok)
    return dest.astype(jnp.int32), ok, dropped.astype(jnp.int32)


def _scatter_params(
    params: GaussianParams,
    src_params: GaussianParams,
    dest: jnp.ndarray,
    ok: jnp.ndarray,
) -> GaussianParams:
    """Write src rows (where ok) into dest slots of every param leaf."""
    cap = ok.shape[0]
    safe_dest = jnp.where(ok, dest, cap)  # cap = out-of-bounds -> dropped

    def scat(leaf, src):
        return leaf.at[safe_dest].set(src, mode="drop")

    return jax.tree_util.tree_map(scat, params, src_params)


def _written_mask(dest: jnp.ndarray, ok: jnp.ndarray, cap: int) -> jnp.ndarray:
    m = jnp.zeros((cap,), bool)
    return m.at[jnp.where(ok, dest, cap)].set(True, mode="drop")


# ----------------------------------------------------------------------------
# Densify / prune (all jittable, state -> (state, written_mask))
# ----------------------------------------------------------------------------

def _avg_grads(state: GaussianState) -> jnp.ndarray:
    g = state.xyz_grad_accum / jnp.maximum(state.denom, 1e-12)
    return jnp.where(state.denom > 0, g, 0.0)


def densify_and_clone(
    state: GaussianState,
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float = 0.01,
):
    """Copy small high-gradient Gaussians (gaussian_model.py:546-564)."""
    p = state.params
    grads = _avg_grads(state)
    small = jnp.max(get_scaling(p), axis=1) <= percent_dense * scene_extent
    selected = state.alive & (grads >= grad_threshold) & small
    dest, ok, dropped = _alloc_slots(state.alive, selected)
    new_params = _scatter_params(p, p, dest, ok)
    written = _written_mask(dest, ok, state.capacity)
    return state._replace(
        params=new_params, alive=state.alive | written
    ), written, dropped


def densify_and_split(
    state: GaussianState,
    grad_threshold: float,
    scene_extent: float,
    rng: jax.Array,
    n_split: int = 2,
    percent_dense: float = 0.01,
):
    """Resample big high-gradient Gaussians into n smaller ones and kill the
    original (gaussian_model.py:517-544). scale /= 0.8*n."""
    p = state.params
    cap = state.capacity
    grads = _avg_grads(state)
    big = jnp.max(get_scaling(p), axis=1) > percent_dense * scene_extent
    selected = state.alive & (grads >= grad_threshold) & big

    stds = get_scaling(p)                            # [cap, 3]
    R = quat_to_rotmat(p.rotation)                   # [cap, 3, 3]
    noise = jax.random.normal(rng, (n_split, cap, 3)) * stds[None]
    offsets = jnp.einsum("cij,ncj->nci", R, noise)   # rotate into world
    new_scaling = p.scaling - jnp.log(0.8 * n_split)

    alive = state.alive & ~selected                  # original dies
    written_all = jnp.zeros((cap,), bool)
    dropped_all = jnp.zeros((), jnp.int32)
    params = p
    for i in range(n_split):
        src = params._replace(
            xyz=p.xyz + offsets[i], scaling=new_scaling
        )
        dest, ok, dropped = _alloc_slots(alive, selected)
        params = _scatter_params(params, src, dest, ok)
        w = _written_mask(dest, ok, cap)
        alive = alive | w
        written_all = written_all | w
        dropped_all = dropped_all + dropped
    return state._replace(params=params, alive=alive), written_all, dropped_all


def kl_div_diag(
    mu0, rot0_q, scale0, mu1, rot1_q, scale1
) -> jnp.ndarray:
    """Closed-form KL(N0 || N1) for quat-rotated diagonal covariances.

    Parity: gaussian_model.py:740-762 — 0.5*(tr(C1^-1 C0) + dmu^T C1^-1 dmu
    + log prod (s1/s0)^2 - 3).
    """
    R0 = quat_to_rotmat(rot0_q)
    R1 = quat_to_rotmat(rot1_q)
    cov0 = jnp.einsum("nij,nj,nkj->nik", R0, scale0**2, R0)
    cov1_inv = jnp.einsum("nij,nj,nkj->nik", R1, 1.0 / (scale1**2 + 1e-12), R1)
    dmu = mu0 - mu1
    t0 = jnp.trace(jnp.einsum("nij,njk->nik", cov1_inv, cov0), axis1=1, axis2=2)
    t1 = jnp.einsum("ni,nij,nj->n", dmu, cov1_inv, dmu)
    t2 = jnp.sum(jnp.log((scale1 / jnp.maximum(scale0, 1e-12)) ** 2), axis=1)
    return 0.5 * (t0 + t1 + t2 - 3.0)


def _neighbor_kl(state: GaussianState):
    """KL to each alive Gaussian's nearest alive neighbor (self excluded)."""
    p = state.params
    far = jnp.where(state.alive[:, None], p.xyz, 1e6)
    _, idx = knn(far, far, k=2)
    nn = idx[:, 1]                                    # nearest non-self
    scales = get_scaling(p)
    rots = p.rotation
    return kl_div_diag(
        p.xyz, rots, scales, p.xyz[nn], rots[nn], scales[nn]
    ), nn


def kl_densify_and_clone(
    state, grad_threshold, scene_extent, kl_threshold=0.4, percent_dense=0.01
):
    """Clone gate additionally requires KL(neighbor) > threshold
    (gaussian_model.py:570-610)."""
    kl, _ = _neighbor_kl(state)
    grads = _avg_grads(state)
    p = state.params
    small = jnp.max(get_scaling(p), axis=1) <= percent_dense * scene_extent
    selected = (
        state.alive & (grads >= grad_threshold) & small & (kl > kl_threshold)
    )
    dest, ok, dropped = _alloc_slots(state.alive, selected)
    new_params = _scatter_params(p, p, dest, ok)
    written = _written_mask(dest, ok, state.capacity)
    return state._replace(
        params=new_params, alive=state.alive | written
    ), written, dropped


def kl_densify_and_split(
    state, grad_threshold, scene_extent, rng, kl_threshold=0.4,
    n_split=2, percent_dense=0.01,
):
    """Split gate additionally requires KL(neighbor) > threshold
    (gaussian_model.py:618-666)."""
    kl, _ = _neighbor_kl(state)
    grads = _avg_grads(state)
    p = state.params
    cap = state.capacity
    big = jnp.max(get_scaling(p), axis=1) > percent_dense * scene_extent
    selected = (
        state.alive & (grads >= grad_threshold) & big & (kl > kl_threshold)
    )

    stds = get_scaling(p)
    R = quat_to_rotmat(p.rotation)
    noise = jax.random.normal(rng, (n_split, cap, 3)) * stds[None]
    offsets = jnp.einsum("cij,ncj->nci", R, noise)
    new_scaling = p.scaling - jnp.log(0.8 * n_split)

    alive = state.alive & ~selected
    written_all = jnp.zeros((cap,), bool)
    dropped_all = jnp.zeros((), jnp.int32)
    params = p
    for i in range(n_split):
        src = params._replace(xyz=p.xyz + offsets[i], scaling=new_scaling)
        dest, ok, dropped = _alloc_slots(alive, selected)
        params = _scatter_params(params, src, dest, ok)
        w = _written_mask(dest, ok, cap)
        alive = alive | w
        written_all = written_all | w
        dropped_all = dropped_all + dropped
    return state._replace(params=params, alive=alive), written_all, dropped_all


def kl_merge(state, grad_threshold, scene_extent, kl_threshold=0.1,
             percent_dense=0.01):
    """Merge near-duplicate neighbor pairs: KL < threshold -> replace the pair
    with their midpoint Gaussian and kill both (gaussian_model.py:670-708;
    the reference version has a latent arg-count crash and is dead code —
    this is the working equivalent)."""
    kl, nn = _neighbor_kl(state)
    grads = _avg_grads(state)
    p = state.params
    cap = state.capacity
    small = jnp.max(get_scaling(p), axis=1) <= percent_dense * scene_extent
    cand = state.alive & (grads >= grad_threshold) & small & (kl < kl_threshold)
    # Deduplicate symmetric pairs: keep i only if i < nn[i] and both candidates.
    partner_cand = cand[nn] & (nn != jnp.arange(cap))
    selected = cand & partner_cand & (jnp.arange(cap) < nn)

    def mid(leaf):
        return 0.5 * (leaf + leaf[nn])

    src = GaussianParams(
        xyz=mid(p.xyz),
        features_dc=mid(p.features_dc),
        features_rest=mid(p.features_rest),
        scaling=jnp.log(
            jnp.maximum(0.5 * (get_scaling(p) + get_scaling(p)[nn]), 1e-12)
        ) - jnp.log(0.8),
        rotation=mid(p.rotation),
        opacity=mid(p.opacity),
        normal=mid(p.normal),
        albedo=mid(p.albedo),
        roughness=mid(p.roughness),
    )
    # kill both members of each merged pair
    kill = selected | jnp.zeros((cap,), bool).at[jnp.where(selected, nn, cap)].set(
        True, mode="drop"
    )
    alive = state.alive & ~kill
    dest, ok, dropped = _alloc_slots(alive, selected)
    params = _scatter_params(p, src, dest, ok)
    written = _written_mask(dest, ok, cap)
    return state._replace(params=params, alive=alive | written), written, dropped


def prune(
    state: GaussianState,
    min_opacity: float,
    scene_extent: float,
    max_screen_size: float | None,
    smpl_vertices: jnp.ndarray | None = None,
    smpl_dist_threshold: float = 0.05,
) -> GaussianState:
    """Kill low-opacity / oversized / far-from-SMPL Gaussians
    (gaussian_model.py:710-736)."""
    p = state.params
    mask = get_opacity(p)[:, 0] < min_opacity
    if max_screen_size:
        mask |= state.max_radii2d > max_screen_size
        mask |= jnp.max(get_scaling(p), axis=1) > 0.1 * scene_extent
    if smpl_vertices is not None:
        d2, _ = knn(p.xyz, smpl_vertices, k=1)
        mask |= d2[:, 0] > smpl_dist_threshold**2
    return state._replace(alive=state.alive & ~mask)


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to <= 0.01 (gaussian_model.py:348-351)."""
    p = state.params
    new = inverse_sigmoid(jnp.minimum(get_opacity(p), 0.01))
    return state._replace(params=p._replace(opacity=new))


def reset_densification_stats(state: GaussianState) -> GaussianState:
    def z():
        # distinct buffers (donation rejects aliased leaves)
        return jnp.zeros_like(state.xyz_grad_accum)

    return state._replace(xyz_grad_accum=z(), denom=z(), max_radii2d=z())


@functools.partial(jax.jit, static_argnames=("use_kl", "max_screen_size_on"))
def densify_and_prune(
    state: GaussianState,
    rng: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float = 0.0,
    max_screen_size_on: bool = False,
    kl_threshold: float = 0.4,
    smpl_vertices: jnp.ndarray | None = None,
    use_kl: bool = False,
    percent_dense: float = 0.01,
):
    """One densification event (reference densify_and_prune, :710-736).

    The reference ships KL variants but runs the plain clone/split (:714-718);
    `use_kl=True` enables the paper's KL gating. Returns
    (state, written, info) — `written` marks slots whose Adam moments must be
    reset; `info` carries truncation/health counters (cloned/split/merged
    counts, alloc drops, prune count) so densification saturation is never
    silent (the reference prints counts at gaussian_model.py:591,639,689).
    """
    alive_before = jnp.sum(state.alive)
    if use_kl:
        state, w1, d1 = kl_densify_and_clone(
            state, max_grad, extent, kl_threshold, percent_dense
        )
        state, w2, d2 = kl_densify_and_split(
            state, max_grad, extent, rng, kl_threshold, 2, percent_dense
        )
        state, w3, d3 = kl_merge(state, max_grad, extent, 0.1, percent_dense)
        written = w1 | w2 | w3
        info = {
            "cloned": jnp.sum(w1), "split_new": jnp.sum(w2),
            "merged": jnp.sum(w3),
            "dropped": d1 + d2 + d3,
        }
    else:
        state, w1, d1 = densify_and_clone(
            state, max_grad, extent, percent_dense
        )
        state, w2, d2 = densify_and_split(
            state, max_grad, extent, rng, 2, percent_dense
        )
        written = w1 | w2
        info = {
            "cloned": jnp.sum(w1), "split_new": jnp.sum(w2),
            "merged": jnp.zeros((), jnp.int32),
            "dropped": d1 + d2,
        }
    alive_grown = jnp.sum(state.alive)
    state = prune(
        state,
        min_opacity,
        extent,
        max_screen_size if max_screen_size_on else None,
        smpl_vertices,
    )
    info["pruned"] = alive_grown - jnp.sum(state.alive)
    info["alive"] = jnp.sum(state.alive)
    info["grew"] = jnp.sum(state.alive) - alive_before
    state = reset_densification_stats(state)
    return state, written, info
