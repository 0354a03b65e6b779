"""Main Gaussian surfel parameter store (reference scene/gaussian_model.py).

TPU-native redesign: instead of dynamically growing/shrinking torch tensors
with Adam-state surgery (gaussian_model.py:840-1065), the model is a FIXED
CAPACITY functional pytree with an `alive` mask:

  - every per-gaussian array is (CAP, ...); dead slots have alive=False and
    raw opacity at inverse_sigmoid(~1e-6) so the rasterizer culls them,
  - clone/split write into free slots via masked scatter; prune flips alive,
  - optimizer surgery becomes masking the optax Adam mu/nu rows
    (zero at newly-written slots; whole-tensor zero on the reset_* ops,
    matching replace_tensor_to_optimizer, gaussian_model.py:840-854).

Static shapes everywhere -> no recompilation as the point count changes.

Activations (gaussian_model.py:47-77): exp scaling, sigmoid for opacity /
refl(metallic) / metalness(EnvGS blend) / roughness / colors, normalized
quaternions.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from materialrefgs_tpu.ops.knn import mean_knn_dist2
from materialrefgs_tpu.utils import sh as sh_utils
from materialrefgs_tpu.utils.transforms import inverse_sigmoid, quat_to_rotmat

INIT_REFL = 0.1
INIT_ROUGHNESS = 0.1
INIT_METALNESS = 0.1
INIT_OPACITY = 0.1


@struct.dataclass
class GaussianParams:
    """Raw (pre-activation) parameters, all leading dim CAP."""

    xyz: jax.Array  # (CAP, 3)
    scaling: jax.Array  # (CAP, 2) log-scale (2D surfel)
    rotation: jax.Array  # (CAP, 4) unnormalized quat (w,x,y,z)
    opacity: jax.Array  # (CAP, 1) logit
    refl_strength: jax.Array  # (CAP, 1) logit — metallic
    metalness: jax.Array  # (CAP, 1) logit — EnvGS blend weight
    roughness: jax.Array  # (CAP, 1) logit
    ori_color: jax.Array  # (CAP, 3) logit — albedo
    diffuse_color: jax.Array  # (CAP, 3) logit
    features_dc: jax.Array  # (CAP, 1, 3)
    features_rest: jax.Array  # (CAP, K-1, 3)
    indirect_dc: jax.Array  # (CAP, 1, 3)
    indirect_rest: jax.Array  # (CAP, K-1, 3)
    indirect_asg: jax.Array  # (CAP, 32, 5)
    normal1: jax.Array  # (CAP, 3) residual normals (frozen by default)
    normal2: jax.Array  # (CAP, 3)


@struct.dataclass
class GaussianModel:
    params: GaussianParams
    alive: jax.Array  # (CAP,) bool
    max_radii2d: jax.Array  # (CAP,)
    xyz_gradient_accum: jax.Array  # (CAP,)
    denom: jax.Array  # (CAP,)
    active_sh_degree: jax.Array  # () int32
    max_sh_degree: int = struct.field(pytree_node=False, default=3)
    capacity: int = struct.field(pytree_node=False, default=0)

    # ---------- activations ----------
    @property
    def get_xyz(self):
        return self.params.xyz

    @property
    def get_scaling(self):
        return jnp.exp(self.params.scaling)

    @property
    def get_rotation(self):
        q = self.params.rotation
        return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)

    @property
    def get_opacity(self):
        return jax.nn.sigmoid(self.params.opacity) * self.alive[:, None]

    @property
    def get_refl(self):
        return jax.nn.sigmoid(self.params.refl_strength)

    @property
    def get_specular(self):
        """EnvGS blend weight (reference get_specular, gaussian_model.py:310)."""
        return jax.nn.sigmoid(self.params.metalness)

    @property
    def get_rough(self):
        return jax.nn.sigmoid(self.params.roughness)

    @property
    def get_ori_color(self):
        return jax.nn.sigmoid(self.params.ori_color)

    @property
    def get_diffuse_color(self):
        return jax.nn.sigmoid(self.params.diffuse_color)

    @property
    def n_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    def get_features(self):
        """(CAP, K, 3) SH coeffs with inactive degree bands zeroed (replaces
        the active_sh_degree code-path switch with a mask, jit-friendly)."""
        feats = jnp.concatenate(
            [self.params.features_dc, self.params.features_rest], axis=1
        )
        return self._mask_sh(feats)

    def get_indirect(self):
        # Indirect SH always evaluates at full degree (render_surfel uses
        # eval_sh(3, ...) regardless of active_sh_degree).
        return jnp.concatenate(
            [self.params.indirect_dc, self.params.indirect_rest], axis=1
        )

    def _mask_sh(self, feats):
        K = feats.shape[1]
        idx = np.arange(K)
        deg_of = np.floor(np.sqrt(idx)).astype(np.int32)  # SH band per coeff
        band = jnp.asarray(deg_of)
        mask = (band <= self.active_sh_degree).astype(feats.dtype)
        return feats * mask[None, :, None]

    def get_colors(self, campos: jax.Array) -> jax.Array:
        """SH -> clamped RGB toward camera (forward.cu computeColorFromSH)."""
        dirs = self.params.xyz - campos[None, :]
        feats = self.get_features().transpose(0, 2, 1)  # (CAP, 3, K)
        return sh_utils.sh_to_rgb(self.max_sh_degree, feats, dirs)

    def get_world_normal(self) -> jax.Array:
        """Splat normal in world space (3rd column of R)."""
        R = quat_to_rotmat(self.get_rotation)
        return R[..., :, 2]

    def oneup_sh_degree(self) -> "GaussianModel":
        return self.replace(
            active_sh_degree=jnp.minimum(
                self.active_sh_degree + 1, self.max_sh_degree
            )
        )


def create_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
    rng: np.random.Generator | None = None,
    init_refl: float = INIT_REFL,  # opt.init_refl_value
    init_roughness: float = INIT_ROUGHNESS,  # opt.init_roughness_value
) -> GaussianModel:
    """create_from_pcd (gaussian_model.py:355-433) with fixed capacity."""
    rng = rng or np.random.default_rng(3407)
    P = points.shape[0]
    assert P <= capacity, (P, capacity)
    K = (max_sh_degree + 1) ** 2

    def padded(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:P] = x
        return jnp.asarray(out)

    d2 = np.maximum(np.asarray(mean_knn_dist2(jnp.asarray(points, jnp.float32))), 1e-7)
    scales = np.log(np.sqrt(d2))[:, None].repeat(2, axis=1)
    rots = rng.random((P, 4)).astype(np.float32)

    inv_sig = lambda v: float(np.log(v / (1 - v)))
    f_dc = sh_utils.rgb_to_sh(jnp.asarray(colors, jnp.float32))  # (P, 3)

    ori = np.clip(
        0.5 + (rng.random((P, 3)).astype(np.float32) - 0.5) * 0.05, 0.0, 1.0
    )
    dif = np.clip(
        0.5 + (rng.random((P, 3)).astype(np.float32) - 0.5) * 0.05, 0.0, 1.0
    )

    params = GaussianParams(
        xyz=padded(points.astype(np.float32)),
        scaling=padded(scales.astype(np.float32), fill=-10.0),
        rotation=padded(rots, fill=0.0).at[:, 0].set(
            jnp.where(jnp.arange(capacity) < P, padded(rots)[:, 0], 1.0)
        ),
        opacity=padded(
            np.full((P, 1), inv_sig(INIT_OPACITY), np.float32), fill=-15.0
        ),
        refl_strength=padded(np.full((P, 1), inv_sig(init_refl), np.float32)),
        metalness=padded(np.full((P, 1), inv_sig(INIT_METALNESS), np.float32)),
        roughness=padded(np.full((P, 1), inv_sig(init_roughness), np.float32)),
        ori_color=padded(np.asarray(np.log(ori / (1 - ori)), np.float32)),
        diffuse_color=padded(np.asarray(np.log(dif / (1 - dif)), np.float32)),
        features_dc=padded(np.asarray(f_dc, np.float32)[:, None, :]),
        features_rest=padded(np.zeros((P, K - 1, 3), np.float32)),
        indirect_dc=padded(np.zeros((P, 1, 3), np.float32)),
        indirect_rest=padded(np.zeros((P, K - 1, 3), np.float32)),
        indirect_asg=padded(np.zeros((P, 32, 5), np.float32)),
        normal1=padded(np.zeros((P, 3), np.float32)),
        normal2=padded(np.zeros((P, 3), np.float32)),
    )
    alive = jnp.arange(capacity) < P
    # NOTE: distinct zero buffers — shared buffers break jit donation.
    return GaussianModel(
        params=params,
        alive=alive,
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        active_sh_degree=jnp.int32(0),
        max_sh_degree=max_sh_degree,
        capacity=capacity,
    )


# ---------------------------------------------------------------- densify ----


def _scatter_rows(tree: GaussianParams, src_idx, dst_idx, valid) -> GaussianParams:
    """Copy rows src_idx -> dst_idx (where valid) across every param leaf."""

    def scatter(leaf):
        rows = leaf[src_idx]
        dst = jnp.where(valid, dst_idx, leaf.shape[0])  # OOB -> dropped
        return leaf.at[dst].set(jnp.where(valid.reshape((-1,) + (1,) * (rows.ndim - 1)), rows, 0.0), mode="drop")

    return jax.tree_util.tree_map(scatter, tree)


def add_densification_stats(
    model: GaussianModel,
    mean2d_grad: jax.Array,
    radii: jax.Array,
    ndc_scale: tuple[float, float] = (1.0, 1.0),
    axis_name: str | None = None,
) -> GaussianModel:
    """gaussian_model.py:1059-1062: accumulate viewspace grad norms where
    the gaussian was visible (radii > 0).

    ndc_scale: (0.5*W, 0.5*H). Our rasterizer produces mean2D gradients in
    *pixel* units; the reference's rasterizer scales them to NDC units
    (backward.cu:260-261 `ddelx_dx = 0.5 * W`) before they reach
    `add_densification_stats`, and `densify_grad_threshold=2e-4` is calibrated
    against those NDC-unit norms. Without this scale, pixel-unit grads are
    ~0.5*W times smaller and densification almost never fires (~400x at
    W=800), which was the round-1 quality bottleneck."""
    upd = (radii > 0) & model.alive
    g = mean2d_grad * jnp.asarray(ndc_scale, mean2d_grad.dtype)[None, :]
    gnorm = jnp.linalg.norm(g, axis=-1)
    accum = jnp.where(upd, gnorm, 0.0)
    denom = upd.astype(jnp.float32)
    max_r = jnp.where(upd, jnp.maximum(model.max_radii2d, radii), model.max_radii2d)
    if axis_name is not None:
        # DP: each chip contributes ITS camera's per-view grad norm, like n
        # sequential single-chip iterations would. Summing norms — not
        # taking the norm of the pmean'd vector, where opposite-direction
        # screen grads from different views cancel and densification
        # silently under-fires vs the single-chip calibration.
        accum = jax.lax.psum(accum, axis_name)
        denom = jax.lax.psum(denom, axis_name)
        max_r = jax.lax.pmax(max_r, axis_name)
    return model.replace(
        xyz_gradient_accum=model.xyz_gradient_accum + accum,
        denom=model.denom + denom,
        max_radii2d=max_r,
    )


def densify_and_prune(
    model: GaussianModel,
    opt_state: Any,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float = 0.01,
    N: int = 2,
):
    """Clone + split + prune (gaussian_model.py:1043-1057) on fixed capacity.

    Returns (model, opt_state) with new slots' Adam mu/nu zeroed. Slot
    allocation: free slots are taken in index order; overflow beyond capacity
    silently drops candidates (lowest-index first served).
    """
    p = model.params
    cap = model.capacity
    grads = model.xyz_gradient_accum / jnp.maximum(model.denom, 1.0)
    grads = jnp.where(model.denom > 0, grads, 0.0)
    scal = jnp.exp(p.scaling)
    max_scale = jnp.max(scal, axis=-1)

    sel_grad = (grads >= max_grad) & model.alive
    clone_sel = sel_grad & (max_scale <= percent_dense * extent)
    split_sel = sel_grad & (max_scale > percent_dense * extent)

    # --- free slot allocation: clones first, then N split children.
    n_clone_req = jnp.cumsum(clone_sel.astype(jnp.int32)) - clone_sel
    free = ~model.alive
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
    free_idx_of_rank = jnp.full(cap, cap, jnp.int32)
    free_idx_of_rank = free_idx_of_rank.at[
        jnp.where(free, free_rank, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")

    def take_free(rank):
        ok = rank < jnp.sum(free)
        idx = free_idx_of_rank[jnp.clip(rank, 0, cap - 1)]
        return idx, ok

    src = jnp.arange(cap, dtype=jnp.int32)

    # Clones: copy row as-is.
    clone_rank = n_clone_req
    clone_dst, clone_ok = take_free(clone_rank)
    clone_valid = clone_sel & clone_ok
    new_params = _scatter_rows(p, src, clone_dst, clone_valid)
    written = jnp.zeros(cap, bool).at[jnp.where(clone_valid, clone_dst, cap)].set(
        True, mode="drop"
    )

    # Splits: N children with sampled positions, shrunk scales; parent dies.
    n_clones_total = jnp.sum(clone_valid.astype(jnp.int32))
    split_rank0 = jnp.cumsum(split_sel.astype(jnp.int32)) - split_sel
    R = quat_to_rotmat(
        p.rotation / jnp.maximum(jnp.linalg.norm(p.rotation, axis=-1, keepdims=True), 1e-12)
    )
    alive_new = model.alive | written
    for n in range(N):
        key, sub = jax.random.split(key)
        noise2 = jax.random.normal(sub, (cap, 2)) * scal
        noise3 = jnp.concatenate([noise2, jnp.zeros((cap, 1))], axis=-1)
        new_xyz = p.xyz + jnp.einsum("pij,pj->pi", R, noise3)
        new_scaling = jnp.log(jnp.maximum(scal / (0.8 * N), 1e-12))

        rank = n_clones_total + split_rank0 * N + n
        dst, ok = take_free(rank)
        valid = split_sel & ok
        child = p.replace(xyz=new_xyz, scaling=new_scaling)
        new_params = _scatter_merge(new_params, child, src, dst, valid)
        written = written.at[jnp.where(valid, dst, cap)].set(True, mode="drop")
        alive_new = alive_new | written

    # Parents of splits die; then prune.
    alive_new = alive_new & ~split_sel

    opacity = jax.nn.sigmoid(new_params.opacity[:, 0])
    prune = opacity < min_opacity
    if max_screen_size is not None:
        prune = prune | (model.max_radii2d > max_screen_size)
        prune = prune | (jnp.max(jnp.exp(new_params.scaling), -1) > 0.1 * extent)
    # Never prune freshly written slots' stats-based criteria incorrectly:
    # written slots have max_radii2d=0 so only the opacity term applies.
    alive_new = alive_new & ~prune

    # Dead slots: clamp raw opacity so the rasterizer culls them.
    new_params = new_params.replace(
        opacity=jnp.where(alive_new[:, None], new_params.opacity, -15.0)
    )

    model = model.replace(
        params=new_params,
        alive=alive_new,
        xyz_gradient_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
        max_radii2d=jnp.zeros(cap, jnp.float32),
    )
    opt_state = zero_adam_rows(opt_state, written)
    return model, opt_state


def _scatter_merge(dst_params, src_params, src, dst_idx, valid):
    """Write src_params rows[src] into dst_params at dst_idx where valid."""

    def scatter(dleaf, sleaf):
        rows = sleaf[src]
        di = jnp.where(valid, dst_idx, dleaf.shape[0])
        return dleaf.at[di].set(
            jnp.where(valid.reshape((-1,) + (1,) * (rows.ndim - 1)), rows, 0.0),
            mode="drop",
        )

    return jax.tree_util.tree_map(scatter, dst_params, src_params)


def zero_adam_rows(opt_state, row_mask: jax.Array):
    """Zero optax Adam mu/nu rows for newly created gaussians
    (cat_tensors_to_optimizer semantics, gaussian_model.py:904-926).

    Works on any optax state pytree: zeroes rows of every leaf whose leading
    dim == len(row_mask) inside ScaleByAdamState-like nodes.
    """

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == row_mask.shape[0]:
            return jnp.where(
                row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1)), 0.0, leaf
            )
        return leaf

    import optax

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                mu=jax.tree_util.tree_map(fix, node.mu),
                nu=jax.tree_util.tree_map(fix, node.nu),
            )
        return node

    return jax.tree_util.tree_map(
        walk, opt_state, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)
    )


def zero_adam_param(opt_state, param_name: str):
    """Whole-tensor Adam state reset for one param (replace_tensor_to_optimizer
    semantics, gaussian_model.py:840-854)."""
    import optax

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            def fix_tree(tree):
                def fix(path, leaf):
                    names = [getattr(k, "name", str(k)) for k in path]
                    if param_name in names:
                        return jnp.zeros_like(leaf)
                    return leaf

                return jax.tree_util.tree_map_with_path(fix, tree)

            return node._replace(mu=fix_tree(node.mu), nu=fix_tree(node.nu))
        return node

    return jax.tree_util.tree_map(
        walk, opt_state, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)
    )


# ------------------------------------------------------------------ resets ----


def reset_opacity0(model: GaussianModel) -> GaussianModel:
    """gaussian_model.py:530-534: clamp opacity to <= 0.01."""
    new = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(model.params.opacity), 0.01))
    new = jnp.where(model.alive[:, None], new, -15.0)
    return model.replace(params=model.params.replace(opacity=new))


def reset_opacity1(model: GaussianModel, exclusive_msk=None) -> GaussianModel:
    """gaussian_model.py:536-546: pull opacities up to 0.9 unless already
    above (or excluded)."""
    RESET_V = 0.9
    op = jax.nn.sigmoid(model.params.opacity)
    keep = (op > RESET_V)[:, 0]
    if exclusive_msk is not None:
        keep = keep | exclusive_msk
    new = jnp.where(
        keep[:, None], model.params.opacity, inverse_sigmoid(jnp.full_like(op, RESET_V))
    )
    new = jnp.where(model.alive[:, None], new, -15.0)
    return model.replace(params=model.params.replace(opacity=new))


def reset_refl(model: GaussianModel, exclusive_msk=None, rst_value=None) -> GaussianModel:
    """gaussian_model.py:558-566: floor refl_strength at init value."""
    v = INIT_REFL if rst_value is None else rst_value
    refl = jax.nn.sigmoid(model.params.refl_strength)
    new = inverse_sigmoid(jnp.maximum(refl, v))
    if exclusive_msk is not None:
        new = jnp.where(exclusive_msk[:, None], model.params.refl_strength, new)
    return model.replace(params=model.params.replace(refl_strength=new))


def dist_color(model: GaussianModel, key: jax.Array, exclusive_msk=None) -> GaussianModel:
    """gaussian_model.py:598-610: perturb f_dc of low-refl gaussians."""
    REFL_MSK_THR = 0.02
    DIST_RANGE = 0.4
    refl_msk = (jax.nn.sigmoid(model.params.refl_strength) > REFL_MSK_THR)[:, 0]
    if exclusive_msk is not None:
        refl_msk = refl_msk | exclusive_msk
    dcc = model.params.features_dc
    noise = jax.random.uniform(key, dcc.shape) * DIST_RANGE * 2 - DIST_RANGE
    new = jnp.where(refl_msk[:, None, None], dcc, dcc + noise)
    return model.replace(params=model.params.replace(features_dc=new))


def enlarge_refl_scales(
    model: GaussianModel,
    enlarge_scale: float = 1.5,
    refl_msk_thr: float = 0.02,
    rough_msk_thr: float = 0.1,
    exclusive_msk=None,
) -> jax.Array:
    """gaussian_model.py:624-643: enlarged log-scales for reflective gaussians."""
    refl_msk = (jax.nn.sigmoid(model.params.refl_strength) < refl_msk_thr)[:, 0]
    rough_msk = (jax.nn.sigmoid(model.params.roughness) > rough_msk_thr)[:, 0]
    msk = refl_msk | rough_msk
    if exclusive_msk is not None:
        msk = msk | exclusive_msk
    enlarged = model.params.scaling + jnp.log(enlarge_scale)
    return jnp.where(msk[:, None], model.params.scaling, enlarged)


def reset_scale(model: GaussianModel, exclusive_msk=None) -> GaussianModel:
    """gaussian_model.py:663-667."""
    return model.replace(
        params=model.params.replace(
            scaling=enlarge_refl_scales(model, exclusive_msk=exclusive_msk)
        )
    )


def reset_opacity1_strategy2(model: GaussianModel) -> GaussianModel:
    """gaussian_model.py:548-554: scale opacities by 1.5 (clamped)."""
    op = jax.nn.sigmoid(model.params.opacity)
    new = inverse_sigmoid(jnp.clip(op * 1.5, 1e-6, 0.99))
    new = jnp.where(model.alive[:, None], new, -15.0)
    return model.replace(params=model.params.replace(opacity=new))


def reset_specular(model: GaussianModel, exclusive_msk=None) -> GaussianModel:
    """gaussian_model.py:566-573: floor the EnvGS blend weight (metalness)."""
    sp = jax.nn.sigmoid(model.params.metalness)
    new = inverse_sigmoid(jnp.maximum(sp, INIT_METALNESS))
    if exclusive_msk is not None:
        new = jnp.where(exclusive_msk[:, None], model.params.metalness, new)
    return model.replace(params=model.params.replace(metalness=new))


def dist_rot(model: GaussianModel, key: jax.Array) -> GaussianModel:
    """gaussian_model.py:575-584: perturb rotations of low-refl gaussians."""
    refl_msk = (jax.nn.sigmoid(model.params.refl_strength) > 0.02)[:, 0]
    q = model.get_rotation
    noise = jax.random.normal(key, q.shape) * 0.08
    qn = q + noise
    qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)
    new = jnp.where(refl_msk[:, None], q, qn)
    return model.replace(params=model.params.replace(rotation=new))


def dist_albedo(model: GaussianModel, key: jax.Array, exclusive_msk=None) -> GaussianModel:
    """gaussian_model.py:586-597: perturb raw albedo of low-refl gaussians."""
    refl_msk = (jax.nn.sigmoid(model.params.refl_strength) > 0.02)[:, 0]
    if exclusive_msk is not None:
        refl_msk = refl_msk | exclusive_msk
    oc = model.params.ori_color
    noise = jax.random.uniform(key, oc.shape) * 0.8 - 0.4
    new = jnp.where(refl_msk[:, None], oc, oc + noise)
    return model.replace(params=model.params.replace(ori_color=new))


def reset_features(model: GaussianModel, dc_value=0.0, rest_value=0.0) -> GaussianModel:
    """gaussian_model.py:676-697: zero SH features, reset active degree."""
    return model.replace(
        params=model.params.replace(
            features_dc=jnp.full_like(model.params.features_dc, dc_value),
            features_rest=jnp.full_like(model.params.features_rest, rest_value),
        ),
        active_sh_degree=jnp.int32(0),
    )


def reset_ori_color(model: GaussianModel, key: jax.Array, reset_value=0.5, noise_level=0.05) -> GaussianModel:
    """gaussian_model.py:699+: re-init albedo around reset_value."""
    noise = (jax.random.uniform(key, model.params.ori_color.shape) - 0.5) * noise_level
    v = jnp.clip(reset_value + noise, 1e-4, 1 - 1e-4)
    return model.replace(params=model.params.replace(ori_color=inverse_sigmoid(v)))


def reset_roughness(model: GaussianModel, value=INIT_ROUGHNESS) -> GaussianModel:
    v = jnp.full_like(model.params.roughness, float(jnp.log(value / (1 - value))))
    return model.replace(params=model.params.replace(roughness=v))


def reset_refl_strength(model: GaussianModel, value=INIT_REFL) -> GaussianModel:
    v = jnp.full_like(model.params.refl_strength, float(jnp.log(value / (1 - value))))
    return model.replace(params=model.params.replace(refl_strength=v))


def get_triangles(model: GaussianModel) -> tuple[jax.Array, jax.Array]:
    """2DGS -> 2 triangles / 4 vertices per splat at 3 sigma
    (gaussian_model.py:1118+ / optix_utils.py:36-66). Returns
    (vertices (CAP*4, 3), faces (CAP*2, 3)); dead splats collapse to a point."""
    R = quat_to_rotmat(model.get_rotation)
    s = jnp.exp(model.params.scaling) * model.alive[:, None]
    tu = R[:, :, 0] * s[:, 0:1] * 3.0
    tv = R[:, :, 1] * s[:, 1:2] * 3.0
    p = model.params.xyz
    corners = jnp.stack(
        [p - tu + tv, p - tu - tv, p + tu + tv, p + tu - tv], axis=1
    )  # (CAP, 4, 3)
    cap = model.capacity
    base = jnp.arange(cap)[:, None] * 4
    f1 = base + jnp.array([[0, 1, 2]])
    f2 = base + jnp.array([[1, 3, 2]])
    faces = jnp.concatenate([f1, f2], axis=0)
    return corners.reshape(-1, 3), faces.astype(jnp.int32)
