"""Golden-gradient parity: autodiff through the composite loss must equal
the reference's analytically derived backward (SURVEY.md §4; the hand
math is compute_loss_kernel_train_nerf, testbed_nerf.cu:1062-1115):

  dL/d(rgb_raw_j)   = w_j * dL/drgb * act'(raw_j)
  dL/d(sigma_raw_j) = act'(sigma_j) * dt_j * <dL/drgb, T_j*rgb_j - suffix_j>

with w_j = alpha_j * T_j, suffix_j = sum_{k>j} w_k rgb_k.
"""

import jax
import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.nerf.march import unwarp_dt, warp_dt
from instant_ngp_tpu.nerf.sampler import RayBatch, SampleBatch
from instant_ngp_tpu.nerf.training import composite_loss
from instant_ngp_tpu.ops.losses import LossType


def identity_samples(mask: np.ndarray) -> SampleBatch:
    """A SampleBatch whose candidate grid IS the (R, K) padded grid:
    flat sample i = candidate (i // K, i % K); masked-out candidates
    carry no kept sample. Only the fields composite_loss reads
    (cand_slot / cand_src) matter here."""
    r, k = mask.shape
    s = r * k
    flat = np.arange(s, dtype=np.int32)
    cand_slot = jnp.asarray(
        np.where(mask, flat.reshape(r, k), s).astype(np.int32))
    dummy = jnp.zeros(s)
    dummy3 = (dummy, dummy, dummy)
    return SampleBatch(dummy3, dummy3, dummy, dummy,
                       jnp.asarray(flat // k),
                       jnp.arange(r, dtype=jnp.int32) * k,
                       jnp.asarray(mask.sum(1).astype(np.int32)),
                       jnp.asarray(np.int32(s)), cand_slot,
                       jnp.asarray(flat))


def make_case(n_rays=4, k=6, seed=0):
    rng = np.random.RandomState(seed)
    raw = rng.randn(4, n_rays, k).astype(np.float32) * 0.5
    mask = np.ones((n_rays, k), bool)
    mask[1, 4:] = False                     # one short ray
    dts = rng.uniform(0.002, 0.01, (n_rays, k)).astype(np.float32)
    dt_padded = np.asarray(warp_dt(jnp.asarray(dts)))
    t_padded = np.cumsum(dts, axis=1).astype(np.float32)
    rgba = rng.rand(n_rays, 4).astype(np.float32)
    rgba[:, 3] = 1.0                        # opaque targets
    rays = RayBatch(
        origins=jnp.zeros((n_rays, 3)), dirs=jnp.zeros((n_rays, 3)),
        t_start=jnp.zeros(n_rays), img_idx=jnp.zeros(n_rays, jnp.int32),
        uv=jnp.zeros((n_rays, 2)), rgba=jnp.asarray(rgba),
        valid=jnp.ones(n_rays, bool))
    bg = np.full((n_rays, 3), 0.3, np.float32)
    exposure = np.zeros((n_rays, 3), np.float32)
    return raw, mask, dt_padded, t_padded, rays, bg, exposure, dts, rgba


def reference_backward(raw, mask, dts, rgba, bg, loss_type="L2"):
    """Hand implementation of the reference's analytic gradient, fp64."""
    n_rays, k = raw.shape[1:]
    sigmoid = lambda x: 1 / (1 + np.exp(-x))
    rgb = sigmoid(raw[:3].astype(np.float64))           # Logistic
    sigma = np.exp(raw[3].astype(np.float64))           # Exponential
    alpha = np.where(mask, 1 - np.exp(-sigma * dts), 0.0)
    T = np.ones((n_rays, k + 1))
    for j in range(k):
        T[:, j + 1] = T[:, j] * (1 - alpha[:, j])
    w = alpha * T[:, :k]
    rgb_ray = np.einsum("nk,cnk->cn", w, rgb)
    # all rays finish (no epsilon cutoff in this tiny case)
    bg_srgb = np.where(bg.T <= 0.0031308, 12.92 * bg.T,
                       1.055 * bg.T ** (1 / 2.4) - 0.055)
    rgb_ray = rgb_ray + T[:, k] * bg_srgb
    # sRGB-space target (alpha=1 path)
    tex = rgba[:, :3].T.astype(np.float64)
    target = np.where(tex <= 0.0031308, 12.92 * tex,
                      1.055 * tex ** (1 / 2.4) - 0.055)
    # L2: dL/drgb_ray = 2 (pred - target); loss normalized by 3*n_rays
    dl_drgb = 2 * (rgb_ray - target) / (3 * n_rays)

    g_rgb = np.zeros_like(rgb)
    g_sigma = np.zeros_like(sigma)
    for n in range(n_rays):
        suffix = np.zeros(3)
        for j in reversed(range(k)):
            if not mask[n, j]:
                continue
            c_j = rgb[:, n, j]
            # color gradient: w_j * dL/drgb * act'(raw)
            act_d = c_j * (1 - c_j)
            g_rgb[:, n, j] = w[n, j] * dl_drgb[:, n] * act_d
            # density gradient incl. the background as part of the suffix
            # (T_final * bg depends on alpha_j too)
            # note the reference multiplies T by (1-alpha_j) BEFORE the
            # gradient line, so its `T` is the post-sample transmittance
            total_suffix = suffix + T[n, k] * bg_srgb[:, n]
            g_sigma[n, j] = sigma[n, j] * dts[n, j] * np.dot(
                dl_drgb[:, n], T[n, j + 1] * c_j - total_suffix)
            suffix = suffix + w[n, j] * c_j
    return g_rgb, g_sigma


def test_autodiff_matches_analytic_backward():
    raw, mask, dt_padded, t_padded, rays, bg, exposure, dts, rgba = \
        make_case()

    samples = identity_samples(mask)

    def loss_of(raw_flat):
        channels = tuple(raw_flat[i].reshape(-1) for i in range(4))
        res = composite_loss(
            channels, samples, jnp.asarray(t_padded), jnp.asarray(dts),
            rays, jnp.asarray(bg),
            jnp.asarray(exposure), "Logistic", "Exponential",
            LossType.L2, jnp.asarray(1.0),  # mean density high: no L1 reg
            0.0)
        return res.loss_for_grad

    g = np.asarray(jax.grad(loss_of)(jnp.asarray(raw)))
    g_rgb_ref, g_sigma_ref = reference_backward(raw, mask, dts, rgba, bg)

    np.testing.assert_allclose(g[:3], g_rgb_ref, rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(g[3], g_sigma_ref, rtol=2e-4, atol=1e-8)
