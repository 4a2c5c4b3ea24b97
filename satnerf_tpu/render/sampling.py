"""Depth sampling along rays: stratified coarse samples + hierarchical
inverse-CDF resampling for the fine pass.

Pure functions with explicit PRNG keys — the functional replacement for the
reference's stateful torch.rand calls (rendering.py:65-78, 10-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_zvals(key, near, far, n_samples: int, perturb: float = 1.0,
                     use_disp: bool = False):
    """Sample depths linearly in [near, far] with stratified perturbation.

    Mirrors rendering.py:65-78: midpoint bins, uniform jitter within each bin.
    near/far: (N_rays, 1). Returns z_vals (N_rays, n_samples).
    """
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if use_disp:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    else:
        z_vals = near * (1.0 - z_steps) + far * z_steps  # (N_rays, n_samples)

    if perturb > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
        u = perturb * jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * u
    return z_vals


def sample_pdf(key, bins, weights, n_importance: int, det: bool = False,
               eps: float = 1e-5):
    """Draw `n_importance` samples from the piecewise-constant PDF over `bins`.

    Mirrors rendering.py:10-49 (inverse-transform sampling via searchsorted):
      bins:    (N_rays, M+1) bin edges (the coarse z midpoints)
      weights: (N_rays, M)
    Returns samples (N_rays, n_importance). Gradients are stopped by the
    caller (the reference .detach()es the result).
    """
    n_rays, m = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=bins.dtype)

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, m)
    above = jnp.clip(inds, 0, m)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=1)
    bin_lo = jnp.take_along_axis(bins, below, axis=1)
    bin_hi = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)
