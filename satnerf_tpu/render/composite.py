"""Alpha compositing along rays (the volume-rendering quadrature).

Pure-jnp reimplementation of the per-variant `inference` compositors
(reference models/nerf.py:111-132, snerf.py:48-75, satnerf.py:44-79):

  deltas_i = z_{i+1} - z_i (last = 1e10)
  alpha_i  = 1 - exp(-delta_i * relu(sigma_i + noise))
  T_i      = prod_{j<i} (1 - alpha_j + 1e-10)
  w_i      = alpha_i * T_i
  rgb      = sum_i w_i * c_i [* irradiance_i]     (irradiance for shadow variants)
  depth    = sum_i w_i * z_i

The shadow variants modulate albedo by irradiance = sun_v + (1-sun_v)*sky_rgb
(eq. 2 of the S-NeRF paper) and clamp the final rgb to [0, 1].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ray_weights(sigmas, z_vals, noise=None):
    """(alphas, transparency, weights) from per-sample densities.

    sigmas, z_vals: (N_rays, S). noise: optional (N_rays, S) sigma noise.
    """
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)

    if noise is not None:
        sigmas = sigmas + noise
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    transparency = jnp.cumprod(shifted, axis=-1)[:, :-1]
    weights = alphas * transparency
    return alphas, transparency, weights


def composite(out: dict, z_vals, noise=None, shadow: bool = False) -> dict:
    """Composite per-sample model outputs `out` into per-ray quantities.

    out: dict with rgb (N,S,3), sigma (N,S) and optionally sun_v (N,S,1),
         sky_rgb (N,S,3), beta (N,S,1).
    Returns rgb (N,3), depth (N,), weights/transparency (N,S), plus the
    per-sample extras passed through (albedo/sun/sky/beta) for the losses
    and debug products, exactly like the reference result dicts.
    """
    _, transparency, weights = ray_weights(out["sigma"], z_vals, noise)
    depth = jnp.sum(weights * z_vals, axis=-1)

    if shadow:
        irradiance = out["sun_v"] + (1.0 - out["sun_v"]) * out["sky_rgb"]
        rgb = jnp.sum(weights[..., None] * out["rgb"] * irradiance, axis=-2)
        rgb = jnp.clip(rgb, 0.0, 1.0)
    else:
        rgb = jnp.sum(weights[..., None] * out["rgb"], axis=-2)

    result = {
        "rgb": rgb,
        "depth": depth,
        "weights": weights,
        "transparency": transparency,
    }
    if shadow:
        result["albedo"] = out["rgb"]
        result["sun"] = out["sun_v"]
        result["sky"] = out["sky_rgb"]
    if "beta" in out:
        result["beta"] = out["beta"]
    return result
