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


def merge_sorted_zvals(z_vals, z_fine):
    """Merge two per-ray ascending-sorted depth arrays into one sorted array.

    Equivalent to ``jnp.sort(jnp.concatenate([z_vals, z_fine], -1), -1)``
    (the reference's hierarchical-union idiom, rendering.py:129-131) when
    both inputs are sorted along the last axis — but built from rank
    computation (two broadcast-compare reductions) plus two scatters of
    disjoint indices instead of XLA's O(S log^2 S) per-ray sorting network
    over the 72-wide union, which is serve-path glue at 256k-ray launches
    (docs/DESIGN.md "fine-serve dispatch"). Callers sort the small z_fine
    (n_importance wide) first; ties break with z_vals elements preceding
    equal z_fine elements, which leaves the merged *values* identical to
    the sort either way.
    """
    assert z_vals.ndim == 2 and z_fine.ndim == 2, (
        "merge_sorted_zvals is written for (N_rays, S) inputs — the rank "
        "broadcasts and row scatters below index leading dims rank-2 style; "
        f"got {z_vals.shape} / {z_fine.shape}")
    sa, sb = z_vals.shape[-1], z_fine.shape[-1]
    # stable-merge ranks: pos_a[j] = j + |{i : z_fine[i] <  z_vals[j]}|
    #                     pos_b[i] = i + |{j : z_vals[j] <= z_fine[i]}|
    # (disjoint by construction: a-elements precede equal b-elements)
    ra = jnp.sum(z_fine[:, None, :] < z_vals[:, :, None], axis=2)
    rb = jnp.sum(z_vals[:, None, :] <= z_fine[:, :, None], axis=2)
    pos_a = ra + jnp.arange(sa, dtype=ra.dtype)
    pos_b = rb + jnp.arange(sb, dtype=rb.dtype)
    rows = jnp.arange(z_vals.shape[0])[:, None]
    out = jnp.zeros(z_vals.shape[:-1] + (sa + sb,), z_vals.dtype)
    out = out.at[rows, pos_a].set(z_vals, unique_indices=True)
    out = out.at[rows, pos_b].set(z_fine, unique_indices=True)
    return out


def sample_pdf(key, bins, weights, n_importance: int, det: bool = False,
               eps: float = 1e-5):
    """Draw `n_importance` samples from the piecewise-constant PDF over `bins`.

    Mirrors rendering.py:10-49 (inverse-transform sampling via searchsorted):
      bins:    (N_rays, M+1) bin edges (the coarse z midpoints)
      weights: (N_rays, M)
    Returns samples (N_rays, n_importance). Gradients are stopped by the
    caller (the reference .detach()es the result).

    Scaling note: the prefix-mask selection below materializes an
    O(N_rays * (M+1) * n_importance) broadcast compare. At the benchmarked
    shapes (M=64, n_importance<=16) XLA fuses it and it beats the
    searchsorted+gather form on TPU; at M in the hundreds, or on the
    CPU/virtual-mesh backend, the intermediate can regress memory/time —
    prefer chunking the ray axis there rather than growing M.
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

    # TPU-shaped inverse CDF: `cdf` is nondecreasing, so the searchsorted
    # mask {j : cdf[j] <= u} is a PREFIX along j — the reference's
    # searchsorted + 4 gathers (rendering.py:30-38) reduce to masked max/min
    # reductions over a broadcast compare, with bitwise-identical selections
    # (this glue is on the serve critical path: tools/serve_nimp_probe.py
    # measured the gather form at 0.22 s per 256k-ray launch).
    mask = cdf[:, :, None] <= u[:, None, :]  # (N, M+1, n_importance)
    inf = jnp.asarray(jnp.inf, bins.dtype)

    def sel_lo(v):  # v[inds-1]: max over the true-prefix (v nondecreasing)
        return jnp.max(jnp.where(mask, v[:, :, None], -inf), axis=1)

    def sel_hi(v):  # v[clip(inds, 0, m)]: min over the false-suffix,
        # falling back to v[-1] when the suffix is empty (u >= cdf[-1])
        raw = jnp.min(jnp.where(mask, inf, v[:, :, None]), axis=1)
        return jnp.where(jnp.isinf(raw), v[:, -1:], raw)

    cdf_lo, cdf_hi = sel_lo(cdf), sel_hi(cdf)
    bin_lo, bin_hi = sel_lo(bins), sel_hi(bins)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)
