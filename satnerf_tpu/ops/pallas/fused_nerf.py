"""Fused Pallas kernel for the classic-NeRF variant (positional encoding +
ReLU trunk + view-dir rgb head).

Same design as fused_mlp.py's SIREN kernel (weights + tile resident in VMEM,
recompute-in-backward, sequential-grid f32 gradient accumulation), with the
variant's differences:

  * inputs are (N, 8): xyz(3) | view_dir(3) | pad — the positional encodings
    (60-d xyz @ 10 freqs, 24-d dir @ 4 freqs, models/nerf.py:36-69 ordering)
    are computed inside the kernel with the fast trig polynomials, so the
    600 MB of encoded points the XLA path materializes never exist;
  * ReLU activations: backward masks on the stored post-activations instead
    of cosine factors — half the residual memory of the SIREN kernel;
  * heads: sigma + feats + rgb(feats ++ enc_dir); no sun/sky/beta;
  * no input gradients (xyz/dirs are data).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from satnerf_tpu.ops.pallas.fused_mlp import (
    _dot,
    _dot_t_lhs,
    _dot_t_rhs,
    _ray_tile,
    _sample_onehot,
    fast_cos,
    fast_sin,
)

TILE = 1024
BWD_TILE = 2048


def _bwd_points(dtype):
    """Backward tile in POINTS, dtype-aware (see fused_mlp._bwd_points):
    the f32 working set is 2x bf16 and overflows the 128 MB VMEM at the
    full 2048-point tile."""
    import jax.numpy as _jnp

    return BWD_TILE // 2 if dtype == _jnp.float32 else BWD_TILE
IN_COLS = 8
OUT_COLS = 8

_ORDER = ["A", "B", "C", "bt", "Wsig", "bsig", "Wfeat", "bfeat",
          "Wrgb0h", "Wrgb0d", "brgb0", "Wrgb1", "brgb1"]


def _enc_dims(n_freqs):
    return 3 * 2 * n_freqs


def _pad_up(n, m=64):
    return -(-n // m) * m


# ------------------------------------------------------------- param packing


def pack_params(params: dict, layers: int, feat: int, skip: int,
                n_freq_xyz: int, n_freq_dir: int, dtype=jnp.bfloat16) -> dict:
    exyz = _enc_dims(n_freq_xyz)   # 60
    edir = _enc_dims(n_freq_dir)   # 24
    exyz_p = _pad_up(exyz)         # 64
    edir_p = _pad_up(edir, 32)     # 32

    def k(name):
        return params[name]["Dense_0"]["kernel"]

    def b(name):
        return params[name]["Dense_0"]["bias"]

    def pad_rows(w, rows):
        out = jnp.zeros((rows, w.shape[1]), jnp.float32)
        return out.at[: w.shape[0]].set(w)

    def pad_lanes(w, cols=128):
        out = jnp.zeros((w.shape[0], cols), jnp.float32)
        return out.at[:, : w.shape[1]].set(w)

    def pad_bias(v, cols=128):
        out = jnp.zeros((cols,), jnp.float32)
        return out.at[: v.shape[0]].set(v)

    A = pad_rows(k("fc_0"), exyz_p)
    B_list, bt = [], [b("fc_0")]
    C = jnp.zeros((exyz_p, feat), jnp.float32)
    for l in range(1, layers):
        w = k(f"fc_{l}")
        if l == skip:
            C = pad_rows(w[:exyz], exyz_p)
            B_list.append(w[exyz:])
        else:
            B_list.append(w)
        bt.append(b(f"fc_{l}"))

    wr0 = k("rgb_0")  # (feat + edir, feat//2)
    return {
        "A": A.astype(dtype),
        "B": jnp.stack(B_list).astype(dtype),
        "C": C.astype(dtype),
        "bt": jnp.stack(bt),
        "Wsig": pad_lanes(k("sigma_head")).astype(dtype),
        "bsig": pad_bias(b("sigma_head")),
        "Wfeat": k("feats_head").astype(dtype),
        "bfeat": b("feats_head"),
        "Wrgb0h": wr0[:feat].astype(dtype),
        "Wrgb0d": pad_rows(wr0[feat:], edir_p).astype(dtype),
        "brgb0": b("rgb_0"),
        "Wrgb1": pad_lanes(k("rgb_1")).astype(dtype),
        "brgb1": pad_bias(b("rgb_1")),
    }


# -------------------------------------------------------------- kernel bodies


def _posenc(x, n_freqs, padded):
    """In-kernel positional encoding, reference ordering
    (per-frequency [sin(f*x) cos(f*x)] blocks), zero-padded to `padded`."""
    parts = []
    for kf in range(n_freqs):
        f = float(2.0**kf)
        parts.append(fast_sin(f * x))
        parts.append(fast_cos(f * x))
    enc = jnp.concatenate(parts, axis=-1)
    pad = padded - enc.shape[-1]
    if pad:
        enc = jnp.concatenate(
            [enc, jnp.zeros((x.shape[0], pad), jnp.float32)], axis=-1
        )
    return enc


def _forward(xin, w, layers, skip, n_freq_xyz, n_freq_dir, rgb_padding, dtype,
             save=None):
    exyz = _enc_dims(n_freq_xyz)
    edir = _enc_dims(n_freq_dir)
    enc_x = _posenc(xin[:, 0:3], n_freq_xyz, _pad_up(exyz))
    enc_d = _posenc(xin[:, 3:6], n_freq_dir, _pad_up(edir, 32))
    exb = enc_x.astype(dtype)
    edb = enc_d.astype(dtype)

    h = jax.nn.relu(_dot(exb, w["A"]) + w["bt"][0][None, :])
    if save is not None:
        save["h"] = [h]
    for l in range(1, layers):
        pre = _dot(h.astype(dtype), w["B"][l - 1]) + w["bt"][l][None, :]
        if l == skip:
            pre = pre + _dot(exb, w["C"])
        h = jax.nn.relu(pre)
        if save is not None:
            save["h"].append(h)

    sigma_pre = _dot(h.astype(dtype), w["Wsig"]) + w["bsig"][None, :]
    sigma = jax.nn.softplus(sigma_pre[:, 0:1])
    feats = _dot(h.astype(dtype), w["Wfeat"]) + w["bfeat"][None, :]
    fb = feats.astype(dtype)

    r = jax.nn.relu(
        _dot(fb, w["Wrgb0h"]) + _dot(edb, w["Wrgb0d"]) + w["brgb0"][None, :]
    )
    rgb_s = jax.nn.sigmoid(
        _dot(r.astype(dtype), w["Wrgb1"]) + w["brgb1"][None, :]
    )
    rgb = rgb_s[:, 0:3] * (1 + 2 * rgb_padding) - rgb_padding

    if save is not None:
        save.update(enc_x=enc_x, enc_d=enc_d, feats=feats, r=r, rgb_s=rgb_s)
    return rgb, sigma


def _make_fwd_kernel(layers, skip, n_freq_xyz, n_freq_dir, rgb_padding, dtype):
    def kernel(in_ref, *w_refs):
        out_ref = w_refs[-1]
        w = {k: r[...] for k, r in zip(_ORDER, w_refs[:-1])}
        xin = in_ref[...]
        rgb, sigma = _forward(xin, w, layers, skip, n_freq_xyz, n_freq_dir,
                              rgb_padding, dtype)
        t = xin.shape[0]
        out_ref[...] = jnp.concatenate(
            [rgb, sigma, jnp.zeros((t, OUT_COLS - 4), jnp.float32)], axis=-1
        )

    return kernel


def _point_bwd_from_saves(g, w, grad_refs, sv, layers, skip, rgb_padding,
                          dtype):
    """Backprop a per-point packed cotangent `g` (N, OUT_COLS layout:
    rgb 0:3 | sigma 3) through heads + trunk using the forward saves `sv`;
    accumulate every weight grad into the resident refs. No input cotangent:
    xyz/dirs are data and the nerf variant has no trainable inputs. Shared
    by the point-mode backward kernel and the fused train-loss kernel."""
    t = g.shape[0]
    exb = sv["enc_x"].astype(dtype)
    edb = sv["enc_d"].astype(dtype)
    hb = sv["h"][layers - 1].astype(dtype)
    fb = sv["feats"].astype(dtype)

    def acc(name, val):
        grad_refs[name][...] += val

    def pad128(v):
        return jnp.concatenate(
            [v, jnp.zeros((t, 128 - v.shape[1]), jnp.float32)], axis=-1
        )

    # rgb head
    rgb_s3 = sv["rgb_s"][:, 0:3]
    d_rgb1 = pad128(g[:, 0:3] * (1 + 2 * rgb_padding)
                    * rgb_s3 * (1.0 - rgb_s3))
    acc("Wrgb1", _dot_t_lhs(sv["r"].astype(dtype), d_rgb1.astype(dtype)))
    acc("brgb1", jnp.sum(d_rgb1, axis=0))
    d_r = _dot_t_rhs(d_rgb1.astype(dtype), w["Wrgb1"]) * (sv["r"] > 0)
    acc("Wrgb0h", _dot_t_lhs(fb, d_r.astype(dtype)))
    acc("Wrgb0d", _dot_t_lhs(edb, d_r.astype(dtype)))
    acc("brgb0", jnp.sum(d_r, axis=0))
    d_feats = _dot_t_rhs(d_r.astype(dtype), w["Wrgb0h"])

    # feats + sigma
    acc("Wfeat", _dot_t_lhs(hb, d_feats.astype(dtype)))
    acc("bfeat", jnp.sum(d_feats, axis=0))
    d_h = _dot_t_rhs(d_feats.astype(dtype), w["Wfeat"])

    sigma = jax.nn.softplus(
        (_dot(hb, w["Wsig"]) + w["bsig"][None, :])[:, 0:1]
    )
    d_sig = pad128(g[:, 3:4] * (1.0 - jnp.exp(-sigma)))
    acc("Wsig", _dot_t_lhs(hb, d_sig.astype(dtype)))
    acc("bsig", jnp.sum(d_sig, axis=0))
    d_h += _dot_t_rhs(d_sig.astype(dtype), w["Wsig"])

    # trunk
    for l in range(layers - 1, 0, -1):
        d_pre = d_h * (sv["h"][l] > 0)
        h_prev = sv["h"][l - 1]
        grad_refs["B"][l - 1] += _dot_t_lhs(
            h_prev.astype(dtype), d_pre.astype(dtype)
        )
        grad_refs["bt"][l] += jnp.sum(d_pre, axis=0)
        if l == skip:
            acc("C", _dot_t_lhs(exb, d_pre.astype(dtype)))
        d_h = _dot_t_rhs(d_pre.astype(dtype), w["B"][l - 1])
    d_pre0 = d_h * (sv["h"][0] > 0)
    acc("A", _dot_t_lhs(exb, d_pre0.astype(dtype)))
    grad_refs["bt"][0] += jnp.sum(d_pre0, axis=0)


def _make_bwd_kernel(layers, skip, n_freq_xyz, n_freq_dir, rgb_padding, dtype):
    n_w = len(_ORDER)

    def kernel(in_ref, g_ref, *refs):
        w = {k: r[...] for k, r in zip(_ORDER, refs[:n_w])}
        grad_refs = {k: r for k, r in zip(_ORDER, refs[n_w:])}

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for k in _ORDER:
                grad_refs[k][...] = jnp.zeros(
                    grad_refs[k].shape, grad_refs[k].dtype
                )

        sv = {}
        _forward(in_ref[...], w, layers, skip, n_freq_xyz, n_freq_dir,
                 rgb_padding, dtype, save=sv)
        _point_bwd_from_saves(g_ref[...], w, grad_refs, sv, layers, skip,
                              rgb_padding, dtype)

    return kernel


# --------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def fused_nerf_packed(packed_list, x_in, layers, skip, n_freq_xyz, n_freq_dir,
                      rgb_padding, dtype):
    return _fwd_impl(packed_list, x_in, layers, skip, n_freq_xyz, n_freq_dir,
                     rgb_padding, dtype)


def _fwd_impl(packed_list, x_in, layers, skip, n_freq_xyz, n_freq_dir,
              rgb_padding, dtype):
    n = x_in.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    if n_pad != n:
        x_in = jnp.pad(x_in, ((0, n_pad - n), (0, 0)))
    kernel = _make_fwd_kernel(layers, skip, n_freq_xyz, n_freq_dir,
                              rgb_padding, dtype)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((TILE, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, OUT_COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )(x_in, *packed_list)
    return out[:n]


def _vjp_fwd(packed_list, x_in, layers, skip, n_freq_xyz, n_freq_dir,
             rgb_padding, dtype):
    out = _fwd_impl(packed_list, x_in, layers, skip, n_freq_xyz, n_freq_dir,
                    rgb_padding, dtype)
    return out, (packed_list, x_in)


def _vjp_bwd(layers, skip, n_freq_xyz, n_freq_dir, rgb_padding, dtype,
             residuals, g):
    packed_list, x_in = residuals
    n = x_in.shape[0]
    bt = _bwd_points(dtype)
    n_pad = ((n + bt - 1) // bt) * bt
    if n_pad != n:
        x_in = jnp.pad(x_in, ((0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    kernel = _make_bwd_kernel(layers, skip, n_freq_xyz, n_freq_dir,
                              rgb_padding, dtype)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
    grad_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
    grads = pl.pallas_call(
        kernel,
        grid=(n_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=tuple(grad_specs),
        out_shape=tuple(
            jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in packed_list
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )(x_in, g, *packed_list)
    grads = [gr.astype(p.dtype) for gr, p in zip(grads, packed_list)]
    return (grads, jnp.zeros_like(x_in[:n]))


fused_nerf_packed.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------- fused render (serving)
#
# One-kernel render for the nerf variant, mirroring fused_mlp's
# fused_render_rays: sample expansion o + d*z, positional encodings, field,
# AND alpha compositing all happen in VMEM; HBM traffic is (R, 8) rays +
# (R, S) depths in, one (R, 8) per-ray product row out. Compositor math is
# render/composite.py's non-shadow branch (reference models/nerf.py:111-132:
# no irradiance modulation, no [0,1] clip).


def _expand_rays_nerf(rays, z, sel, onehot):
    """(R, 8) rays [o(0:3) | d(3:6)] + (R, S) depths -> (R*S, 8) point
    inputs [xyz(0:3) | dir(3:6)], xyz = o + d*z. Same relayout-free matmul
    machinery as fused_mlp._expand_rays; `sel`/`onehot` come from
    fused_mlp._sample_onehot (computed once per tile, shared with the
    compositor)."""
    rb = _dot(sel, rays)                                         # (P, 8)
    z_col = jnp.sum(_dot(sel, z) * onehot, axis=1, keepdims=True)  # (P, 1)

    ri = jax.lax.broadcasted_iota(jnp.int32, (IN_COLS, IN_COLS), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (IN_COLS, IN_COLS), 1)
    keep = ((ri == ci) & (ri < 6)).astype(jnp.float32)   # o at 0:3, d at 3:6
    move_d = ((ri == ci + 3) & (ci < 3)).astype(jnp.float32)  # d -> xyz lanes
    return _dot(rb, keep) + _dot(rb, move_d) * z_col


def _composite_tile_nerf(sel, onehot, z, rgb, sigma, noise=None,
                         weights_out=False):
    """Non-shadow compositing of a (tile_r rays x S samples) tile: weights
    from sigma (+ optional training sigma noise), then per-ray
    rgb/depth/opacity integrals (no irradiance, no clip —
    render/composite.py:61-62)."""
    r, s = z.shape

    sigma_mat = _dot_t_lhs(sel, sigma * onehot)             # (R, S)
    if noise is not None:
        sigma_mat = sigma_mat + noise
    ri_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ci_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    shift_up = (ri_s == ci_s + 1).astype(jnp.float32)
    z_next = _dot(z, shift_up)
    si_r = jax.lax.broadcasted_iota(jnp.int32, (r, s), 1)
    deltas = jnp.where(si_r == s - 1, 1e10, z_next - z)

    x = deltas * jax.nn.relu(sigma_mat)
    one_m_alpha = jnp.exp(-x)
    alpha = 1.0 - one_m_alpha
    lt = jnp.log(one_m_alpha + 1e-10)
    strict_lower = (ri_s < ci_s).astype(jnp.float32)
    transparency = jnp.exp(_dot(lt, strict_lower))
    weights = alpha * transparency                          # (R, S)

    depth = jnp.sum(weights * z, axis=1, keepdims=True)
    opacity = jnp.sum(weights, axis=1, keepdims=True)
    w_pt = jnp.sum(_dot(sel, weights) * onehot, axis=1, keepdims=True)
    rgb_ray = _dot_t_lhs(sel, w_pt * rgb)                   # (R, 3)

    out = jnp.concatenate(
        [rgb_ray, depth, opacity,
         jnp.zeros((r, OUT_COLS - 5), jnp.float32)], axis=-1
    )
    if weights_out:
        return out, weights
    return out


def _make_render_kernel_rays_nerf(layers, skip, n_freq_xyz, n_freq_dir,
                                  rgb_padding, dtype, weights_out=False):
    def kernel(rays_ref, z_ref, *w_refs):
        n_out = 2 if weights_out else 1
        out_ref = w_refs[-n_out]
        w = {k: r[...] for k, r in zip(_ORDER, w_refs[:-n_out])}
        z = z_ref[...]
        r, s = z.shape
        sel, onehot = _sample_onehot(r, s)
        xin = _expand_rays_nerf(rays_ref[...], z, sel, onehot)
        rgb, sigma = _forward(xin, w, layers, skip, n_freq_xyz, n_freq_dir,
                              rgb_padding, dtype)
        res = _composite_tile_nerf(sel, onehot, z, rgb, sigma,
                                   weights_out=weights_out)
        if weights_out:
            out_ref[...], w_refs[-1][...] = res
        else:
            out_ref[...] = res

    return kernel


def fused_nerf_render_rays(params: dict, rays_o, rays_d, z_vals, *,
                           layers: int = 8, feat: int = 256, skip: int = 4,
                           n_freq_xyz: int = 10, n_freq_dir: int = 4,
                           rgb_padding: float = 0.001, dtype=jnp.bfloat16,
                           return_weights: bool = False) -> dict:
    """Serving path for the nerf variant: render rays to per-ray products
    entirely in one kernel. Returns {"rgb": (R,3), "depth": (R,),
    "opacity": (R,)} (+ "weights" (R,S) for hierarchical sampling)."""
    r, s = z_vals.shape
    rays8 = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         jnp.zeros((r, IN_COLS - 6), jnp.float32)], axis=-1,
    )
    packed = pack_params(params, layers, feat, skip, n_freq_xyz, n_freq_dir,
                         dtype)
    plist = [packed[k] for k in _ORDER]

    z = z_vals.astype(jnp.float32)
    tile_r = _ray_tile(s)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays8 = jnp.pad(rays8, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)), constant_values=1.0)

    kernel = _make_render_kernel_rays_nerf(layers, skip, n_freq_xyz,
                                           n_freq_dir, rgb_padding, dtype,
                                           weights_out=return_weights)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in plist
    ]
    out_specs = pl.BlockSpec((tile_r, OUT_COLS), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((r_pad, OUT_COLS), jnp.float32)
    if return_weights:
        out_specs = (out_specs,
                     pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((r_pad, s), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rays8, z, *plist)
    weights = None
    if return_weights:
        out, weights = out
        weights = weights[:r]
    out = out[:r]
    res = {
        "rgb": out[:, 0:3],
        "depth": out[:, 3],
        "opacity": out[:, 4],
    }
    if return_weights:
        res["weights"] = weights
    return res


# ------------------------------------------- fully fused train step (loss-in)
#
# nerf-variant analogue of fused_mlp.fused_train_loss_grads: ONE kernel for
# the whole primary-pass gradient — expansion + posenc + field + compositing
# + MSE loss + loss adjoint + compositor adjoint + field backward. The nerf
# loss is plain MSE (reference metrics.py:8-19), so there is no warm-up mix
# and no beta; solar correction does not exist for this variant.


def _composite_bwd_tile_nerf(sel, onehot, z, noise, rgb, sigma, g_ray):
    """Non-shadow compositor adjoint: per-ray cotangents (R, 8 layout:
    rgb 0:3 | depth 3 | opacity 4) -> per-point field cotangents (P, 8
    layout: rgb 0:3 | sigma 3). Same suffix-sum machinery as
    fused_mlp._composite_bwd_tile minus irradiance and the clip mask
    (render/composite.py:61-62 does not clip the non-shadow branch)."""
    r, s = z.shape

    sigma_mat = _dot_t_lhs(sel, sigma * onehot)
    if noise is not None:
        sigma_mat = sigma_mat + noise
    ri_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ci_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    shift_up = (ri_s == ci_s + 1).astype(jnp.float32)
    z_next = _dot(z, shift_up)
    si_r = jax.lax.broadcasted_iota(jnp.int32, (r, s), 1)
    deltas = jnp.where(si_r == s - 1, 1e10, z_next - z)
    x = deltas * jax.nn.relu(sigma_mat)
    one_m_alpha = jnp.exp(-x)
    alpha = 1.0 - one_m_alpha
    lt = jnp.log(one_m_alpha + 1e-10)
    strict_lower = (ri_s < ci_s).astype(jnp.float32)
    transparency = jnp.exp(_dot(lt, strict_lower))
    w_mat = alpha * transparency
    w_pt = jnp.sum(_dot(sel, w_mat) * onehot, axis=1, keepdims=True)

    g_rgb = g_ray[:, 0:3]
    g_depth = g_ray[:, 3:4]
    g_op = g_ray[:, 4:5]

    G_rgb = _dot(sel, g_rgb)                                # (P, 3)
    d_rgb_pt = w_pt * G_rgb
    d_w_pt = jnp.sum(rgb * G_rgb, axis=1, keepdims=True)

    dw = _dot_t_lhs(sel, d_w_pt * onehot) + g_depth * z + g_op
    strict_upper = (ri_s > ci_s).astype(jnp.float32)
    suffix = _dot(dw * w_mat, strict_upper)
    d_alpha = dw * transparency - suffix / (one_m_alpha + 1e-10)
    dx = d_alpha * one_m_alpha
    d_sn = dx * deltas * (sigma_mat > 0.0).astype(jnp.float32)
    d_sigma_pt = jnp.sum(_dot(sel, d_sn) * onehot, axis=1, keepdims=True)

    p = rgb.shape[0]
    return jnp.concatenate(
        [d_rgb_pt, d_sigma_pt, jnp.zeros((p, OUT_COLS - 4), jnp.float32)],
        axis=-1,
    )


def _make_train_loss_bwd_kernel_nerf(layers, skip, n_freq_xyz, n_freq_dir,
                                     rgb_padding, dtype, n_total, tile_r):
    n_w = len(_ORDER)

    def kernel(rays_ref, z_ref, noise_ref, gt_ref, *refs):
        w = {k: r[...] for k, r in zip(_ORDER, refs[:n_w])}
        loss_ref = refs[n_w]
        grad_refs = {k: r for k, r in zip(_ORDER, refs[n_w + 1:])}

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
            for k in _ORDER:
                grad_refs[k][...] = jnp.zeros(
                    grad_refs[k].shape, grad_refs[k].dtype
                )

        z = z_ref[...]
        r_rows, s = z.shape
        noise = noise_ref[...]
        sel, onehot = _sample_onehot(r_rows, s)
        xin = _expand_rays_nerf(rays_ref[...], z, sel, onehot)

        # one forward recompute serves loss, compositor adjoint, and backprop
        sv = {}
        rgb_pt, sigma = _forward(xin, w, layers, skip, n_freq_xyz, n_freq_dir,
                                 rgb_padding, dtype, save=sv)
        out = _composite_tile_nerf(sel, onehot, z, rgb_pt, sigma, noise=noise)
        rgb_ray = out[:, 0:3]

        # ---- MSE loss + adjoint (masked against ray padding)
        gi = (step * tile_r
              + jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0))
        valid = (gi < n_total).astype(jnp.float32)
        gt = gt_ref[:, 0:3]
        diff = rgb_ray - gt
        sq = jnp.sum(diff * diff, axis=1, keepdims=True)
        s_mse = jnp.sum(valid * sq)

        ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        ci8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        loss_ref[...] += jnp.where(
            (ri8 == 0) & (ci8 == 0), s_mse, jnp.zeros((8, 128), jnp.float32)
        )

        g_rgb = valid * diff * (2.0 / (3.0 * n_total))
        g_ray = jnp.concatenate(
            [g_rgb, jnp.zeros((r_rows, OUT_COLS - 3), jnp.float32)], axis=-1
        )
        g_pt = _composite_bwd_tile_nerf(sel, onehot, z, noise, rgb_pt, sigma,
                                        g_ray)
        _point_bwd_from_saves(g_pt, w, grad_refs, sv, layers, skip,
                              rgb_padding, dtype)

    return kernel


def fused_nerf_train_loss_grads(params: dict, rays_o, rays_d, z_vals, noise,
                                gt_rgb, *, layers: int = 8, feat: int = 256,
                                skip: int = 4, n_freq_xyz: int = 10,
                                n_freq_dir: int = 4,
                                rgb_padding: float = 0.001,
                                dtype=jnp.bfloat16):
    """nerf-variant primary-pass loss + gradients in ONE kernel launch.

    Returns (mse, param_grads): the scalar MSE loss (reference
    metrics.py:8-19) and the flax pytree gradient for `params` (pulled back
    through pack_params with jax.vjp — the packing is plain differentiable
    jnp, so its transpose is XLA glue of negligible cost)."""
    r, s = z_vals.shape
    rays8 = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         jnp.zeros((r, IN_COLS - 6), jnp.float32)], axis=-1,
    )
    z = z_vals.astype(jnp.float32)
    if noise is None:
        noise = jnp.zeros((r, s), jnp.float32)
    gt8 = jnp.concatenate(
        [gt_rgb.astype(jnp.float32),
         jnp.zeros((r, IN_COLS - 3), jnp.float32)], axis=-1,
    )

    def pack(p):
        packed = pack_params(p, layers, feat, skip, n_freq_xyz, n_freq_dir,
                             dtype)
        return [packed[k] for k in _ORDER]

    plist, pack_vjp = jax.vjp(pack, params)

    tile_r = max(8, (_bwd_points(dtype) // s) // 8 * 8)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays8 = jnp.pad(rays8, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)), constant_values=1.0)
        noise = jnp.pad(noise, ((0, r_pad - r), (0, 0)))
        gt8 = jnp.pad(gt8, ((0, r_pad - r), (0, 0)))

    kernel = _make_train_loss_bwd_kernel_nerf(layers, skip, n_freq_xyz,
                                              n_freq_dir, rgb_padding, dtype,
                                              r, tile_r)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in plist
    ]
    grad_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in plist
    ]
    loss_acc, *grads = pl.pallas_call(
        kernel,
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *grad_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            *(jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in plist),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )(rays8, z, noise, gt8, *plist)

    mse = loss_acc[0, 0] / (3.0 * r)
    (param_grads,) = pack_vjp([g.astype(p.dtype)
                               for g, p in zip(grads, plist)])
    return mse, param_grads


def fused_nerf_apply(params: dict, xyz, view_dir, *, layers: int = 8,
                     feat: int = 256, skip: int = 4, n_freq_xyz: int = 10,
                     n_freq_dir: int = 4, rgb_padding: float = 0.001,
                     dtype=jnp.bfloat16) -> dict:
    """Drop-in replacement for RadianceField.apply on the 'nerf' variant."""
    lead = xyz.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    vd = (view_dir.reshape(n, 3).astype(jnp.float32)
          if view_dir is not None else jnp.zeros((n, 3), jnp.float32))
    x_in = jnp.concatenate(
        [xyz.reshape(n, 3).astype(jnp.float32), vd,
         jnp.zeros((n, IN_COLS - 6), jnp.float32)], axis=-1,
    )
    packed = pack_params(params, layers, feat, skip, n_freq_xyz, n_freq_dir,
                         dtype)
    plist = [packed[k] for k in _ORDER]
    out = fused_nerf_packed(plist, x_in, layers, skip, n_freq_xyz, n_freq_dir,
                            rgb_padding, dtype)
    return {
        "rgb": out[:, 0:3].reshape(*lead, 3),
        "sigma": out[:, 3].reshape(*lead),
    }
