"""Fused radiance-field Pallas kernel for the SIREN (no-posenc) variants.

Why: profiling the XLA train step shows it is HBM-bandwidth bound — every
Dense layer round-trips its (N, 512) activations through HBM, and the
backward pass triples that traffic (52 GB of HLO temps at batch 64k). This
kernel keeps ALL weights (~5 MB bf16) and a tile of activations resident in
VMEM (~128 MB on v5e) and streams point tiles through the whole network:
HBM traffic drops to inputs (16 f32/point) + outputs (16 f32/point) +
one weight-gradient flush.

Architecture fused (exactly the s-nerf / sat-nerf RadianceField,
models/nerf.py): L-layer SIREN trunk with skip-concat of xyz at layer
`skip`, sigma/feats heads, rgb head, sun-visibility head, sky head, and
(sat-nerf) the beta head.

Layout: per-point inputs are packed as (N, 16) f32:
    cols 0:3 xyz | 3:6 sun_dir | 6:6+tau t_embed | rest zero
outputs as (N, 16) f32:
    cols 0:3 rgb | 3 sigma | 4 sun_v | 5:8 sky | 8 beta | rest zero

The custom VJP recomputes the forward inside the backward kernel (nothing is
saved between passes but inputs and weights) and accumulates all weight
gradients in f32 VMEM across the sequential TPU grid, flushing once.
t_embed input gradients (the only trainable input) come back via the packed
(N, 16) input-cotangent.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

TILE = 1024       # point-mode forward tile (2048 benches 2% slower)
RAY_FWD_TILE = int(_os.environ.get("SATNERF_RAY_TILE", 1024))
                  # ray-mode forward tile (serve/render kernels), in POINTS
                  # (rays/tile = RAY_FWD_TILE // n_samples). 1024 wins at
                  # every serving batch size measured on the chip (r2):
                  # at 256k-ray batches 415k rays/s vs 364k @2048; at 64k
                  # batches 352k vs 337k @4096 (8192 also ~25 min compile).
                  # Bigger tiles only help the bare kernel (+7-10%) — through
                  # the sharded eval surface the shorter grid steps pipeline
                  # better with the surrounding XLA. Env-overridable for
                  # experiments: SATNERF_RAY_TILE.
BWD_TILE = 2048   # backward tile: deeper K for the weight-grad matmuls
                  # (4096 overflows VMEM even with compute-dtype residuals —
                  # the working set of live d_h/d_pre tensors dominates)


def _bwd_points(dtype) -> int:
    """Backward tile in POINTS, dtype-aware: the scoped-VMEM working set
    (weights + grad accumulators + live d_h/d_pre tensors) scales with the
    element size — 2048 points fit at bf16 (~70 MB) but overflow the 128 MB
    VMEM at f32 (~140 MB, measured compile failure at 8x512). f32 runs get
    half the tile."""
    return BWD_TILE // 2 if dtype == jnp.float32 else BWD_TILE
IN_COLS = 16
OUT_COLS = 16


def _f32(x):
    return x.astype(jnp.float32)


# Fast trig: XLA's sin/cos lower to ~20G ops/s on the v5e VPU, and the SIREN
# trunk needs ~5k transcendentals per point — they dominate the fused kernel
# (~70% of forward time). These minimax polynomials (max abs err 1.7e-5 for
# sin, 2.4e-6 for cos — far below bf16 resolution) with one round-based range
# reduction run ~4x faster.
_TWO_PI = 6.283185307179586
_INV_TWO_PI = 0.15915494309189535
_SIN_C = (9.99984593e-01, -1.66632594e-01, 8.31238828e-03,
          -1.93162699e-04, 2.17325696e-06)
_COS_C = (9.99999444e-01, -4.99995582e-01, 4.16610335e-02,
          -1.38627500e-03, 2.42532299e-05, -2.21941298e-07)


_TRIG_ABLATE = _os.environ.get("SATNERF_TRIG_ABLATE", "") == "1"


def fast_sin(x):
    x = x.astype(jnp.float32)  # Mosaic has no bf16 roundeven lowering
    if _TRIG_ABLATE:  # perf probe only: wrong math, measures the trig stall
        return x * 0.25
    y = x - _TWO_PI * jnp.round(x * _INV_TWO_PI)
    y2 = y * y
    p = _SIN_C[4]
    for c in (_SIN_C[3], _SIN_C[2], _SIN_C[1], _SIN_C[0]):
        p = p * y2 + c
    return y * p


def fast_cos(x):
    x = x.astype(jnp.float32)  # Mosaic has no bf16 roundeven lowering
    if _TRIG_ABLATE:  # perf probe only: wrong math, measures the trig stall
        return x * 0.25 + 0.5
    y = x - _TWO_PI * jnp.round(x * _INV_TWO_PI)
    y2 = y * y
    p = _COS_C[5]
    for c in (_COS_C[4], _COS_C[3], _COS_C[2], _COS_C[1], _COS_C[0]):
        p = p * y2 + c
    return p


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t_lhs(a, b):
    """a^T @ b contracting the tile axis: (T, M)^T x (T, N) -> (M, N)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t_rhs(a, b):
    """a @ b^T: (T, N) x (M, N)^T -> (T, M)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


# ------------------------------------------------------------- param packing


def pack_params(params: dict, layers: int, feat: int, skip: int,
                use_beta: bool, tau: int, dtype=jnp.bfloat16) -> dict:
    """Flax RadianceField params -> kernel weight arrays.

    Matmul weights are padded so every contraction input comes from either the
    (16,) packed input row or an (F,)/(Fh,) activation row; tiny head outputs
    are padded to 128 lanes.
    """
    fh = feat // 2

    def k(name):
        return params[name]["Dense_0"]["kernel"]

    def b(name):
        return params[name]["Dense_0"]["bias"]

    def pad_in16(w, row0):
        """(r, C) -> (16, C) with the rows placed at row0."""
        out = jnp.zeros((IN_COLS, w.shape[1]), jnp.float32)
        return out.at[row0 : row0 + w.shape[0]].set(w)

    def narrow_t(w):
        """Narrow-head weight (K, nout<=3) -> transposed (16, K).

        Narrow heads run on the VPU (lane-reduction forward, (T, 16)
        wgrad matmul) instead of padding 1-3 useful output columns to a
        128-lane MXU matmul. Measured end-to-end perf-neutral (139.5k vs
        139.2k train, 412.6k vs 392.9-417k serve — the padded matmuls
        were hidden under the VPU critical path), kept because it frees
        MXU cycles and ~1 MB of VMEM-resident weight padding."""
        out = jnp.zeros((IN_COLS, w.shape[0]), jnp.float32)
        return out.at[: w.shape[1]].set(w.T)

    def pad_lanes(w, cols=128):
        out = jnp.zeros((w.shape[0], cols), jnp.float32)
        return out.at[:, : w.shape[1]].set(w)

    def pad_bias(v, cols=128):
        out = jnp.zeros((cols,), jnp.float32)
        return out.at[: v.shape[0]].set(v)

    A = pad_in16(k("fc_0"), 0)  # xyz rows
    B_list, bt = [], [b("fc_0")]
    C = jnp.zeros((IN_COLS, feat), jnp.float32)
    for l in range(1, layers):
        w = k(f"fc_{l}")
        if l == skip:
            # input was concat([xyz, h]): first 3 rows act on xyz
            C = pad_in16(w[:3], 0)
            B_list.append(w[3:])
        else:
            B_list.append(w)
        bt.append(b(f"fc_{l}"))
    packed = {
        "A": A.astype(dtype),
        "B": jnp.stack(B_list).astype(dtype),  # (L-1, F, F)
        "C": C.astype(dtype),
        "bt": jnp.stack(bt),  # (L, F) f32
        "Wsig": narrow_t(k("sigma_head")).astype(dtype),
        "bsig": pad_bias(b("sigma_head")),
        "Wfeat": k("feats_head").astype(dtype),
        "bfeat": b("feats_head"),
        "Wrgb0": k("rgb_0").astype(dtype),
        "brgb0": b("rgb_0"),
        "Wrgb1": narrow_t(k("rgb_1")).astype(dtype),
        "brgb1": pad_bias(b("rgb_1")),
        "Wsun0h": k("sun_v_0")[:feat].astype(dtype),
        "Wsun0d": pad_in16(k("sun_v_0")[feat:], 3).astype(dtype),  # sun rows
        "bsun0": b("sun_v_0"),
        "Wsun1": k("sun_v_1").astype(dtype),
        "bsun1": b("sun_v_1"),
        "Wsun2": k("sun_v_2").astype(dtype),
        "bsun2": b("sun_v_2"),
        "Wsun3": narrow_t(k("sun_v_out")).astype(dtype),
        "bsun3": pad_bias(b("sun_v_out")),
        "Wsky0": pad_in16(k("sky_0"), 3).astype(dtype),
        "bsky0": b("sky_0"),
        "Wsky1": narrow_t(k("sky_1")).astype(dtype),
        "bsky1": pad_bias(b("sky_1")),
    }
    if use_beta:
        packed["Wbeta0h"] = k("beta_0")[:feat].astype(dtype)
        packed["Wbeta0t"] = pad_in16(k("beta_0")[feat:], 6).astype(dtype)
        packed["bbeta0"] = b("beta_0")
        packed["Wbeta1"] = narrow_t(k("beta_1")).astype(dtype)
        packed["bbeta1"] = pad_bias(b("beta_1"))
    return packed


def unpack_grads(g: dict, params: dict, layers: int, feat: int, skip: int,
                 use_beta: bool) -> dict:
    """Packed weight-grad arrays -> flax param-pytree cotangent."""

    def dense(kernel, bias):
        return {"Dense_0": {"kernel": kernel, "bias": bias}}

    out = {}
    out["fc_0"] = dense(g["A"][:3], g["bt"][0])
    for l in range(1, layers):
        w = g["B"][l - 1]
        if l == skip:
            w = jnp.concatenate([g["C"][:3], w], axis=0)
        out[f"fc_{l}"] = dense(w, g["bt"][l])
    out["sigma_head"] = dense(g["Wsig"][:1].T, g["bsig"][:1])
    out["feats_head"] = dense(g["Wfeat"], g["bfeat"])
    out["rgb_0"] = dense(g["Wrgb0"], g["brgb0"])
    out["rgb_1"] = dense(g["Wrgb1"][:3].T, g["brgb1"][:3])
    out["sun_v_0"] = dense(
        jnp.concatenate([g["Wsun0h"], g["Wsun0d"][3:6]], axis=0), g["bsun0"]
    )
    out["sun_v_1"] = dense(g["Wsun1"], g["bsun1"])
    out["sun_v_2"] = dense(g["Wsun2"], g["bsun2"])
    out["sun_v_out"] = dense(g["Wsun3"][:1].T, g["bsun3"][:1])
    out["sky_0"] = dense(g["Wsky0"][3:6], g["bsky0"])
    out["sky_1"] = dense(g["Wsky1"][:3].T, g["bsky1"][:3])
    if use_beta:
        tau = params["beta_0"]["Dense_0"]["kernel"].shape[0] - feat
        out["beta_0"] = dense(
            jnp.concatenate([g["Wbeta0h"], g["Wbeta0t"][6 : 6 + tau]], axis=0),
            g["bbeta0"],
        )
        out["beta_1"] = dense(g["Wbeta1"][:1].T, g["bbeta1"][:1])
    return out


_PACKED_ORDER = [
    "A", "B", "C", "bt", "Wsig", "bsig", "Wfeat", "bfeat", "Wrgb0", "brgb0",
    "Wrgb1", "brgb1", "Wsun0h", "Wsun0d", "bsun0", "Wsun1", "bsun1", "Wsun2",
    "bsun2", "Wsun3", "bsun3", "Wsky0", "bsky0", "Wsky1", "bsky1",
    "Wbeta0h", "Wbeta0t", "bbeta0", "Wbeta1", "bbeta1",
]


def _order(packed: dict):
    return [packed[k] for k in _PACKED_ORDER if k in packed]


# ----------------------------------------------------------- forward kernel


def _trunk_fwd(xin, refs, layers, skip, dtype, save=None):
    """Run the trunk; optionally record (cos_factor, post) per layer."""
    (A, B, C, bt) = refs
    xb = xin.astype(dtype)
    pre = _dot(xb, A) + bt[0][None, :]
    if save is not None:
        # residuals stay f32: Mosaic lacks bf16 lowerings for the comparisons
        # and rounds the backward needs, so compute-dtype residuals (which
        # would allow BWD_TILE=4096) are not currently expressible
        save[0] = (30.0 * fast_cos(30.0 * pre), None)
    h = fast_sin(30.0 * pre)
    for l in range(1, layers):
        pre = _dot(h.astype(dtype), B[l - 1]) + bt[l][None, :]
        if l == skip:
            pre = pre + _dot(xb, C)
        if save is not None:
            save[l] = (fast_cos(pre), h)
        h = fast_sin(pre)
    return h


def _narrow_fwd(x, w_t, bias, nout, dtype):
    """Narrow head on the VPU: (T, K) @ transposed (16, K) weights ->
    (T, nout), nout <= 3. A broadcast-multiply + lane reduction per output
    column replaces a (K, 128)-padded MXU matmul whose useful width was
    1-3 lanes (inputs round-trip through `dtype` so the numerics match the
    bf16 matmul it replaces)."""
    xf = _f32(x.astype(dtype))
    cols = [jnp.sum(xf * _f32(w_t[j : j + 1, :]), axis=1, keepdims=True)
            for j in range(nout)]
    pre = cols[0] if nout == 1 else jnp.concatenate(cols, axis=1)
    # reshape-then-slice: bias[None, :nout] routes through jnp's gather
    # path, which Mosaic only lowers in 2D — slice the 2D view instead
    return pre + jnp.reshape(bias, (1, -1))[:, :nout]


def _heads_fwd(xin, h, w, use_beta, rgb_padding, dtype, save=None):
    """All heads; optionally record intermediates for backward."""
    xb = xin.astype(dtype)
    hb = h.astype(dtype)
    sigma_pre = _narrow_fwd(h, w["Wsig"], w["bsig"], 1, dtype)
    sigma = jax.nn.softplus(sigma_pre)

    feats = _dot(hb, w["Wfeat"]) + w["bfeat"][None, :]
    fb = feats.astype(dtype)

    r_pre = _dot(fb, w["Wrgb0"]) + w["brgb0"][None, :]
    r = fast_sin(r_pre)
    rgb_s = jax.nn.sigmoid(_narrow_fwd(r, w["Wrgb1"], w["brgb1"], 3, dtype))
    rgb = rgb_s * (1 + 2 * rgb_padding) - rgb_padding

    s0_pre = _dot(fb, w["Wsun0h"]) + _dot(xb, w["Wsun0d"]) + w["bsun0"][None, :]
    s0 = fast_sin(s0_pre)
    s1_pre = _dot(s0.astype(dtype), w["Wsun1"]) + w["bsun1"][None, :]
    s1 = fast_sin(s1_pre)
    s2_pre = _dot(s1.astype(dtype), w["Wsun2"]) + w["bsun2"][None, :]
    s2 = fast_sin(s2_pre)
    sunv = jax.nn.sigmoid(_narrow_fwd(s2, w["Wsun3"], w["bsun3"], 1, dtype))

    skyh = jax.nn.relu(_dot(xb, w["Wsky0"]) + w["bsky0"][None, :])
    sky = jax.nn.sigmoid(_narrow_fwd(skyh, w["Wsky1"], w["bsky1"], 3, dtype))

    beta = bh = None
    if use_beta:
        bh_pre = (_dot(fb, w["Wbeta0h"]) + _dot(xb, w["Wbeta0t"])
                  + w["bbeta0"][None, :])
        bh = fast_sin(bh_pre)
        beta = jax.nn.softplus(
            _narrow_fwd(bh, w["Wbeta1"], w["bbeta1"], 1, dtype)
        )

    if save is not None:
        save.update(
            sigma_pre=sigma_pre, feats=feats, r_pre=r_pre, r=r, rgb_s=rgb_s,
            s0_pre=s0_pre, s0=s0, s1_pre=s1_pre, s1=s1, s2_pre=s2_pre, s2=s2,
            sunv=sunv, skyh=skyh, sky=sky, bh_pre=bh_pre if use_beta else None,
            bh=bh, beta=beta,
        )
    return rgb, sigma, sunv, sky, beta


def _make_fwd_kernel(layers, skip, use_beta, rgb_padding, dtype):
    def kernel(in_ref, *w_refs):
        out_ref = w_refs[-1]
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        w = {k: r[...] for k, r in zip(names, w_refs[:-1])}
        xin = in_ref[...]
        h = _trunk_fwd(xin, (w["A"], w["B"], w["C"], w["bt"]), layers, skip,
                       dtype)
        rgb, sigma, sunv, sky, beta = _heads_fwd(
            xin, h, w, use_beta, rgb_padding, dtype
        )
        t_rows = xin.shape[0]
        beta_col = beta if use_beta else jnp.zeros((t_rows, 1), jnp.float32)
        out_ref[...] = jnp.concatenate(
            [rgb, sigma, sunv, sky, beta_col,
             jnp.zeros((t_rows, OUT_COLS - 9), jnp.float32)], axis=-1
        )

    return kernel


# ---------------------------------------------------------- backward kernel


def _fwd_saves(xin, w, layers, skip, use_beta, rgb_padding, dtype):
    """Forward recompute with residuals: returns (trunk output h, per-layer
    trunk saves, head saves). Shared by the backward kernels so the train
    compositor backward can reuse ONE recompute for both the compositor
    cotangents and the field backprop."""
    trunk_save = [None] * layers
    h = _trunk_fwd(xin, (w["A"], w["B"], w["C"], w["bt"]), layers, skip,
                   dtype, save=trunk_save)
    hs = {}
    _heads_fwd(xin, h, w, use_beta, rgb_padding, dtype, save=hs)
    return h, trunk_save, hs


def _point_bwd_body(xin, g, w, grad_refs, layers, skip, use_beta,
                    rgb_padding, dtype):
    """Shared backward body: recompute forward for a tile of point inputs,
    accumulate all weight grads into the resident refs, return the per-point
    input cotangent (N, IN_COLS). Used by both the point-mode and ray-mode
    backward kernels."""
    h, trunk_save, hs = _fwd_saves(xin, w, layers, skip, use_beta,
                                   rgb_padding, dtype)
    return _point_bwd_from_saves(xin, g, w, grad_refs, h, trunk_save, hs,
                                 layers, skip, use_beta, rgb_padding, dtype)


def _point_bwd_from_saves(xin, g, w, grad_refs, h, trunk_save, hs, layers,
                          skip, use_beta, rgb_padding, dtype):
    """Backprop a per-point packed cotangent `g` (N, OUT_COLS layout:
    rgb 0:3 | sigma 3 | sun_v 4 | sky 5:8 | beta 8) through heads + trunk
    using precomputed forward saves; accumulate weight grads, return d_in."""
    xb = xin.astype(dtype)
    fb = hs["feats"].astype(dtype)
    hb = h.astype(dtype)

    def acc(name, val):
        grad_refs[name][...] += val

    t_rows = xin.shape[0]

    def pad128(v):
        return jnp.concatenate(
            [v, jnp.zeros((t_rows, 128 - v.shape[1]), jnp.float32)],
            axis=-1,
        )

    def pad16(v):
        return jnp.concatenate(
            [v, jnp.zeros((t_rows, IN_COLS - v.shape[1]), jnp.float32)],
            axis=-1,
        )

    def narrow_bwd(d_pre, x_save, wname, bname):
        """Narrow-head backward: (T, nout) cotangent -> accumulate the
        transposed (16, K) wgrad as ONE skinny matmul (vs a (K, 128)
        padded output before) + the bias grad, return d_x via a K=16
        matmul against the transposed weights."""
        d16 = pad16(d_pre).astype(dtype)
        acc(wname, _dot_t_lhs(d16, x_save.astype(dtype)))
        acc(bname, jnp.sum(pad128(d_pre), axis=0))
        return _dot(d16, w[wname])

    d_in = jnp.zeros((xin.shape[0], IN_COLS), jnp.float32)

    # ---- rgb branch
    g_rgb = g[:, 0:3] * (1 + 2 * rgb_padding)
    rgb_s3 = hs["rgb_s"][:, 0:3]
    d_r = narrow_bwd(g_rgb * rgb_s3 * (1.0 - rgb_s3), hs["r"],
                     "Wrgb1", "brgb1")
    d_r_pre = d_r * fast_cos(hs["r_pre"])
    acc("Wrgb0", _dot_t_lhs(fb, d_r_pre.astype(dtype)))
    acc("brgb0", jnp.sum(d_r_pre, axis=0))
    d_feats = _dot_t_rhs(d_r_pre.astype(dtype), w["Wrgb0"])

    # ---- sun branch
    sunv = hs["sunv"]
    d_s2 = narrow_bwd(g[:, 4:5] * sunv[:, 0:1] * (1.0 - sunv[:, 0:1]),
                      hs["s2"], "Wsun3", "bsun3")
    d_s2_pre = d_s2 * fast_cos(hs["s2_pre"])
    acc("Wsun2", _dot_t_lhs(hs["s1"].astype(dtype), d_s2_pre.astype(dtype)))
    acc("bsun2", jnp.sum(d_s2_pre, axis=0))
    d_s1 = _dot_t_rhs(d_s2_pre.astype(dtype), w["Wsun2"])
    d_s1_pre = d_s1 * fast_cos(hs["s1_pre"])
    acc("Wsun1", _dot_t_lhs(hs["s0"].astype(dtype), d_s1_pre.astype(dtype)))
    acc("bsun1", jnp.sum(d_s1_pre, axis=0))
    d_s0 = _dot_t_rhs(d_s1_pre.astype(dtype), w["Wsun1"])
    d_s0_pre = d_s0 * fast_cos(hs["s0_pre"])
    acc("Wsun0h", _dot_t_lhs(fb, d_s0_pre.astype(dtype)))
    acc("Wsun0d", _dot_t_lhs(xb, d_s0_pre.astype(dtype)))
    acc("bsun0", jnp.sum(d_s0_pre, axis=0))
    d_feats += _dot_t_rhs(d_s0_pre.astype(dtype), w["Wsun0h"])
    d_in += _dot_t_rhs(d_s0_pre.astype(dtype), w["Wsun0d"])

    # ---- sky branch
    sky = hs["sky"]
    d_skyh = narrow_bwd(g[:, 5:8] * sky[:, 0:3] * (1.0 - sky[:, 0:3]),
                        hs["skyh"], "Wsky1", "bsky1")
    d_skyh_pre = d_skyh * (hs["skyh"] > 0)
    acc("Wsky0", _dot_t_lhs(xb, d_skyh_pre.astype(dtype)))
    acc("bsky0", jnp.sum(d_skyh_pre, axis=0))
    d_in += _dot_t_rhs(d_skyh_pre.astype(dtype), w["Wsky0"])

    # ---- beta branch
    if use_beta:
        beta = hs["beta"]
        # softplus' (pre) = sigmoid(pre) = 1 - exp(-softplus(pre))
        d_bh = narrow_bwd(g[:, 8:9] * (1.0 - jnp.exp(-beta[:, 0:1])),
                          hs["bh"], "Wbeta1", "bbeta1")
        d_bh_pre = d_bh * fast_cos(hs["bh_pre"])
        acc("Wbeta0h", _dot_t_lhs(fb, d_bh_pre.astype(dtype)))
        acc("Wbeta0t", _dot_t_lhs(xb, d_bh_pre.astype(dtype)))
        acc("bbeta0", jnp.sum(d_bh_pre, axis=0))
        d_feats += _dot_t_rhs(d_bh_pre.astype(dtype), w["Wbeta0h"])
        d_in += _dot_t_rhs(d_bh_pre.astype(dtype), w["Wbeta0t"])

    # ---- feats + sigma into trunk output
    acc("Wfeat", _dot_t_lhs(hb, d_feats.astype(dtype)))
    acc("bfeat", jnp.sum(d_feats, axis=0))
    d_h = _dot_t_rhs(d_feats.astype(dtype), w["Wfeat"])

    sigma = jax.nn.softplus(hs["sigma_pre"][:, 0:1])
    d_h += narrow_bwd(g[:, 3:4] * (1.0 - jnp.exp(-sigma)), h,
                      "Wsig", "bsig")

    # ---- trunk backward: accumulate straight into the per-layer
    # slices of the resident grad refs
    for l in range(layers - 1, 0, -1):
        cosv, h_prev = trunk_save[l]
        d_pre = d_h * cosv
        grad_refs["B"][l - 1] += _dot_t_lhs(
            h_prev.astype(dtype), d_pre.astype(dtype)
        )
        grad_refs["bt"][l] += jnp.sum(d_pre, axis=0)
        if l == skip:
            acc("C", _dot_t_lhs(xb, d_pre.astype(dtype)))
            d_in += _dot_t_rhs(d_pre.astype(dtype), w["C"])
        d_h = _dot_t_rhs(d_pre.astype(dtype), w["B"][l - 1])
    cos0, _ = trunk_save[0]
    d_pre0 = d_h * cos0
    acc("A", _dot_t_lhs(xb, d_pre0.astype(dtype)))
    grad_refs["bt"][0] += jnp.sum(d_pre0, axis=0)
    d_in += _dot_t_rhs(d_pre0.astype(dtype), w["A"])

    return d_in


def _make_bwd_kernel(layers, skip, use_beta, rgb_padding, dtype):
    n_w = len([k for k in _PACKED_ORDER
               if use_beta or not k.startswith(("Wbeta", "bbeta"))])

    def kernel(in_ref, g_ref, *refs):
        # refs = weight refs (n_w) + outputs: din_ref + grad refs (n_w)
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        w = {k: r[...] for k, r in zip(names, refs[:n_w])}
        din_ref = refs[n_w]
        grad_refs = {k: r for k, r in zip(names, refs[n_w + 1:])}

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for k in names:
                grad_refs[k][...] = jnp.zeros(
                    grad_refs[k].shape, grad_refs[k].dtype
                )

        din_ref[...] = _point_bwd_body(in_ref[...], g_ref[...], w, grad_refs,
                                       layers, skip, use_beta, rgb_padding,
                                       dtype)

    return kernel




# ----------------------------------------------------- ray-mode entry points
#
# The point-mode API above receives pre-expanded (N, 16) per-point inputs,
# which makes XLA materialize xyz = o + d*z, the sun/t broadcasts, and the
# packed x_in (plus their transposes in the backward) — ~N*16 floats of HBM
# traffic each way per step. Ray mode moves the expansion inside the kernel:
# inputs are per-RAY [(R, 16) rays + (R, S) depths], 65x smaller, and the
# sample expansion happens in VMEM.


def _ray_selector(r, s):
    """(R*S, R) 0/1 matrix: Sel[q, j] = 1 iff point q belongs to ray j
    (ray-major point order q = j*S + s). Built from iota compares only —
    no division, so any S works."""
    p = r * s
    qi = jax.lax.broadcasted_iota(jnp.int32, (p, r), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (p, r), 1)
    lo = ji * s
    return ((qi >= lo) & (qi < lo + s)).astype(jnp.float32)


def _expand_rays(rays, z, tau):
    """(R, 16) rays + (R, S) depths -> (R*S, 16) point inputs.

    Ray layout: [o(0:3) | d(3:6) | sun(6:9) | t(9:9+tau)];
    point layout (what the trunk/heads expect): [xyz(0:3) | sun(3:6) | t(6:6+tau)].

    Mosaic supports neither 3D broadcasts, sublane<->lane relayouts, nor
    sublane concats — every direct formulation of the expansion fails to
    lower (commit history). This one needs none of them: the ray->point
    broadcast is an MXU matmul against an iota-built 0/1 selection matrix,
    the per-point depth is a masked lane reduction of Sel @ z, and the
    ray->point column remap is a matmul against constant lane-shift
    matrices. Matmuls, iotas, compares, and (P,1) lane broadcasts are all
    Mosaic-supported.
    """
    r, s = z.shape
    p = r * s
    sel = _ray_selector(r, s)                                    # (P, R)
    rb = _dot(sel, rays)                                         # (P, 16)
    z_rows = _dot(sel, z)                                        # (P, S)

    # per-point sample index s(q) = q - r(q)*s, then pick z[r(q), s(q)]
    # (integer iotas only: Mosaic's tpu.iota has no float result type)
    ji = jax.lax.broadcasted_iota(jnp.int32, (p, r), 1)
    r_col = jnp.sum(sel.astype(jnp.int32) * ji, axis=1,
                    keepdims=True)                               # (P, 1)
    q_col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    s_col = q_col - s * r_col                                    # (P, 1)
    si = jax.lax.broadcasted_iota(jnp.int32, (p, s), 1)
    z_col = jnp.sum(z_rows * (si == s_col).astype(jnp.float32),
                    axis=1, keepdims=True)                       # (P, 1)

    # lane-shift constants: identity on xyz lanes / move sun+t left by 3 /
    # move dir onto the xyz lanes (scaled by depth)
    ri16 = jax.lax.broadcasted_iota(jnp.int32, (IN_COLS, IN_COLS), 0)
    ci16 = jax.lax.broadcasted_iota(jnp.int32, (IN_COLS, IN_COLS), 1)
    shift_or = (((ri16 == ci16) & (ri16 < 3))
                | ((ri16 == ci16 + 3) & (ci16 >= 3)
                   & (ci16 < 6 + tau))).astype(jnp.float32)
    shift_d = ((ri16 == ci16 + 3) & (ci16 < 3)).astype(jnp.float32)
    return _dot(rb, shift_or) + _dot(rb, shift_d) * z_col


def _tgrad_remap(sel, d_in, tau):
    """Per-ray t-embedding cotangent from per-point input cotangents: only
    the t input is trainable, so the ray grad = sum of the ray's per-sample
    cotangents = Sel^T @ d_in (an MXU contraction over the point axis), with
    point cols 6:6+tau remapped to ray cols 9:9+tau by a constant lane-shift
    matmul (relayout-free, like _expand_rays). Shared by every ray-mode
    backward kernel — the rays16 layout lives in exactly one place."""
    d_ray = _dot_t_lhs(sel, d_in)                      # (R, 16)
    ri16 = jax.lax.broadcasted_iota(jnp.int32, (IN_COLS, IN_COLS), 0)
    ci16 = jax.lax.broadcasted_iota(jnp.int32, (IN_COLS, IN_COLS), 1)
    shift_back = ((ri16 == ci16 - 3) & (ci16 >= 9)
                  & (ci16 < 9 + tau)).astype(jnp.float32)
    return _dot(d_ray, shift_back)


def _make_fwd_kernel_rays(layers, skip, use_beta, rgb_padding, dtype, tau):
    def kernel(rays_ref, z_ref, *w_refs):
        out_ref = w_refs[-1]
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        w = {k: r[...] for k, r in zip(names, w_refs[:-1])}
        xin = _expand_rays(rays_ref[...], z_ref[...], tau)
        h = _trunk_fwd(xin, (w["A"], w["B"], w["C"], w["bt"]), layers, skip,
                       dtype)
        rgb, sigma, sunv, sky, beta = _heads_fwd(
            xin, h, w, use_beta, rgb_padding, dtype
        )
        t_rows = xin.shape[0]
        beta_col = beta if use_beta else jnp.zeros((t_rows, 1), jnp.float32)
        out_ref[...] = jnp.concatenate(
            [rgb, sigma, sunv, sky, beta_col,
             jnp.zeros((t_rows, OUT_COLS - 9), jnp.float32)], axis=-1
        )

    return kernel


def _make_bwd_kernel_rays(layers, skip, use_beta, rgb_padding, dtype, tau,
                          point_bwd):
    """Wrap the point-mode backward body: expand rays in-kernel, run the
    shared backprop, reduce the per-point input cotangent to per-ray t grads."""

    def kernel(rays_ref, z_ref, g_ref, *refs):
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        n_w = len(names)
        w = {k: r[...] for k, r in zip(names, refs[:n_w])}
        din_ref = refs[n_w]
        grad_refs = {k: r for k, r in zip(names, refs[n_w + 1:])}

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for k in names:
                grad_refs[k][...] = jnp.zeros(
                    grad_refs[k].shape, grad_refs[k].dtype
                )

        z = z_ref[...]
        r_rows, s = z.shape
        xin = _expand_rays(rays_ref[...], z, tau)
        g = g_ref[...]
        d_in = point_bwd(xin, g, w, grad_refs, layers, skip, use_beta,
                         rgb_padding, dtype)
        sel = _ray_selector(r_rows, s)
        din_ref[...] = _tgrad_remap(sel, d_in, tau)

    return kernel


# --------------------------------------------------------------- public API


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7)
)
def fused_field_packed(packed_list, x_in, layers, skip, use_beta,
                       rgb_padding, dtype, feat):
    """(packed weights list, (N, 16) inputs) -> (N, 16) outputs."""
    return _fused_forward(packed_list, x_in, layers, skip, use_beta,
                          rgb_padding, dtype, feat)


def _fused_forward(packed_list, x_in, layers, skip, use_beta, rgb_padding,
                   dtype, feat):
    n = x_in.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    if n_pad != n:
        x_in = jnp.pad(x_in, ((0, n_pad - n), (0, 0)))
    grid = n_pad // TILE

    kernel = _make_fwd_kernel(layers, skip, use_beta, rgb_padding, dtype)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((TILE, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, OUT_COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x_in, *packed_list)
    return out[:n]


def _fwd(packed_list, x_in, layers, skip, use_beta, rgb_padding, dtype, feat):
    out = _fused_forward(packed_list, x_in, layers, skip, use_beta,
                         rgb_padding, dtype, feat)
    return out, (packed_list, x_in)


def _bwd(layers, skip, use_beta, rgb_padding, dtype, feat, residuals, g):
    packed_list, x_in = residuals
    n = x_in.shape[0]
    bt = _bwd_points(dtype)
    n_pad = ((n + bt - 1) // bt) * bt
    if n_pad != n:
        x_in = jnp.pad(x_in, ((0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    grid = n_pad // bt

    kernel = _make_bwd_kernel(layers, skip, use_beta, rgb_padding, dtype)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
    # grad outputs: every program revisits block 0 -> stays resident in VMEM
    grad_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                   for p in packed_list]

    din, *grads = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bt, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((bt, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *grad_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, IN_COLS), jnp.float32),
            *grad_shapes,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )(x_in, g, *packed_list)
    # weight grads come back in the packed dtype slots as f32; cast to the
    # packed dtype tangent space expected by jax (match primal dtypes)
    grads = [gr.astype(p.dtype) for gr, p in zip(grads, packed_list)]
    return (grads, din[:n])


fused_field_packed.defvjp(_fwd, _bwd)


def fused_field_apply(params: dict, xyz, sun_dir=None, t_embed=None, *,
                      layers: int = 8, feat: int = 512, skip: int = 4,
                      use_beta: bool = True, rgb_padding: float = 0.001,
                      tau: int = 4, dtype=jnp.bfloat16) -> dict:
    """Drop-in replacement for RadianceField.apply on the SIREN variants.

    Accepts the same flax param pytree and per-point inputs with any leading
    shape; returns the same output dict (rgb, sigma, sun_v, sky_rgb[, beta]).
    """
    lead = xyz.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    cols = [xyz.reshape(n, 3).astype(jnp.float32)]
    cols.append(
        sun_dir.reshape(n, 3).astype(jnp.float32)
        if sun_dir is not None else jnp.zeros((n, 3), jnp.float32)
    )
    if t_embed is not None and use_beta:
        cols.append(t_embed.reshape(n, tau).astype(jnp.float32))
        used = 6 + tau
    else:
        used = 6
    cols.append(jnp.zeros((n, IN_COLS - used), jnp.float32))
    x_in = jnp.concatenate(cols, axis=-1)

    packed = pack_params(params, layers, feat, skip, use_beta, tau, dtype)
    packed_list = _order(packed)
    out = fused_field_packed(packed_list, x_in, layers, skip, use_beta,
                             rgb_padding, dtype, feat)
    res = {
        "rgb": out[:, 0:3].reshape(*lead, 3),
        "sigma": out[:, 3].reshape(*lead),
        "sun_v": out[:, 4:5].reshape(*lead, 1),
        "sky_rgb": out[:, 5:8].reshape(*lead, 3),
    }
    if use_beta:
        res["beta"] = out[:, 8:9].reshape(*lead, 1)
    return res


# ------------------------------------------------------- ray-mode public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_field_rays_packed(packed_list, rays16, z, layers, skip, use_beta,
                            rgb_padding, dtype, tau):
    """(packed weights, (R, 16) rays, (R, S) depths) -> (R*S, 16) outputs."""
    return _fused_forward_rays(packed_list, rays16, z, layers, skip, use_beta,
                               rgb_padding, dtype, tau)


def _ray_tile(s: int) -> int:
    # multiple of 8 so the (tile_r, S) depth block keeps full sublanes even
    # for non-power-of-two S (e.g. coarse+fine S = 64 + n_importance)
    return max(8, (RAY_FWD_TILE // s) // 8 * 8)


def _fused_forward_rays(packed_list, rays16, z, layers, skip, use_beta,
                        rgb_padding, dtype, tau):
    r, s = z.shape
    tile_r = _ray_tile(s)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays16 = jnp.pad(rays16, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)))
    kernel = _make_fwd_kernel_rays(layers, skip, use_beta, rgb_padding, dtype,
                                   tau)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
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
        out_specs=pl.BlockSpec((tile_r * s, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad * s, OUT_COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rays16, z, *packed_list)
    return out[: r * s]


def _rays_vjp_fwd(packed_list, rays16, z, layers, skip, use_beta, rgb_padding,
                  dtype, tau):
    out = _fused_forward_rays(packed_list, rays16, z, layers, skip, use_beta,
                              rgb_padding, dtype, tau)
    return out, (packed_list, rays16, z)


def _rays_vjp_bwd(layers, skip, use_beta, rgb_padding, dtype, tau, residuals,
                  g):
    packed_list, rays16, z = residuals
    r, s = z.shape
    tile_r = max(8, (_bwd_points(dtype) // s) // 8 * 8)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays16 = jnp.pad(rays16, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)))
        g = jnp.pad(g, ((0, (r_pad - r) * s), (0, 0)))

    kernel = _make_bwd_kernel_rays(layers, skip, use_beta, rgb_padding, dtype,
                                   tau, _point_bwd_body)
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
    din, *grads = pl.pallas_call(
        kernel,
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r * s, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *grad_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, IN_COLS), jnp.float32),
            *(jax.ShapeDtypeStruct(p.shape, jnp.float32)
              for p in packed_list),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )(rays16, z, g, *packed_list)
    grads = [gr.astype(p.dtype) for gr, p in zip(grads, packed_list)]
    # z gets no cotangent (sampling depths are stop-gradient data)
    return (grads, din[:r], jnp.zeros_like(residuals[2]))


fused_field_rays_packed.defvjp(_rays_vjp_fwd, _rays_vjp_bwd)


# ---------------------------------------------------- fused render (serving)
#
# Forward-only kernel for eval / DSM products: expansion, field, AND alpha
# compositing all happen in VMEM, so the only HBM traffic is (R, 16) rays +
# (R, S) depths in and ONE (R, 16) per-ray product row out — no per-point
# tensor ever leaves the chip's VMEM. The per-ray exclusive cumprod uses the
# same relayout-free matmul machinery as _expand_rays: scatter per-point
# columns to (R, S) matrices with Sel^T @ (col * onehot), then cumulate in
# log space against a constant strictly-lower-triangular matrix on the MXU.
#
# Per-ray output layout (16 f32 cols):
#   0:3 rgb | 3 depth | 4 sun | 5:8 sky | 8 beta | 9:12 albedo | 12 opacity


def _sample_onehot(r, s):
    """(R*S, S) one-hot of each point's sample index (iota compares only)."""
    p = r * s
    sel = _ray_selector(r, s)
    ji = jax.lax.broadcasted_iota(jnp.int32, (p, r), 1)
    r_col = jnp.sum(sel.astype(jnp.int32) * ji, axis=1, keepdims=True)
    q_col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    s_col = q_col - s * r_col
    si = jax.lax.broadcasted_iota(jnp.int32, (p, s), 1)
    return sel, (si == s_col).astype(jnp.float32)


def _composite_tile(sel, onehot, z, rgb, sigma, sunv, sky, beta, use_beta,
                    noise=None, weights_out=False):
    """In-kernel alpha compositing of a (tile_r rays x S samples) tile.

    Math identical to render/composite.py (reference models/satnerf.py:44-79):
    alpha = 1 - exp(-delta*relu(sigma [+ noise])),
    T = cumprod_excl(1 - alpha + 1e-10), w = alpha*T; per-ray integrals of
    rgb*irradiance, z, sun_v, albedo, beta, sky. `noise` is the training-time
    per-sample (R, S) sigma noise, generated in XLA and passed in.
    """
    r, s = z.shape
    t_rows = rgb.shape[0]

    sigma_mat = _dot_t_lhs(sel, sigma * onehot)            # (R, S)
    if noise is not None:
        sigma_mat = sigma_mat + noise

    # deltas: z_{s+1} - z_s, last = 1e10 (lane shift via constant matmul)
    ri_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ci_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    shift_up = (ri_s == ci_s + 1).astype(jnp.float32)
    z_next = _dot(z, shift_up)
    si_r = jax.lax.broadcasted_iota(jnp.int32, (r, s), 1)
    deltas = jnp.where(si_r == s - 1, 1e10, z_next - z)

    x = deltas * jax.nn.relu(sigma_mat)
    one_m_alpha = jnp.exp(-x)                               # = 1 - alpha
    alpha = 1.0 - one_m_alpha
    lt = jnp.log(one_m_alpha + 1e-10)
    strict_lower = (ri_s < ci_s).astype(jnp.float32)        # M[j, i]=1 if j<i
    transparency = jnp.exp(_dot(lt, strict_lower))          # exclusive cumprod
    weights = alpha * transparency                          # (R, S)

    depth = jnp.sum(weights * z, axis=1, keepdims=True)     # (R, 1)
    opacity = jnp.sum(weights, axis=1, keepdims=True)

    # per-point weight: pick each point's w from its ray's weight row
    w_pt = jnp.sum(_dot(sel, weights) * onehot, axis=1, keepdims=True)

    irr = sunv + (1.0 - sunv) * sky                         # (P, 3)
    rgb_ray = jnp.clip(_dot_t_lhs(sel, w_pt * rgb * irr), 0.0, 1.0)
    sun_ray = _dot_t_lhs(sel, w_pt * sunv)
    albedo_ray = _dot_t_lhs(sel, w_pt * rgb)
    sky_ray = _dot_t_lhs(sel, w_pt * sky)
    beta_ray = (_dot_t_lhs(sel, w_pt * beta) if use_beta
                else jnp.zeros((r, 1), jnp.float32))
    out = jnp.concatenate(
        [rgb_ray, depth, sun_ray, sky_ray, beta_ray, albedo_ray, opacity,
         jnp.zeros((r, OUT_COLS - 13), jnp.float32)], axis=-1
    )
    if weights_out:
        return out, weights
    return out


def _make_render_kernel_rays(layers, skip, use_beta, rgb_padding, dtype, tau,
                             weights_out=False):
    """weights_out=True adds a second (tile_r, S) output of the per-sample
    compositing weights — needed by hierarchical sampling (sample_pdf,
    reference rendering.py:118-125) to place the fine-model samples."""

    def kernel(rays_ref, z_ref, *w_refs):
        n_out = 2 if weights_out else 1
        out_ref = w_refs[-n_out]
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        w = {k: r[...] for k, r in zip(names, w_refs[:-n_out])}
        z = z_ref[...]
        r, s = z.shape
        xin = _expand_rays(rays_ref[...], z, tau)
        h = _trunk_fwd(xin, (w["A"], w["B"], w["C"], w["bt"]), layers, skip,
                       dtype)
        rgb, sigma, sunv, sky, beta = _heads_fwd(
            xin, h, w, use_beta, rgb_padding, dtype
        )
        sel, onehot = _sample_onehot(r, s)
        res = _composite_tile(sel, onehot, z, rgb, sigma, sunv, sky,
                              beta, use_beta, weights_out=weights_out)
        if weights_out:
            out_ref[...], w_refs[-1][...] = res
        else:
            out_ref[...] = res

    return kernel


def fused_render_rays(params: dict, rays_o, rays_d, sun_dir, t_embed, z_vals,
                      *, layers: int = 8, feat: int = 512, skip: int = 4,
                      use_beta: bool = True, rgb_padding: float = 0.001,
                      tau: int = 4, dtype=jnp.bfloat16,
                      return_weights: bool = False) -> dict:
    """Serving path: render rays to per-ray products entirely in one kernel.

    Returns {"rgb": (R,3), "depth": (R,), "sun": (R,1), "sky": (R,3),
    "beta": (R,1) [sat-nerf], "albedo": (R,3), "opacity": (R,)} — the per-ray
    integrals eval/images.py computes host-side from the per-sample outputs
    (reference eval_satnerf.py:95-146), already composited on-chip.

    return_weights=True adds "weights" (R, S) — the per-sample compositing
    weights the coarse pass feeds to sample_pdf when n_importance > 0.
    """
    r, s = z_vals.shape
    t_part = (t_embed.astype(jnp.float32) if (t_embed is not None and use_beta)
              else jnp.zeros((r, tau), jnp.float32))
    rays16 = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         (sun_dir.astype(jnp.float32) if sun_dir is not None
          else jnp.zeros((r, 3), jnp.float32)),
         t_part, jnp.zeros((r, IN_COLS - 9 - tau), jnp.float32)], axis=-1,
    )
    packed = pack_params(params, layers, feat, skip, use_beta, tau, dtype)
    plist = _order(packed)

    z = z_vals.astype(jnp.float32)
    tile_r = _ray_tile(s)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays16 = jnp.pad(rays16, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)), constant_values=1.0)

    kernel = _make_render_kernel_rays(layers, skip, use_beta, rgb_padding,
                                      dtype, tau, weights_out=return_weights)
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
    )(rays16, z, *plist)
    weights = None
    if return_weights:
        out, weights = out
        weights = weights[:r]
    out = out[:r]
    res = {
        "rgb": out[:, 0:3],
        "depth": out[:, 3],
        "sun": out[:, 4:5],
        "sky": out[:, 5:8],
        "albedo": out[:, 9:12],
        "opacity": out[:, 12],
    }
    if use_beta:
        res["beta"] = out[:, 8:9]
    if return_weights:
        res["weights"] = weights
    return res


def fused_field_apply_rays(params: dict, rays_o, rays_d, sun_dir, t_embed,
                           z_vals, *, layers: int = 8, feat: int = 512,
                           skip: int = 4, use_beta: bool = True,
                           rgb_padding: float = 0.001, tau: int = 4,
                           dtype=jnp.bfloat16) -> dict:
    """Ray-level fused field: expands o + d*z to sample points inside the
    kernel. Inputs are per-ray (R, 3)/(R, tau) and (R, S) depths; outputs are
    per-sample dicts shaped (R, S, ...) ready for the compositor."""
    r, s = z_vals.shape
    t_part = (t_embed.astype(jnp.float32) if (t_embed is not None and use_beta)
              else jnp.zeros((r, tau), jnp.float32))
    rays16 = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         (sun_dir.astype(jnp.float32) if sun_dir is not None
          else jnp.zeros((r, 3), jnp.float32)),
         t_part, jnp.zeros((r, IN_COLS - 9 - tau), jnp.float32)], axis=-1,
    )
    packed = pack_params(params, layers, feat, skip, use_beta, tau, dtype)
    plist = _order(packed)
    out = fused_field_rays_packed(plist, rays16, z_vals.astype(jnp.float32),
                                  layers, skip, use_beta, rgb_padding, dtype,
                                  tau)
    res = {
        "rgb": out[:, 0:3].reshape(r, s, 3),
        "sigma": out[:, 3].reshape(r, s),
        "sun_v": out[:, 4:5].reshape(r, s, 1),
        "sky_rgb": out[:, 5:8].reshape(r, s, 3),
    }
    if use_beta:
        res["beta"] = out[:, 8:9].reshape(r, s, 1)
    return res


# ------------------------------------------------- fused render (TRAINING)
#
# The training-time version of the fused render above: expansion + field +
# compositing in one kernel, with a custom VJP whose backward runs the
# compositor adjoint in-kernel and feeds the resulting per-point cotangents
# straight into the shared field backward (_point_bwd_from_saves). Compared
# to the ray-mode field kernel + XLA compositor, both the (P, 16) out/g
# per-point HBM round-trips and the XLA compositor/loss fusions disappear:
# the backward's incoming cotangent shrinks from (R*S, 16) to (R, 16).
#
# Derivation recorded in docs/KERNEL_NOTES.md; semantics match
# render/composite.py (reference models/satnerf.py:44-79). Training sigma
# noise is drawn in XLA and passed as an (R, S) input (threefry in-kernel is
# not worth it). Solar-correction sun-ray passes stay on the per-sample
# ray-mode path (their loss consumes per-sample weights/transparency).


def _composite_bwd_tile(sel, onehot, z, noise, rgb, sigma, sunv, sky, beta,
                        g_ray, use_beta):
    """Compositor adjoint: per-ray cotangents (R, 16, fused-render output
    layout) -> packed per-point field cotangents (P, 16, field layout).

    Recomputes the (cheap) compositor forward from the per-point field
    outputs, then:
      dL/dw      via the per-point integrand products + depth/opacity terms,
      dL/dalpha  through w = alpha * T with the suffix sum (dw*w) @ U
                 (U strictly upper triangular -> one MXU matmul),
      dL/dsigma  through alpha = 1 - exp(-delta * relu(sigma + noise)).
    """
    r, s = z.shape

    # ---- compositor forward recompute (same ops as _composite_tile)
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
    w_mat = alpha * transparency                            # (R, S)
    w_pt = jnp.sum(_dot(sel, w_mat) * onehot, axis=1, keepdims=True)
    irr = sunv + (1.0 - sunv) * sky                         # (P, 3)

    # ---- incoming per-ray cotangents (fused-render output layout)
    g_rgb = g_ray[:, 0:3]
    g_depth = g_ray[:, 3:4]
    g_sun = g_ray[:, 4:5]
    g_sky = g_ray[:, 5:8]
    g_beta = g_ray[:, 8:9]
    g_alb = g_ray[:, 9:12]
    g_op = g_ray[:, 12:13]

    # rgb clip adjoint: zero outside [0, 1] (recompute unclipped integral)
    rgb_pre = _dot_t_lhs(sel, w_pt * rgb * irr)
    g_rgb = g_rgb * ((rgb_pre >= 0.0) & (rgb_pre <= 1.0)).astype(jnp.float32)

    # broadcast ray cotangents to their points (MXU: Sel @ g)
    G_rgb = _dot(sel, g_rgb)                                # (P, 3)
    G_alb = _dot(sel, g_alb)
    G_sun = _dot(sel, g_sun)                                # (P, 1)
    G_sky = _dot(sel, g_sky)

    d_rgb_pt = w_pt * (irr * G_rgb + G_alb)
    d_irr = w_pt * rgb * G_rgb
    d_sunv_pt = (jnp.sum(d_irr * (1.0 - sky), axis=1, keepdims=True)
                 + w_pt * G_sun)
    d_sky_pt = d_irr * (1.0 - sunv) + w_pt * G_sky
    d_w_pt = (jnp.sum(rgb * irr * G_rgb, axis=1, keepdims=True)
              + jnp.sum(rgb * G_alb, axis=1, keepdims=True)
              + sunv * G_sun
              + jnp.sum(sky * G_sky, axis=1, keepdims=True))
    if use_beta:
        G_beta = _dot(sel, g_beta)
        d_beta_pt = w_pt * G_beta
        d_w_pt = d_w_pt + beta * G_beta

    # ---- dL/dw: scatter the per-point part to (R, S), add depth/opacity
    dw = _dot_t_lhs(sel, d_w_pt * onehot) + g_depth * z + g_op

    # ---- through w = alpha * T (suffix sum = one triangular matmul)
    strict_upper = (ri_s > ci_s).astype(jnp.float32)        # U[k, i]=1, k>i
    suffix = _dot(dw * w_mat, strict_upper)
    d_alpha = dw * transparency - suffix / (one_m_alpha + 1e-10)

    # ---- through alpha = 1 - exp(-delta * relu(sigma + noise))
    dx = d_alpha * one_m_alpha
    d_sn = dx * deltas * (sigma_mat > 0.0).astype(jnp.float32)
    d_sigma_pt = jnp.sum(_dot(sel, d_sn) * onehot, axis=1, keepdims=True)

    p = rgb.shape[0]
    beta_col = d_beta_pt if use_beta else jnp.zeros((p, 1), jnp.float32)
    return jnp.concatenate(
        [d_rgb_pt, d_sigma_pt, d_sunv_pt, d_sky_pt, beta_col,
         jnp.zeros((p, OUT_COLS - 9), jnp.float32)], axis=-1
    )


def _make_train_render_kernel_rays(layers, skip, use_beta, rgb_padding, dtype,
                                   tau):
    def kernel(rays_ref, z_ref, noise_ref, *w_refs):
        out_ref = w_refs[-1]
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        w = {k: r[...] for k, r in zip(names, w_refs[:-1])}
        z = z_ref[...]
        r, s = z.shape
        xin = _expand_rays(rays_ref[...], z, tau)
        h = _trunk_fwd(xin, (w["A"], w["B"], w["C"], w["bt"]), layers, skip,
                       dtype)
        rgb, sigma, sunv, sky, beta = _heads_fwd(
            xin, h, w, use_beta, rgb_padding, dtype
        )
        sel, onehot = _sample_onehot(r, s)
        out_ref[...] = _composite_tile(sel, onehot, z, rgb, sigma, sunv, sky,
                                       beta, use_beta, noise=noise_ref[...])

    return kernel


def _make_train_render_bwd_kernel(layers, skip, use_beta, rgb_padding, dtype,
                                  tau):
    def kernel(rays_ref, z_ref, noise_ref, g_ref, *refs):
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        n_w = len(names)
        w = {k: r[...] for k, r in zip(names, refs[:n_w])}
        din_ref = refs[n_w]
        grad_refs = {k: r for k, r in zip(names, refs[n_w + 1:])}

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for k in names:
                grad_refs[k][...] = jnp.zeros(
                    grad_refs[k].shape, grad_refs[k].dtype
                )

        z = z_ref[...]
        r_rows, s = z.shape
        xin = _expand_rays(rays_ref[...], z, tau)

        # one shared forward recompute serves both the compositor adjoint
        # (needs the per-point field outputs) and the field backprop
        h, trunk_save, hs = _fwd_saves(xin, w, layers, skip, use_beta,
                                       rgb_padding, dtype)
        rgb = hs["rgb_s"][:, 0:3] * (1 + 2 * rgb_padding) - rgb_padding
        sigma = jax.nn.softplus(hs["sigma_pre"][:, 0:1])
        sunv = hs["sunv"][:, 0:1]
        sky = hs["sky"][:, 0:3]
        beta = hs["beta"][:, 0:1] if use_beta else None

        sel, onehot = _sample_onehot(r_rows, s)
        g_pt = _composite_bwd_tile(sel, onehot, z, noise_ref[...], rgb, sigma,
                                   sunv, sky, beta, g_ref[...], use_beta)
        d_in = _point_bwd_from_saves(xin, g_pt, w, grad_refs, h, trunk_save,
                                     hs, layers, skip, use_beta, rgb_padding,
                                     dtype)
        din_ref[...] = _tgrad_remap(sel, d_in, tau)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_train_render_packed(packed_list, rays16, z, noise, layers, skip,
                              use_beta, rgb_padding, dtype, tau):
    """(packed weights, (R, 16) rays, (R, S) depths, (R, S) sigma noise)
    -> (R, 16) per-ray composited products (fused-render output layout)."""
    return _train_render_fwd_impl(packed_list, rays16, z, noise, layers, skip,
                                  use_beta, rgb_padding, dtype, tau)


def _train_render_fwd_impl(packed_list, rays16, z, noise, layers, skip,
                           use_beta, rgb_padding, dtype, tau):
    r, s = z.shape
    tile_r = _ray_tile(s)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays16 = jnp.pad(rays16, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)), constant_values=1.0)
        noise = jnp.pad(noise, ((0, r_pad - r), (0, 0)))
    kernel = _make_train_render_kernel_rays(layers, skip, use_beta,
                                            rgb_padding, dtype, tau)
    w_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in packed_list
    ]
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile_r, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, OUT_COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rays16, z, noise, *packed_list)
    return out[:r]


def _train_render_vjp_fwd(packed_list, rays16, z, noise, layers, skip,
                          use_beta, rgb_padding, dtype, tau):
    out = _train_render_fwd_impl(packed_list, rays16, z, noise, layers, skip,
                                 use_beta, rgb_padding, dtype, tau)
    return out, (packed_list, rays16, z, noise)


def _train_render_vjp_bwd(layers, skip, use_beta, rgb_padding, dtype, tau,
                          residuals, g):
    packed_list, rays16, z, noise = residuals
    r, s = z.shape
    tile_r = max(8, (_bwd_points(dtype) // s) // 8 * 8)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    zp, noisep = z, noise
    if r_pad != r:
        rays16 = jnp.pad(rays16, ((0, r_pad - r), (0, 0)))
        zp = jnp.pad(z, ((0, r_pad - r), (0, 0)), constant_values=1.0)
        noisep = jnp.pad(noise, ((0, r_pad - r), (0, 0)))
        g = jnp.pad(g, ((0, r_pad - r), (0, 0)))

    kernel = _make_train_render_bwd_kernel(layers, skip, use_beta,
                                           rgb_padding, dtype, tau)
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
    din, *grads = pl.pallas_call(
        kernel,
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *grad_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, IN_COLS), jnp.float32),
            *(jax.ShapeDtypeStruct(p.shape, jnp.float32)
              for p in packed_list),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )(rays16, zp, noisep, g, *packed_list)
    grads = [gr.astype(p.dtype) for gr, p in zip(grads, packed_list)]
    # z and noise carry no cotangent (stop-gradient data, like the reference's
    # detached depths); rays16 returns only the t-embedding columns
    return (grads, din[:r], jnp.zeros_like(z), jnp.zeros_like(noise))


fused_train_render_packed.defvjp(_train_render_vjp_fwd, _train_render_vjp_bwd)


def fused_train_render_rays(params: dict, rays_o, rays_d, sun_dir, t_embed,
                            z_vals, noise=None, *, layers: int = 8,
                            feat: int = 512, skip: int = 4,
                            use_beta: bool = True, rgb_padding: float = 0.001,
                            tau: int = 4, dtype=jnp.bfloat16) -> dict:
    """Training path: differentiable fused render of rays to per-ray products.

    Same contract as fused_render_rays (expansion + field + compositing in
    one kernel) but with a custom VJP — gradients flow to `params` (through
    pack_params) and to `t_embed`. `noise` is the per-sample training sigma
    noise (R, S) or None. Returns {"rgb" (R,3), "depth" (R,), "sun" (R,1),
    "sky" (R,3), "albedo" (R,3), "opacity" (R,), ["beta" (R,1)]} where beta
    is the weight-integrated per-ray uncertainty the Sat-NeRF loss consumes
    (reference metrics.py:21-25 integrates it host-side from per-sample
    weights; here it comes back pre-integrated)."""
    r, s = z_vals.shape
    t_part = (t_embed.astype(jnp.float32) if (t_embed is not None and use_beta)
              else jnp.zeros((r, tau), jnp.float32))
    rays16 = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         (sun_dir.astype(jnp.float32) if sun_dir is not None
          else jnp.zeros((r, 3), jnp.float32)),
         t_part, jnp.zeros((r, IN_COLS - 9 - tau), jnp.float32)], axis=-1,
    )
    if noise is None:
        noise = jnp.zeros((r, s), jnp.float32)
    packed = pack_params(params, layers, feat, skip, use_beta, tau, dtype)
    plist = _order(packed)
    out = fused_train_render_packed(plist, rays16, z_vals.astype(jnp.float32),
                                    noise.astype(jnp.float32), layers, skip,
                                    use_beta, rgb_padding, dtype, tau)
    res = {
        "rgb": out[:, 0:3],
        "depth": out[:, 3],
        "sun": out[:, 4:5],
        "sky": out[:, 5:8],
        "albedo": out[:, 9:12],
        "opacity": out[:, 12],
    }
    if use_beta:
        res["beta"] = out[:, 8:9]
    return res


# ------------------------------------------- fully fused train step (loss-in)
#
# One kernel for the whole primary-pass gradient computation: expansion +
# field + compositing + LOSS + loss adjoint + compositor adjoint + field
# backward. With the loss cotangents computed in-kernel from the ground-truth
# rgb, the separate forward pallas_call (and its HBM round trip) disappears —
# the step's device time collapses to a single backward-shaped kernel
# (profiled round 2: fwd 156 ms + bwd 462 ms -> ~462 ms total at batch 64k).
#
# Loss semantics (train/losses.py, reference metrics.py:8-73), per-ray:
#   warm  (S-NeRF):  mse = mean_rc (rgb - gt)^2
#   sat   (Sat-NeRF): color = mean_rc (rgb - gt)^2 / (2 beta^2),
#                     logbeta = (3 + mean_r log beta) / 2,
#                     beta = integrated_beta + beta_min
#   main loss = wmix * (color + logbeta) + (1 - wmix) * mse
# where wmix is the traced beta warm-up gate (epoch >= first_beta_epoch).
# Solar-correction and depth-supervision terms come from separate passes and
# their grads ADD — they stay outside this kernel (train/system.py).


def _make_train_loss_bwd_kernel(layers, skip, use_beta, rgb_padding, dtype,
                                tau, beta_min, n_total, tile_r,
                                weights_out=False):
    def kernel(scal_ref, rays_ref, z_ref, noise_ref, gt_ref, *refs):
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        n_w = len(names)
        w = {k: r[...] for k, r in zip(names, refs[:n_w])}
        loss_ref = refs[n_w]
        din_ref = refs[n_w + 1]
        w_off = 3 if weights_out else 2
        weights_ref = refs[n_w + 2] if weights_out else None
        grad_refs = {k: r for k, r in zip(names, refs[n_w + w_off:])}

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
            for k in names:
                grad_refs[k][...] = jnp.zeros(
                    grad_refs[k].shape, grad_refs[k].dtype
                )

        z = z_ref[...]
        r_rows, s = z.shape
        noise = noise_ref[...]
        xin = _expand_rays(rays_ref[...], z, tau)

        # one forward recompute serves the loss, the compositor adjoint, and
        # the field backprop
        h, trunk_save, hs = _fwd_saves(xin, w, layers, skip, use_beta,
                                       rgb_padding, dtype)
        rgb_pt = hs["rgb_s"][:, 0:3] * (1 + 2 * rgb_padding) - rgb_padding
        sigma = jax.nn.softplus(hs["sigma_pre"][:, 0:1])
        sunv = hs["sunv"][:, 0:1]
        sky = hs["sky"][:, 0:3]
        beta_pt = hs["beta"][:, 0:1] if use_beta else None

        sel, onehot = _sample_onehot(r_rows, s)
        out = _composite_tile(sel, onehot, z, rgb_pt, sigma, sunv, sky,
                              beta_pt, use_beta, noise=noise,
                              weights_out=weights_out)
        if weights_out:
            # per-sample compositing weights for hierarchical sampling
            # (sample_pdf, rendering.py:118-125) — stop-gradient data
            out, w_samp = out
            weights_ref[...] = w_samp
        rgb_ray = out[:, 0:3]  # clipped, like the XLA path's rgb_coarse

        # ---- loss + adjoint (masked against ray padding)
        gi = (step * tile_r
              + jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0))
        valid = (gi < n_total).astype(jnp.float32)
        gt = gt_ref[:, 0:3]
        diff = rgb_ray - gt
        sq = jnp.sum(diff * diff, axis=1, keepdims=True)       # (R, 1)
        inv3n = 1.0 / (3.0 * n_total)
        invn = 1.0 / n_total
        wmix = scal_ref[0, 0]

        s_mse = jnp.sum(valid * sq)
        if use_beta:
            beta_l = out[:, 8:9] + beta_min
            inv_b2 = 1.0 / (beta_l * beta_l)
            s_sat = jnp.sum(valid * 0.5 * sq * inv_b2)
            s_logb = jnp.sum(valid * jnp.log(beta_l))
            g_rgb = valid * diff * (wmix * inv_b2 * inv3n
                                    + (1.0 - wmix) * 2.0 * inv3n)
            g_beta = valid * wmix * (0.5 * invn / beta_l
                                     - sq * inv_b2 / beta_l * inv3n)
        else:
            s_sat = jnp.zeros((), jnp.float32)
            s_logb = jnp.zeros((), jnp.float32)
            g_rgb = valid * diff * (2.0 * inv3n)
            g_beta = jnp.zeros((r_rows, 1), jnp.float32)

        ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        ci8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        zero8 = jnp.zeros((8, 128), jnp.float32)
        loss_ref[...] += (
            jnp.where((ri8 == 0) & (ci8 == 0), s_sat, zero8)
            + jnp.where((ri8 == 0) & (ci8 == 1), s_logb, zero8)
            + jnp.where((ri8 == 0) & (ci8 == 2), s_mse, zero8)
        )

        # ---- per-ray cotangent in the fused-render output layout; the clip
        # mask is applied inside _composite_bwd_tile
        g_ray = jnp.concatenate(
            [g_rgb, jnp.zeros((r_rows, 5), jnp.float32), g_beta,
             jnp.zeros((r_rows, OUT_COLS - 9), jnp.float32)], axis=-1
        )
        g_pt = _composite_bwd_tile(sel, onehot, z, noise, rgb_pt, sigma,
                                   sunv, sky, beta_pt, g_ray, use_beta)
        d_in = _point_bwd_from_saves(xin, g_pt, w, grad_refs, h, trunk_save,
                                     hs, layers, skip, use_beta, rgb_padding,
                                     dtype)
        din_ref[...] = _tgrad_remap(sel, d_in, tau)

    return kernel


def _make_sc_loss_bwd_kernel(layers, skip, use_beta, rgb_padding, dtype, tau,
                             lam3, n_total, tile_r):
    """Solar-correction pass, loss-in-kernel: the sun-ray field eval, the
    compositor forward (stop-gradient, reference metrics.py:27-34 detaches
    transparency/weights), terms 2+3 of the S-NeRF loss, and their adjoint —
    which flows ONLY through the sun-visibility head — in one launch."""

    def kernel(rays_ref, z_ref, noise_ref, *refs):
        names = [k for k in _PACKED_ORDER
                 if use_beta or not k.startswith(("Wbeta", "bbeta"))]
        n_w = len(names)
        w = {k: r[...] for k, r in zip(names, refs[:n_w])}
        loss_ref = refs[n_w]
        grad_refs = {k: r for k, r in zip(names, refs[n_w + 1:])}

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
            for k in names:
                grad_refs[k][...] = jnp.zeros(
                    grad_refs[k].shape, grad_refs[k].dtype
                )

        z = z_ref[...]
        r_rows, s = z.shape
        noise = noise_ref[...]
        xin = _expand_rays(rays_ref[...], z, tau)
        h, trunk_save, hs = _fwd_saves(xin, w, layers, skip, use_beta,
                                       rgb_padding, dtype)
        sigma = jax.nn.softplus(hs["sigma_pre"][:, 0:1])
        sunv_pt = hs["sunv"][:, 0:1]

        sel, onehot = _sample_onehot(r_rows, s)
        # compositor forward along the SUN rays (T, w carry no gradient)
        sigma_mat = _dot_t_lhs(sel, sigma * onehot) + noise
        ri_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        ci_s = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        shift_up = (ri_s == ci_s + 1).astype(jnp.float32)
        z_next = _dot(z, shift_up)
        si_r = jax.lax.broadcasted_iota(jnp.int32, (r_rows, s), 1)
        deltas = jnp.where(si_r == s - 1, 1e10, z_next - z)
        x = deltas * jax.nn.relu(sigma_mat)
        one_m_alpha = jnp.exp(-x)
        lt = jnp.log(one_m_alpha + 1e-10)
        strict_lower = (ri_s < ci_s).astype(jnp.float32)
        transparency = jnp.exp(_dot(lt, strict_lower))
        w_mat = (1.0 - one_m_alpha) * transparency

        sunv_mat = _dot_t_lhs(sel, sunv_pt * onehot)        # (R, S)

        gi = (step * tile_r
              + jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0))
        valid = (gi < n_total).astype(jnp.float32)
        diff = transparency - sunv_mat
        t2 = jnp.sum(valid * jnp.sum(diff * diff, axis=1, keepdims=True))
        t3 = jnp.sum(valid * (1.0 - jnp.sum(w_mat * sunv_mat, axis=1,
                                            keepdims=True)))
        ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        ci8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        zero8 = jnp.zeros((8, 128), jnp.float32)
        loss_ref[...] += (jnp.where((ri8 == 0) & (ci8 == 0), t2, zero8)
                          + jnp.where((ri8 == 0) & (ci8 == 1), t3, zero8))

        # adjoint: d(term2)/dsunv = -2*lam3*(T - sunv)/N;
        #          d(term3)/dsunv = -lam3*w/N — nothing else carries grad
        g_sunv_mat = valid * (lam3 / n_total) * (-2.0 * diff - w_mat)
        d_sunv_pt = jnp.sum(_dot(sel, g_sunv_mat) * onehot, axis=1,
                            keepdims=True)                   # (P, 1)
        p = d_sunv_pt.shape[0]
        g_pt = jnp.concatenate(
            [jnp.zeros((p, 4), jnp.float32), d_sunv_pt,
             jnp.zeros((p, OUT_COLS - 5), jnp.float32)], axis=-1
        )
        _point_bwd_from_saves(xin, g_pt, w, grad_refs, h, trunk_save, hs,
                              layers, skip, use_beta, rgb_padding, dtype)

    return kernel


def fused_sc_loss_grads(params: dict, rays_o, sun_dir, t_embed, z_vals,
                        noise, lambda_sc: float, *, layers: int = 8,
                        feat: int = 512, skip: int = 4, use_beta: bool = True,
                        rgb_padding: float = 0.001, tau: int = 4,
                        dtype=jnp.bfloat16):
    """Secondary (sun-ray) solar-correction pass in ONE kernel launch.

    Returns (parts, param_grads): parts = {"term2", "term3"} (already scaled
    by lambda_sc/3, reference metrics.py:27-34) and the flax param-tree
    gradient of term2 + term3. The march direction IS the sun direction
    (rendering.py:102-108); transparency/weights are stop-gradient exactly
    like the XLA path, so gradients flow only through the sun-v head chain.
    t_embed gets no gradient (only the beta head consumes it, and beta has
    no SC cotangent)."""
    r, s = z_vals.shape
    t_part = (t_embed.astype(jnp.float32) if (t_embed is not None and use_beta)
              else jnp.zeros((r, tau), jnp.float32))
    sd = sun_dir.astype(jnp.float32)
    rays16 = jnp.concatenate(
        [rays_o.astype(jnp.float32), sd, sd, t_part,
         jnp.zeros((r, IN_COLS - 9 - tau), jnp.float32)], axis=-1,
    )
    z = z_vals.astype(jnp.float32)
    if noise is None:
        noise = jnp.zeros((r, s), jnp.float32)
    packed = pack_params(params, layers, feat, skip, use_beta, tau, dtype)
    plist = _order(packed)
    names = [k for k in _PACKED_ORDER
             if use_beta or not k.startswith(("Wbeta", "bbeta"))]

    tile_r = max(8, (_bwd_points(dtype) // s) // 8 * 8)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays16 = jnp.pad(rays16, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)), constant_values=1.0)
        noise = jnp.pad(noise, ((0, r_pad - r), (0, 0)))

    kernel = _make_sc_loss_bwd_kernel(layers, skip, use_beta, rgb_padding,
                                      dtype, tau, lambda_sc / 3.0, r, tile_r)
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
    )(rays16, z, noise, *plist)

    lam3 = lambda_sc / 3.0
    parts = {
        "term2": lam3 * loss_acc[0, 0] / r,
        "term3": lam3 * loss_acc[0, 1] / r,
    }
    g_named = dict(zip(names, grads))
    param_grads = unpack_grads(g_named, params, layers, feat, skip, use_beta)
    return parts, param_grads


def fused_train_loss_grads(params: dict, rays_o, rays_d, sun_dir, t_embed,
                           z_vals, noise, gt_rgb, use_beta_w, *,
                           layers: int = 8, feat: int = 512, skip: int = 4,
                           use_beta: bool = True, rgb_padding: float = 0.001,
                           beta_min: float = 0.05, tau: int = 4,
                           dtype=jnp.bfloat16, return_weights: bool = False):
    """Primary-pass loss + gradients in ONE kernel launch.

    Returns (parts, param_grads, t_grad):
      parts: {"color_sat", "logbeta", "mse"} scalar loss components (the
             caller mixes them with the warm-up gate and adds sc/depth terms)
      param_grads: flax pytree cotangent for `params` (the main loss'
             gradient of wmix*(color_sat+logbeta) + (1-wmix)*mse)
      t_grad: (R, tau) per-ray t-embedding gradient (scatter-add to the
             embedding table by ray image id outside).
    `use_beta_w` is the traced warm-up mix; ignored when use_beta=False.

    return_weights=True appends a 4th return: the (R, S) per-sample
    compositing weights (stop-gradient data) the coarse pass of a
    hierarchical (n_importance > 0) train step feeds to sample_pdf
    (rendering.py:118-125) to place the fine model's samples.
    """
    r, s = z_vals.shape
    t_part = (t_embed.astype(jnp.float32) if (t_embed is not None and use_beta)
              else jnp.zeros((r, tau), jnp.float32))
    rays16 = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         (sun_dir.astype(jnp.float32) if sun_dir is not None
          else jnp.zeros((r, 3), jnp.float32)),
         t_part, jnp.zeros((r, IN_COLS - 9 - tau), jnp.float32)], axis=-1,
    )
    z = z_vals.astype(jnp.float32)
    if noise is None:
        noise = jnp.zeros((r, s), jnp.float32)
    gt16 = jnp.concatenate(
        [gt_rgb.astype(jnp.float32),
         jnp.zeros((r, IN_COLS - 3), jnp.float32)], axis=-1,
    )
    packed = pack_params(params, layers, feat, skip, use_beta, tau, dtype)
    plist = _order(packed)
    names = [k for k in _PACKED_ORDER
             if use_beta or not k.startswith(("Wbeta", "bbeta"))]

    tile_r = max(8, (_bwd_points(dtype) // s) // 8 * 8)
    r_pad = ((r + tile_r - 1) // tile_r) * tile_r
    if r_pad != r:
        rays16 = jnp.pad(rays16, ((0, r_pad - r), (0, 0)))
        z = jnp.pad(z, ((0, r_pad - r), (0, 0)), constant_values=1.0)
        noise = jnp.pad(noise, ((0, r_pad - r), (0, 0)))
        gt16 = jnp.pad(gt16, ((0, r_pad - r), (0, 0)))
    scal = jnp.reshape(jnp.asarray(use_beta_w, jnp.float32), (1, 1))

    kernel = _make_train_loss_bwd_kernel(layers, skip, use_beta, rgb_padding,
                                         dtype, tau, beta_min, r, tile_r,
                                         weights_out=return_weights)
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
    weight_specs = ()
    weight_shapes = ()
    if return_weights:
        weight_specs = (pl.BlockSpec((tile_r, s), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),)
        weight_shapes = (jax.ShapeDtypeStruct((r_pad, s), jnp.float32),)
    loss_acc, din, *rest = pl.pallas_call(
        kernel,
        grid=(r_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
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
            pl.BlockSpec((tile_r, IN_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
            *grad_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, IN_COLS), jnp.float32),
            *weight_shapes,
            *(jax.ShapeDtypeStruct(p.shape, jnp.float32)
              for p in plist),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )(scal, rays16, z, noise, gt16, *plist)
    if return_weights:
        weights, grads = rest[0][:r], rest[1:]
    else:
        weights, grads = None, rest

    parts = {
        "color_sat": loss_acc[0, 0] / (3.0 * r),
        "logbeta": (3.0 + loss_acc[0, 1] / r) / 2.0,
        "mse": loss_acc[0, 2] / (3.0 * r),
    }
    g_named = dict(zip(names, grads))
    param_grads = unpack_grads(g_named, params, layers, feat, skip, use_beta)
    t_grad = din[:r, 9:9 + tau]
    if return_weights:
        return parts, param_grads, t_grad, jax.lax.stop_gradient(weights)
    return parts, param_grads, t_grad
