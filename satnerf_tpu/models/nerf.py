"""Radiance-field MLPs: NeRF, Shadow-NeRF, and Sat-NeRF variants.

One parameterized flax module (`RadianceField`) replaces the reference's three
near-duplicate ~200-line classes (models/nerf.py:135-226, models/snerf.py:78-196,
models/satnerf.py:81-207). Architecture parity, head for head:

  trunk    : `layers` x `feat` Dense with skip-concat of the encoded input at
             layer indices in `skips` (reference fc_net, skip at 4)
  sigma    : Dense(feat -> 1) + softplus                  (sigma_from_xyz)
  feats    : Dense(feat -> feat), no nonlinearity         (feats_from_xyz)
  rgb      : Dense(feat [+ dir enc] -> feat//2) + act, Dense -> 3 + sigmoid,
             then the Barron rgb_padding affine           (rgb_from_xyzdir)
  sun_v    : [shadow] Dense(feat+3 -> feat//2) x3 + Dense -> 1 + sigmoid
  sky      : [shadow] Dense(3 -> feat//2) + relu, Dense -> 3 + sigmoid
  beta     : [sat]    Dense(feat + t_dim -> feat//2) + act, Dense -> 1 + softplus

Activations: Siren sin(w0*x) (w0=30 first trunk layer, w0=1 elsewhere) when
`siren=True` (the s-nerf/sat-nerf default), ReLU otherwise. Initialization
reproduces the torch distributions: torch Linear default U(+-1/sqrt(fan_in))
for both kernel and bias; SIREN layers U(+-sqrt(6/fan_in)) with the first
trunk layer U(+-1/fan_in) (reference models/nerf.py:9-21).

All shapes are static and MXU-friendly: the trunk is a chain of
(N, feat) x (feat, feat) matmuls over N = rays * samples points.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------- initializers


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(+-1/sqrt(fan_in)). shape = (in, out)."""
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_factory(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def siren_kernel_init(key, shape, dtype=jnp.float32):
    """sine_init: U(+-sqrt(6/fan_in)) (reference models/nerf.py:9-14)."""
    bound = jnp.sqrt(6.0 / shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def siren_first_kernel_init(key, shape, dtype=jnp.float32):
    """first_layer_sine_init: U(+-1/fan_in) (reference models/nerf.py:16-21)."""
    bound = 1.0 / shape[0]
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchDense(nn.Module):
    """Dense layer with torch.nn.Linear's default init (or a SIREN kernel).

    `dtype` is the compute dtype (bfloat16 halves MXU cycles and HBM traffic
    on TPU); params always stay float32 for optimizer stability.
    """

    features: int
    kernel_init_kind: str = "torch"  # torch | siren | siren_first
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kinit = {
            "torch": torch_linear_kernel_init,
            "siren": siren_kernel_init,
            "siren_first": siren_first_kernel_init,
        }[self.kernel_init_kind]
        # torch draws the bias bound from the layer fan_in in all cases
        return nn.Dense(
            self.features,
            kernel_init=kinit,
            bias_init=torch_linear_bias_factory(x.shape[-1]),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


# ------------------------------------------------------------------- encodings


def positional_encoding(x: jnp.ndarray, n_freqs: int, logscale: bool = True):
    """(x) -> (sin(2^k x), cos(2^k x), ...) for k in 0..n_freqs-1.

    Matches the reference Mapping module (models/nerf.py:36-69): the identity
    term is NOT included, and per-frequency ordering is [sin(f*x), cos(f*x)]
    over all input channels.
    """
    if logscale:
        freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs, dtype=x.dtype)
    # (..., F, C) -> interleave sin/cos per frequency, then flatten
    xf = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # (..., F, 2C)
    return enc.reshape(*x.shape[:-1], n_freqs * 2 * x.shape[-1])


# ----------------------------------------------------------------------- model


class RadianceField(nn.Module):
    """Parameterized NeRF / Shadow-NeRF / Sat-NeRF field.

    Call with per-point inputs; all leading dims are preserved:
      xyz      (..., 3)   scene-normalized position
      view_dir (..., 3)   only used when use_view_dirs (classic nerf w/ dirs)
      sun_dir  (..., 3)   only used when use_shadow
      t_embed  (..., t_dim) only used when use_beta
    Returns a dict with rgb (...,3), sigma (...,), and for shadow variants
    sun_v (...,1), sky_rgb (...,3), and for sat-nerf beta (...,1).
    """

    layers: int = 8
    feat: int = 256
    mapping: bool = True
    mapping_sizes: Sequence[int] = (10, 4)
    skips: Sequence[int] = (4,)
    siren: bool = False
    use_view_dirs: bool = True
    use_shadow: bool = False
    use_beta: bool = False
    rgb_padding: float = 0.001
    dtype: Any = jnp.float32  # compute dtype for Dense layers (params stay f32)

    def _act(self, x, first=False):
        if self.siren:
            return jnp.sin((30.0 if first else 1.0) * x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, xyz, view_dir=None, sun_dir=None, t_embed=None,
                 sigma_only: bool = False):
        enc_xyz = (
            positional_encoding(xyz, self.mapping_sizes[0]) if self.mapping else xyz
        )

        # trunk (reference fc_net)
        h = enc_xyz
        for i in range(self.layers):
            if i in self.skips:
                h = jnp.concatenate([enc_xyz, h], axis=-1)
            kind = (
                "siren_first" if (self.siren and i == 0)
                else ("siren" if self.siren else "torch")
            )
            h = TorchDense(self.feat, kernel_init_kind=kind, dtype=self.dtype, name=f"fc_{i}")(h)
            h = self._act(h, first=(i == 0))
        shared = h

        sigma = nn.softplus(
            TorchDense(1, dtype=self.dtype, name="sigma_head")(shared)
        )[..., 0].astype(jnp.float32)
        if sigma_only:
            return {"sigma": sigma}

        feats = TorchDense(self.feat, dtype=self.dtype, name="feats_head")(shared)

        if self.use_view_dirs and view_dir is not None:
            enc_dir = (
                positional_encoding(view_dir, self.mapping_sizes[1])
                if self.mapping
                else view_dir
            )
            rgb_in = jnp.concatenate([feats, enc_dir], axis=-1)
        else:
            rgb_in = feats
        r = TorchDense(self.feat // 2, dtype=self.dtype, name="rgb_0")(rgb_in)
        r = self._act(r)
        rgb = nn.sigmoid(TorchDense(3, dtype=self.dtype, name="rgb_1")(r)).astype(jnp.float32)
        rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding

        out = {"rgb": rgb, "sigma": sigma}

        if self.use_shadow:
            # sun visibility head: siren acts like the trunk (snerf.py:124-136)
            sv = jnp.concatenate([feats, sun_dir], axis=-1)
            kind0 = "siren_first" if self.siren else "torch"
            kind = "siren" if self.siren else "torch"
            sv = TorchDense(self.feat // 2, kernel_init_kind=kind0, dtype=self.dtype, name="sun_v_0")(sv)
            # reference uses Siren() with default w0=1 here, not w0=30
            sv = jnp.sin(sv) if self.siren else nn.relu(sv)
            for i in range(1, 3):
                sv = TorchDense(self.feat // 2, kernel_init_kind=kind, dtype=self.dtype, name=f"sun_v_{i}")(sv)
                sv = self._act(sv)
            sun_v = nn.sigmoid(
                TorchDense(1, dtype=self.dtype, name="sun_v_out")(sv)
            ).astype(jnp.float32)

            sky = TorchDense(self.feat // 2, dtype=self.dtype, name="sky_0")(sun_dir)
            sky = nn.relu(sky)
            sky_rgb = nn.sigmoid(
                TorchDense(3, dtype=self.dtype, name="sky_1")(sky)
            ).astype(jnp.float32)
            out["sun_v"] = sun_v
            out["sky_rgb"] = sky_rgb

        if self.use_beta:
            b = jnp.concatenate([feats, t_embed], axis=-1)
            b = TorchDense(self.feat // 2, dtype=self.dtype, name="beta_0")(b)
            b = self._act(b)
            beta = nn.softplus(
                TorchDense(1, dtype=self.dtype, name="beta_1")(b)
            ).astype(jnp.float32)
            out["beta"] = beta

        return out


class TransientEmbedding(nn.Module):
    """Per-image transient embedding (reference main.py:56-58: nn.Embedding(30, 4)).

    torch nn.Embedding default init is N(0, 1); we match that.
    """

    vocab: int = 30
    dim: int = 4

    @nn.compact
    def __call__(self, ts):
        table = self.param(
            "embedding", lambda k, s: jax.random.normal(k, s), (self.vocab, self.dim)
        )
        return table[ts]


# --------------------------------------------------------------------- factory


def build_model(variant: str, fc_layers: int = 8, fc_units: int = 512,
                mapping_sizes: Sequence[int] = (10, 4),
                dtype: Any = jnp.float32) -> RadianceField:
    """Variant factory mirroring models/__init__.py:6-15 defaults:

      nerf     : positional mapping, ReLU, view dirs, no shadow/beta
      s-nerf   : no mapping, SIREN, no view dirs, shadow heads
      sat-nerf : no mapping, SIREN, no view dirs, shadow heads + beta head
    """
    if variant == "nerf":
        return RadianceField(
            layers=fc_layers, feat=fc_units, mapping=True,
            mapping_sizes=tuple(mapping_sizes), siren=False,
            use_view_dirs=True, use_shadow=False, use_beta=False, dtype=dtype,
        )
    if variant == "s-nerf":
        return RadianceField(
            layers=fc_layers, feat=fc_units, mapping=False,
            mapping_sizes=tuple(mapping_sizes), siren=True,
            use_view_dirs=False, use_shadow=True, use_beta=False, dtype=dtype,
        )
    if variant == "sat-nerf":
        return RadianceField(
            layers=fc_layers, feat=fc_units, mapping=False,
            mapping_sizes=tuple(mapping_sizes), siren=True,
            use_view_dirs=False, use_shadow=True, use_beta=True, dtype=dtype,
        )
    raise ValueError(f"model {variant!r} is not valid")
