"""Model-layer tests: output channels per variant, init distributions, and
positional-encoding semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satnerf_tpu.models import (
    RadianceField,
    TransientEmbedding,
    build_model,
    positional_encoding,
)


def _init(model, key, t_dim=4):
    xyz = jnp.zeros((2, 3))
    return model.init(key, xyz, view_dir=jnp.zeros((2, 3)),
                      sun_dir=jnp.zeros((2, 3)),
                      t_embed=jnp.zeros((2, t_dim)))["params"]


class TestVariants:
    def test_nerf_outputs(self):
        m = build_model("nerf", 2, 32)
        p = _init(m, jax.random.PRNGKey(0))
        out = m.apply({"params": p}, jnp.ones((5, 3)), view_dir=jnp.ones((5, 3)))
        assert set(out) == {"rgb", "sigma"}
        assert out["rgb"].shape == (5, 3)
        assert out["sigma"].shape == (5,)

    def test_snerf_outputs(self):
        m = build_model("s-nerf", 2, 32)
        p = _init(m, jax.random.PRNGKey(0))
        out = m.apply({"params": p}, jnp.ones((5, 3)), sun_dir=jnp.ones((5, 3)))
        assert set(out) == {"rgb", "sigma", "sun_v", "sky_rgb"}
        assert out["sun_v"].shape == (5, 1)
        assert out["sky_rgb"].shape == (5, 3)

    def test_satnerf_outputs(self):
        m = build_model("sat-nerf", 2, 32)
        p = _init(m, jax.random.PRNGKey(0))
        out = m.apply({"params": p}, jnp.ones((5, 3)), sun_dir=jnp.ones((5, 3)),
                      t_embed=jnp.ones((5, 4)))
        assert set(out) == {"rgb", "sigma", "sun_v", "sky_rgb", "beta"}
        assert out["beta"].shape == (5, 1)

    def test_sigma_only(self):
        m = build_model("nerf", 2, 32)
        p = _init(m, jax.random.PRNGKey(0))
        out = m.apply({"params": p}, jnp.ones((5, 3)), sigma_only=True)
        assert set(out) == {"sigma"}

    def test_output_ranges(self):
        """sigma/beta >= 0 (softplus), sun_v in (0,1), rgb in padded range."""
        m = build_model("sat-nerf", 3, 32)
        p = _init(m, jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (100, 3))
        out = m.apply({"params": p}, x, sun_dir=jnp.ones((100, 3)),
                      t_embed=jnp.ones((100, 4)))
        assert float(out["sigma"].min()) >= 0
        assert float(out["beta"].min()) >= 0
        assert 0 <= float(out["sun_v"].min()) and float(out["sun_v"].max()) <= 1
        pad = 0.001
        assert float(out["rgb"].min()) >= -pad - 1e-6
        assert float(out["rgb"].max()) <= 1 + pad + 1e-6


class TestInit:
    def test_siren_init_distribution(self):
        """Trunk kernels: U(+-sqrt(6/fan_in)); first layer U(+-1/fan_in)."""
        m = build_model("sat-nerf", 8, 512)
        p = _init(m, jax.random.PRNGKey(0))
        k1 = np.asarray(p["fc_1"]["Dense_0"]["kernel"])
        bound = np.sqrt(6 / 512)
        assert np.abs(k1).max() <= bound + 1e-6
        assert np.abs(k1).max() > bound * 0.98  # actually fills the range
        k0 = np.asarray(p["fc_0"]["Dense_0"]["kernel"])
        assert np.abs(k0).max() <= 1 / 3 + 1e-6  # fan_in=3

    def test_torch_default_init_distribution(self):
        m = build_model("nerf", 8, 256)
        p = _init(m, jax.random.PRNGKey(0))
        k = np.asarray(p["fc_1"]["Dense_0"]["kernel"])
        bound = 1 / np.sqrt(256)
        assert np.abs(k).max() <= bound + 1e-6
        assert np.abs(k).max() > bound * 0.98

    def test_param_count_sat_nerf(self):
        """8x512 Sat-NeRF trunk: 3*512+512 first layer, skip layer 515*512."""
        m = build_model("sat-nerf", 8, 512)
        p = _init(m, jax.random.PRNGKey(0))
        assert p["fc_0"]["Dense_0"]["kernel"].shape == (3, 512)
        assert p["fc_4"]["Dense_0"]["kernel"].shape == (512 + 3, 512)
        assert p["sigma_head"]["Dense_0"]["kernel"].shape == (512, 1)
        assert p["sun_v_0"]["Dense_0"]["kernel"].shape == (512 + 3, 256)
        assert p["beta_0"]["Dense_0"]["kernel"].shape == (512 + 4, 256)

    def test_nerf_mapping_sizes(self):
        """nerf variant: encoded xyz 60-d, dir 24-d (mapping_sizes 10/4)."""
        m = build_model("nerf", 8, 256)
        p = _init(m, jax.random.PRNGKey(0))
        assert p["fc_0"]["Dense_0"]["kernel"].shape == (60, 256)
        assert p["rgb_0"]["Dense_0"]["kernel"].shape == (256 + 24, 128)


class TestPositionalEncoding:
    def test_ordering_matches_reference(self):
        """Per-frequency [sin(f x), cos(f x)] blocks (models/nerf.py:63-69)."""
        x = jnp.array([[0.1, 0.2, 0.3]])
        enc = positional_encoding(x, 3)
        assert enc.shape == (1, 18)
        expect = []
        for f in [1.0, 2.0, 4.0]:
            expect.extend(np.sin(f * np.array([0.1, 0.2, 0.3])))
            expect.extend(np.cos(f * np.array([0.1, 0.2, 0.3])))
        np.testing.assert_allclose(enc[0], expect, atol=1e-6)


class TestEmbedding:
    def test_lookup(self):
        emb = TransientEmbedding(30, 4)
        p = emb.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))["params"]
        out = emb.apply({"params": p}, jnp.array([0, 5, 29]))
        assert out.shape == (3, 4)
        tab = np.asarray(p["embedding"])
        assert tab.shape == (30, 4)
        # torch nn.Embedding init: N(0, 1)
        assert 0.8 < tab.std() < 1.2
