"""The training system: model construction, schedules, and the sharded
jit-compiled train step.

Replaces the reference's Lightning module (main.py:26-231) with a functional
design. One train step is a single XLA program that:

  1. draws this step's ray batch on-device from the device-resident dataset
     shard (no host->device transfer in the hot loop — the reference's
     DataLoader workers + pin_memory round trip is gone entirely),
  2. renders + computes the scheduled loss (beta warm-up, solar correction,
     depth supervision drop) from the step counter,
  3. computes grads, psums them across the mesh's ray axis, applies Adam.

Parameters are replicated; rays are sharded (see parallel/mesh.py).

Schedule parity with the reference:
  lr        : Adam 5e-4 * 0.9^epoch, epoch = step // (len // batch)
              (train_utils.py:41-57, main.py:81-94)
  beta      : SNerfLoss until (step+1) // spe >= first_beta_epoch, then
              SatNerfLoss (main.py:128-131; the reference's train_steps
              counter is 1-based — incremented before the check)
  noise_std : noise_std0 * 0.9^step (main.py:132's per-step decay, expressed
              as a pure function of step)
  depth     : added while step + 1 < round(ds_drop * max_steps)
              (main.py:38,139, 1-based counter)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from satnerf_tpu.config import Config
from satnerf_tpu.models import RadianceField, TransientEmbedding, build_model
from satnerf_tpu.parallel.mesh import DATA_AXIS, make_mesh
from satnerf_tpu.render import RenderConfig, render_rays
from satnerf_tpu.train import losses as L


def steps_per_epoch(dataset_len: int, batch_size: int) -> int:
    """Reference epoch definition (train_utils.py:14-15)."""
    return max(1, dataset_len // batch_size)


def epoch_draw_positions(step, spe: int, b_local: int, n_local: int):
    """Permutation slots for `--sampling shuffle`: step s of an epoch reads
    slots [s*b_local, (s+1)*b_local) of the per-epoch shard permutation, so
    draws within an epoch are disjoint (spe*b_local <= n_local by the epoch
    definition). Shared by the jitted step and its test."""
    pos = (step % spe) * b_local + jnp.arange(b_local)
    return pos % n_local


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


class NeRFSystem:
    """Owns model defs, optimizer, mesh, and the compiled step functions."""

    def __init__(self, cfg: Config, dataset_len: int = 0,
                 depth_dataset_len: int = 0, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.n_devices)
        self.n_devices = self.mesh.devices.size
        # eval/DSM grids stay host-local (parallel/distributed.py): when the
        # train mesh spans processes, render_image shards over THIS host's
        # chips only, so validation needs no cross-host gathers
        self.eval_mesh = self.mesh
        if any(d.process_index != jax.process_index()
               for d in self.mesh.devices.flat):
            from jax.sharding import Mesh

            local = [d for d in self.mesh.devices.flat
                     if d.process_index == jax.process_index()]
            self.eval_mesh = Mesh(np.array(local), self.mesh.axis_names)
        # epoch = one pass over the data at the EFFECTIVE batch
        # (batch_size * grad_accum rays consumed per optimizer step)
        self.spe = steps_per_epoch(dataset_len or cfg.batch_size,
                                   cfg.batch_size * cfg.grad_accum)
        self.use_ts = cfg.model == "sat-nerf"
        self.depth = cfg.ds_lambda > 0
        self.ds_drop_step = int(round(cfg.ds_drop * cfg.max_train_steps))

        # "auto" resolves per backend: bf16 matmuls on a real accelerator
        # (the configuration every headline number describes), f32 on CPU
        use_bf16 = cfg.precision == "bfloat16" or (
            cfg.precision == "auto" and jax.default_backend() != "cpu"
        )
        compute_dtype = self.compute_dtype = (
            jnp.bfloat16 if use_bf16 else jnp.float32
        )
        self.models = {
            "coarse": build_model(cfg.model, cfg.fc_layers, cfg.fc_units,
                                  dtype=compute_dtype)
        }
        if cfg.n_importance > 0:
            self.models["fine"] = build_model(cfg.model, cfg.fc_layers,
                                              cfg.fc_units, dtype=compute_dtype)

        # fused Pallas kernels: replace the XLA MLP on TPU for all three
        # variants (not on CPU, where only interpret mode exists). Resolved
        # modes: "rays" = in-kernel sample expansion + fused train/serve
        # compositor (shadow variants), "points" = pre-expanded field kernel,
        # "off" = flax/XLA. "auto" resolves to the fastest eligible mode.
        if cfg.fused == "off":
            self.fused_mode = "off"
        elif cfg.fused == "rays":
            self.fused_mode = ("rays" if cfg.model in ("s-nerf", "sat-nerf")
                               else "points")
        elif cfg.fused == "on":
            self.fused_mode = "points"
        elif jax.default_backend() in ("cpu",):
            self.fused_mode = "off"
        else:
            self.fused_mode = ("rays" if cfg.model in ("s-nerf", "sat-nerf")
                               else "points")
        self.use_fused = self.fused_mode != "off"
        if self.fused_mode == "rays":
            # ray-mode kernel: the o + d*z sample expansion happens inside
            # the kernel as MXU matmuls against iota-built selection/shift
            # matrices (no relayouts — see ops/pallas/fused_mlp._expand_rays),
            # eliminating the XLA-side (N,16) point tensors whose 128-lane
            # tiling wastes 8x HBM bandwidth in the glue.
            from satnerf_tpu.ops.pallas.fused_mlp import fused_field_apply_rays

            def fused_apply_rays(params, rays_o, march_d, sun_d, t_embed,
                                 z_vals, _cfg=cfg, _dtype=compute_dtype):
                return fused_field_apply_rays(
                    params, rays_o, march_d, sun_d, t_embed, z_vals,
                    layers=_cfg.fc_layers, feat=_cfg.fc_units, skip=4,
                    use_beta=(_cfg.model == "sat-nerf"),
                    tau=_cfg.t_embbeding_tau, dtype=_dtype,
                )

            fused_apply_rays.ray_mode = True
            self.field_fns = {k: fused_apply_rays for k in self.models}
        elif self.fused_mode == "points" and cfg.model in ("s-nerf", "sat-nerf"):
            # point-mode kernel (default): pre-expanded (N, 16) inputs
            from satnerf_tpu.ops.pallas.fused_mlp import fused_field_apply

            def fused_apply(params, xyz, view_dir, sun_dir, t_embed,
                            _cfg=cfg, _dtype=compute_dtype):
                return fused_field_apply(
                    params, xyz, sun_dir, t_embed,
                    layers=_cfg.fc_layers, feat=_cfg.fc_units, skip=4,
                    use_beta=(_cfg.model == "sat-nerf"),
                    tau=_cfg.t_embbeding_tau, dtype=_dtype,
                )

            self.field_fns = {k: fused_apply for k in self.models}
        elif self.use_fused and cfg.model == "nerf":
            from satnerf_tpu.ops.pallas.fused_nerf import fused_nerf_apply

            def fused_apply(params, xyz, view_dir, sun_dir, t_embed,
                            _cfg=cfg, _dtype=compute_dtype):
                return fused_nerf_apply(
                    params, xyz, view_dir,
                    layers=_cfg.fc_layers, feat=_cfg.fc_units, skip=4,
                    dtype=_dtype,
                )

            self.field_fns = {k: fused_apply for k in self.models}
        else:
            self.field_fns = dict(self.models)
        if self.use_ts:
            self.embedding = TransientEmbedding(cfg.t_embbeding_vocab,
                                                cfg.t_embbeding_tau)

        self.render_cfg = RenderConfig(
            variant=cfg.model,
            n_samples=cfg.n_samples,
            n_importance=cfg.n_importance,
            perturb=1.0,
            solar_correction=cfg.sc_lambda > 0,
        )
        self.eval_render_cfg = RenderConfig(
            variant=cfg.model,
            n_samples=cfg.n_samples,
            n_importance=cfg.n_importance,
            perturb=0.0,
            solar_correction=False,
        )

        from satnerf_tpu.train.schedules import get_schedule

        num_epochs = max(cfg.max_train_steps // self.spe, 1)
        self.lr_schedule = get_schedule(cfg.lr_scheduler, cfg.lr, num_epochs,
                                        self.spe)
        self.tx = optax.adam(learning_rate=self.lr_schedule)

    # ------------------------------------------------------------------ init

    def init_params(self, key) -> dict:
        cfg = self.cfg
        keys = jax.random.split(key, 4)
        xyz = jnp.zeros((2, self.cfg.n_samples, 3))
        dirs = jnp.zeros((2, self.cfg.n_samples, 3))
        t_e = jnp.zeros((2, self.cfg.n_samples, cfg.t_embbeding_tau))
        kw = dict(view_dir=dirs, sun_dir=dirs, t_embed=t_e)
        params = {
            "coarse": self.models["coarse"].init(keys[0], xyz, **kw)["params"]
        }
        if "fine" in self.models:
            params["fine"] = self.models["fine"].init(keys[1], xyz, **kw)["params"]
        if self.use_ts:
            params["t"] = self.embedding.init(
                keys[2], jnp.zeros((2,), jnp.int32)
            )["params"]
        return params

    def init_state(self, key) -> TrainState:
        params = self.init_params(key)
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # ----------------------------------------------------------------- render

    def _embed_ts(self, params, ts):
        if self.use_ts and ts is not None:
            return self.embedding.apply({"params": params["t"]}, ts)
        return None

    def render(self, params, rays, ts, key, train: bool, noise_std=None):
        cfg = self.render_cfg if train else self.eval_render_cfg
        t_embed = self._embed_ts(params, ts)
        return render_rays(self.field_fns, params, rays, t_embed, key, cfg,
                           noise_std=noise_std)

    @property
    def _use_fused_product_render(self) -> bool:
        """Eval/serving can composite inside the kernel (fused_render_rays /
        fused_nerf_render_rays) whenever a fused field kernel is active —
        the SIREN ray-mode path, or any fused mode on the nerf variant
        (whose ray-mode render kernel exists even though its train path is
        point-mode). n_importance > 0 runs as a two-kernel dispatch: coarse
        render (with a per-sample weights output) -> sample_pdf -> fine
        render over the sorted union of samples (rendering.py:118-156)."""
        return (self.fused_mode == "rays"
                or (self.use_fused and self.cfg.model == "nerf"))

    @property
    def _use_fused_train_render(self) -> bool:
        """Training can composite inside the kernel too
        (fused_train_render_rays, custom compositor VJP) on the coarse-only
        SIREN ray-mode path. The solar-correction sun-ray pass stays on the
        per-sample ray-mode field (its loss consumes per-sample
        weights/transparency — docs/KERNEL_NOTES.md)."""
        return self.fused_mode == "rays" and self.cfg.n_importance == 0

    @property
    def _use_fused_train_loss(self) -> bool:
        """The primary pass goes further on the same gate: loss + loss
        adjoint + compositor adjoint + field backward in ONE kernel
        (fused_train_loss_grads) — no separate forward launch. sc/depth
        terms run as separate passes whose grads add. Hierarchical training
        (n_importance > 0) runs as a two-launch dispatch: coarse kernel
        (per-sample weights out) -> sample_pdf -> fine kernel over the
        sorted sample union, mirroring the serving dispatch
        (rendering.py:118-156). The nerf variant has its own single-kernel
        step (fused_nerf_train_loss_grads, plain MSE); depth-supervised
        nerf falls back to the standard path (its depth render would need
        a differentiable fused nerf render)."""
        if self.fused_mode == "rays":
            return True
        return (self.use_fused and self.cfg.model == "nerf"
                and self.cfg.n_importance == 0 and not self.depth)

    def _fused_product_render(self, params, rays, ts, key) -> dict:
        """Render per-ray products entirely on-chip (expansion + field +
        compositing in one Pallas kernel) and repack them in the
        reference-shaped results dict: the per-sample extras come back
        pre-integrated with a singleton sample axis and weights == 1, so
        eval/images.py's host-side `(weights * q).sum(-2)` reductions
        (reference eval_satnerf.py:95-146) are the identity."""
        from satnerf_tpu.ops.pallas.fused_mlp import fused_render_rays
        from satnerf_tpu.ops.pallas.fused_nerf import fused_nerf_render_rays
        from satnerf_tpu.render.sampling import (merge_sorted_zvals,
                                                 sample_pdf, stratified_zvals)

        cfg = self.eval_render_cfg
        n_imp = cfg.n_importance
        is_nerf = self.cfg.model == "nerf"
        t_embed = self._embed_ts(params, ts)
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 6:7], rays[:, 7:8]
        sun_d = rays[:, 8:11] if rays.shape[1] >= 11 else None
        k_z, k_pdf = jax.random.split(key)
        z_vals = stratified_zvals(k_z, near, far, cfg.n_samples, cfg.perturb,
                                  cfg.use_disp)

        def run(model_params, z, want_weights):
            if is_nerf:
                return fused_nerf_render_rays(
                    model_params, rays_o, rays_d, z,
                    layers=self.cfg.fc_layers, feat=self.cfg.fc_units, skip=4,
                    dtype=self.compute_dtype, return_weights=want_weights,
                )
            return fused_render_rays(
                model_params, rays_o, rays_d, sun_d, t_embed, z,
                layers=self.cfg.fc_layers, feat=self.cfg.fc_units, skip=4,
                use_beta=(self.cfg.model == "sat-nerf"),
                tau=self.cfg.t_embbeding_tau, dtype=self.compute_dtype,
                return_weights=want_weights,
            )

        def pack(out, suffix, n):
            res = {
                f"rgb_{suffix}": out["rgb"],
                f"depth_{suffix}": out["depth"],
                f"opacity_{suffix}": out["opacity"],
                f"weights_{suffix}": jnp.ones((n, 1), jnp.float32),
            }
            if not is_nerf:
                res.update({
                    f"sun_{suffix}": out["sun"][:, None, :],
                    f"albedo_{suffix}": out["albedo"][:, None, :],
                    f"sky_{suffix}": out["sky"][:, None, :],
                })
            if "beta" in out:
                res[f"beta_{suffix}"] = out["beta"][:, None, :]
            return res

        n = rays.shape[0]
        coarse = run(params["coarse"], z_vals, n_imp > 0)
        res = pack(coarse, "coarse", n)
        if n_imp > 0:
            # hierarchical resampling over the coarse weights, then one more
            # fused render with the fine model (rendering.py:118-156)
            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            z_fine = sample_pdf(k_pdf, z_mid, coarse["weights"][:, 1:-1],
                                n_imp, det=(cfg.perturb == 0))
            # sorted union via an 8-wide sort + rank merge instead of a
            # 72-wide per-ray sort — the serve-path glue lever (DESIGN.md)
            z_all = merge_sorted_zvals(z_vals, jnp.sort(z_fine, axis=-1))
            fine = run(params["fine"], z_all, False)
            res.update(pack(fine, "fine", n))
        return res

    def _fused_train_render(self, params, rays, ts, key, noise_std) -> dict:
        """Training render with in-kernel compositing (expansion + field +
        compositor in one Pallas kernel, custom VJP): the loss consumes only
        per-ray quantities (rgb/depth/opacity + pre-integrated beta), so the
        backward's incoming cotangent is (R, 16) instead of (R*S, 16).
        Solar correction keeps its per-sample sun-ray pass."""
        from satnerf_tpu.ops.pallas.fused_mlp import fused_train_render_rays
        from satnerf_tpu.render.render import _run_field
        from satnerf_tpu.render.sampling import stratified_zvals

        cfg = self.cfg
        rcfg = self.render_cfg
        # same 6-way split as render_rays so the fused and XLA train paths
        # draw identical z_vals / sigma noise / sc noise from the same key
        # (fused-vs-unfused training then matches to kernel f32 noise)
        k_z, k_noise, _, _, k_sc, _ = jax.random.split(key, 6)
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 6:7], rays[:, 7:8]
        sun_d = rays[:, 8:11] if rays.shape[1] >= 11 else None
        t_embed = self._embed_ts(params, ts)
        z_vals = stratified_zvals(k_z, near, far, rcfg.n_samples, rcfg.perturb,
                                  rcfg.use_disp)
        noise = None
        if noise_std is not None:
            noise = noise_std * jax.random.normal(k_noise, z_vals.shape,
                                                  jnp.float32)
        out = fused_train_render_rays(
            params["coarse"], rays_o, rays_d, sun_d, t_embed, z_vals, noise,
            layers=cfg.fc_layers, feat=cfg.fc_units, skip=4,
            use_beta=(cfg.model == "sat-nerf"), tau=cfg.t_embbeding_tau,
            dtype=self.compute_dtype,
        )
        results = {
            "rgb_coarse": out["rgb"],
            "depth_coarse": out["depth"],
            "opacity_coarse": out["opacity"],
        }
        if "beta" in out:
            results["beta_ray_coarse"] = out["beta"]
        if rcfg.solar_correction and sun_d is not None:
            sc = _run_field(self.field_fns["coarse"], params["coarse"],
                            rays_o, sun_d, None, sun_d, t_embed, z_vals,
                            k_sc, noise_std, shadow=True)
            results["weights_sc_coarse"] = sc["weights"]
            results["transparency_sc_coarse"] = sc["transparency"]
            results["sun_sc_coarse"] = sc["sun"]
        return results

    # ------------------------------------------------------------- schedules

    def _noise_std(self, step):
        if self.cfg.noise_std == 0.0:
            return None
        return self.cfg.noise_std * jnp.power(0.9, step.astype(jnp.float32))

    # ------------------------------------------------------------ train step

    def _loss_and_metrics(self, params, rays, rgbs, ts, key, step,
                          d_rays=None, d_targets=None, d_ts=None):
        cfg = self.cfg
        k_render, k_depth = jax.random.split(key)
        noise_std = self._noise_std(step)
        if self._use_fused_train_render:
            results = self._fused_train_render(params, rays, ts, k_render,
                                               noise_std)
        else:
            results = self.render(params, rays, ts, k_render, train=True,
                                  noise_std=noise_std)

        if cfg.model == "sat-nerf":
            loss_sat, _ = L.satnerf_loss(results, rgbs, cfg.sc_lambda)
            loss_warm, _ = L.snerf_loss(results, rgbs, cfg.sc_lambda)
            # the reference's step counter is incremented BEFORE the epoch
            # check (main.py:120,128: train_steps is 1-based), so the beta
            # loss switches on one step earlier than a 0-based epoch would —
            # pinned by the executed-trajectory parity test
            epoch = (step + 1) // self.spe
            use_beta = (epoch >= cfg.first_beta_epoch).astype(jnp.float32)
            loss = use_beta * loss_sat + (1.0 - use_beta) * loss_warm
        elif cfg.model == "s-nerf":
            loss, _ = L.snerf_loss(results, rgbs, cfg.sc_lambda)
        else:
            loss, _ = L.nerf_loss(results, rgbs)

        metrics = {"loss": loss}
        if self.depth and d_rays is not None:
            if self._use_fused_train_render:
                d_results = self._fused_train_render(params, d_rays, d_ts,
                                                     k_depth, noise_std)
            else:
                d_results = self.render(params, d_rays, d_ts, k_depth,
                                        train=True, noise_std=noise_std)
            kp_depths = d_targets[:, 0]
            kp_weights = 1.0 if cfg.ds_noweights else d_targets[:, 1]
            loss_depth, _ = L.depth_loss(d_results, kp_depths, kp_weights,
                                         cfg.ds_lambda)
            # main.py:139 compares the 1-based train_steps counter
            active = (step + 1 < self.ds_drop_step).astype(jnp.float32)
            loss = loss + active * loss_depth
            metrics["loss_depth"] = loss_depth

        typ = "fine" if "rgb_fine" in results else "coarse"
        mse = jnp.mean((results[f"rgb_{typ}"] - rgbs) ** 2)
        metrics["psnr"] = -10.0 * jnp.log10(mse)
        metrics["loss_total"] = loss
        return loss, metrics

    def _fused_loss_and_grads(self, params, rays, rgbs, ts, key, step,
                              d_rays=None, d_targets=None, d_ts=None):
        """((loss, metrics), grads) for the fully fused primary pass — the
        drop-in replacement for value_and_grad(_loss_and_metrics): the main
        loss' gradient comes straight out of one kernel launch
        (fused_train_loss_grads); solar-correction and depth-supervision
        terms are separate render passes under value_and_grad whose grads
        add (gradients are additive across loss terms)."""
        from satnerf_tpu.ops.pallas.fused_mlp import fused_train_loss_grads
        from satnerf_tpu.render.sampling import stratified_zvals
        from satnerf_tpu.train.losses import BETA_MIN

        cfg = self.cfg
        rcfg = self.render_cfg
        k_render, k_depth = jax.random.split(key)
        # same 6-way split as render_rays so fused and XLA paths draw
        # identical z/noise/pdf randomness from the same key
        (k_z, k_noise, k_pdf, k_fine_noise,
         k_sc1, k_sc2) = jax.random.split(k_render, 6)
        noise_std = self._noise_std(step)
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 6:7], rays[:, 7:8]
        sun_d = rays[:, 8:11] if rays.shape[1] >= 11 else None
        z_vals = stratified_zvals(k_z, near, far, rcfg.n_samples,
                                  rcfg.perturb, rcfg.use_disp)
        noise = None
        if noise_std is not None:
            noise = noise_std * jax.random.normal(k_noise, z_vals.shape,
                                                  jnp.float32)

        if cfg.model == "nerf":
            from satnerf_tpu.ops.pallas.fused_nerf import (
                fused_nerf_train_loss_grads,
            )

            mse, g_coarse = fused_nerf_train_loss_grads(
                params["coarse"], rays_o, rays_d, z_vals, noise, rgbs,
                layers=cfg.fc_layers, feat=cfg.fc_units, skip=4,
                dtype=self.compute_dtype,
            )
            metrics = {"loss": mse, "psnr": -10.0 * jnp.log10(mse),
                       "loss_total": mse}
            return (mse, metrics), {"coarse": g_coarse}

        t_embed = self._embed_ts(params, ts)

        sat = cfg.model == "sat-nerf"
        if sat:
            # 1-based counter, matching main.py:120,128 (see _loss_and_metrics)
            epoch = (step + 1) // self.spe
            wmix = (epoch >= cfg.first_beta_epoch).astype(jnp.float32)
        else:
            wmix = jnp.zeros((), jnp.float32)

        def mix(p):
            if sat:
                return (wmix * (p["color_sat"] + p["logbeta"])
                        + (1.0 - wmix) * p["mse"])
            return p["mse"]

        n_imp = cfg.n_importance
        kernel_kw = dict(layers=cfg.fc_layers, feat=cfg.fc_units, skip=4,
                         use_beta=sat, tau=cfg.t_embbeding_tau,
                         dtype=self.compute_dtype)
        res_c = fused_train_loss_grads(
            params["coarse"], rays_o, rays_d, sun_d, t_embed, z_vals, noise,
            rgbs, wmix, beta_min=BETA_MIN,
            return_weights=(n_imp > 0), **kernel_kw,
        )
        if n_imp > 0:
            parts, g_coarse, d_t, w_coarse = res_c
        else:
            parts, g_coarse, d_t = res_c
        loss = mix(parts)
        grads = {"coarse": g_coarse}
        mse_for_psnr = parts["mse"]

        z_all = None
        if n_imp > 0:
            # hierarchical training as a two-launch dispatch: sample_pdf over
            # the (stop-gradient) coarse weights, then the same single-kernel
            # loss+grads over the sorted union with the fine model
            # (rendering.py:118-156; the reference detaches the resampled z)
            from satnerf_tpu.render.sampling import (merge_sorted_zvals,
                                                     sample_pdf)

            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            z_fine = sample_pdf(k_pdf, z_mid, w_coarse[:, 1:-1], n_imp,
                                det=(rcfg.perturb == 0))
            z_all = merge_sorted_zvals(z_vals, jnp.sort(z_fine, axis=-1))
            noise_fine = None
            if noise_std is not None:
                noise_fine = noise_std * jax.random.normal(
                    k_fine_noise, z_all.shape, jnp.float32)
            parts_f, g_fine, d_t_f = fused_train_loss_grads(
                params["fine"], rays_o, rays_d, sun_d, t_embed, z_all,
                noise_fine, rgbs, wmix, beta_min=BETA_MIN, **kernel_kw,
            )
            loss = loss + mix(parts_f)
            grads["fine"] = g_fine
            d_t = d_t + d_t_f
            mse_for_psnr = parts_f["mse"]

        if self.use_ts:
            grads["t"] = {"embedding": jax.ops.segment_sum(
                d_t, ts, num_segments=cfg.t_embbeding_vocab
            )}

        metrics = {}
        need_sc = rcfg.solar_correction and sun_d is not None
        need_depth = self.depth and d_rays is not None
        if need_sc:
            # secondary sun-ray pass, also loss-in-kernel: terms 2+3 and
            # their adjoint (which flows only through the sun-v head — the
            # reference detaches transparency/weights, metrics.py:29-30)
            # come out of one launch (fused_sc_loss_grads) per model
            from satnerf_tpu.ops.pallas.fused_mlp import fused_sc_loss_grads

            sc_passes = [("coarse", z_vals, k_sc1)]
            if n_imp > 0:
                sc_passes.append(("fine", z_all, k_sc2))
            for name, z_pass, k_sc in sc_passes:
                noise_sc = None
                if noise_std is not None:
                    noise_sc = noise_std * jax.random.normal(
                        k_sc, z_pass.shape, jnp.float32)
                sc_parts, g_sc = fused_sc_loss_grads(
                    params[name], rays_o, sun_d, t_embed, z_pass, noise_sc,
                    cfg.sc_lambda, **kernel_kw,
                )
                loss = loss + sc_parts["term2"] + sc_parts["term3"]
                grads[name] = jax.tree_util.tree_map(
                    lambda a, b: a + b, grads[name], g_sc
                )
        metrics["loss"] = loss  # main loss incl. sc, pre-depth

        if need_depth:
            def aux_fn(p):
                if self._use_fused_train_render:
                    d_res = self._fused_train_render(p, d_rays, d_ts, k_depth,
                                                     noise_std)
                else:
                    # hierarchical depth pass: the differentiable XLA render
                    # (over the ray-mode field kernel) handles coarse + fine
                    d_res = self.render(p, d_rays, d_ts, k_depth, train=True,
                                        noise_std=noise_std)
                kp_d = d_targets[:, 0]
                kp_w = 1.0 if cfg.ds_noweights else d_targets[:, 1]
                ld, _ = L.depth_loss(d_res, kp_d, kp_w, cfg.ds_lambda)
                # main.py:139 compares the 1-based train_steps counter
                active = (step + 1 < self.ds_drop_step).astype(jnp.float32)
                return active * ld, ld

            (aux_total, ld), aux_grads = jax.value_and_grad(
                aux_fn, has_aux=True
            )(params)
            metrics["loss_depth"] = ld
            loss = loss + aux_total
            grads = jax.tree_util.tree_map(lambda a, b: a + b, grads,
                                           aux_grads)

        metrics["psnr"] = -10.0 * jnp.log10(mse_for_psnr)
        metrics["loss_total"] = loss
        return (loss, metrics), grads

    def make_train_step(self):
        """Build the sharded, jitted train step.

        Signature: (state, data, key) -> (state, metrics)
        where data = (rays, rgbs, ts[, d_rays, d_depths, d_ts]) arrays already
        device-resident and sharded along axis 0.
        """
        cfg = self.cfg
        n_dev = self.n_devices
        b_local = cfg.batch_size // n_dev
        assert cfg.batch_size % n_dev == 0, (
            f"batch_size {cfg.batch_size} must divide across {n_dev} devices"
        )
        accum = cfg.grad_accum
        if accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {accum}")
        if accum > 1 and cfg.sampling == "shuffle":
            raise ValueError(
                "grad_accum > 1 requires --sampling replacement: the "
                "epoch-permutation walk is defined per optimizer step, not "
                "per micro-batch")

        spe = self.spe
        shuffle = cfg.sampling == "shuffle"

        def local_step(state, rays, rgbs, ts, d_rays, d_depths, d_ts, perm,
                       key):
            axis_idx = jax.lax.axis_index(DATA_AXIS)
            k = jax.random.fold_in(jax.random.fold_in(key, axis_idx), state.step)
            n_local = rays.shape[0]

            def draw_and_grads(k_idx, k_didx, k_loss, idx_override=None):
                """One micro-batch: draw b_local rays, return loss/metrics/
                grads (the whole pre-existing single-batch body)."""
                if idx_override is not None:
                    idx = idx_override
                else:
                    idx = jax.random.randint(k_idx, (b_local,), 0, n_local)
                b_rays = rays[idx]
                b_rgbs = rgbs[idx]
                b_ts = ts[idx] if ts is not None else None

                bd_rays = bd_targets = bd_ts = None
                if d_rays is not None:
                    nd_local = d_rays.shape[0]
                    didx = jax.random.randint(k_didx, (b_local,), 0, nd_local)
                    bd_rays = d_rays[didx]
                    bd_targets = d_depths[didx]
                    bd_ts = d_ts[didx]

                if self._use_fused_train_loss:
                    return self._fused_loss_and_grads(
                        state.params, b_rays, b_rgbs, b_ts, k_loss,
                        state.step, bd_rays, bd_targets, bd_ts,
                    )

                def loss_fn(params):
                    return self._loss_and_metrics(
                        params, b_rays, b_rgbs, b_ts, k_loss, state.step,
                        bd_rays, bd_targets, bd_ts,
                    )

                return jax.value_and_grad(loss_fn, has_aux=True)(state.params)

            if accum == 1:
                # key schedule byte-identical to the pre-accumulation step:
                # existing trajectories and resume determinism are preserved
                k_idx, k_didx, k_loss = jax.random.split(k, 3)
                if shuffle and perm is not None:
                    # without-replacement epoch semantics (reference
                    # DataLoader, main.py:96-117): walk a per-epoch
                    # device-resident permutation of the local shard; perm is
                    # refreshed at epoch boundaries by the loop
                    # (train/loop.py) from a per-epoch key
                    idx = perm[epoch_draw_positions(state.step, spe, b_local,
                                                    n_local)]
                else:
                    idx = None
                (loss, metrics), grads = draw_and_grads(k_idx, k_didx,
                                                        k_loss, idx)
            else:
                # gradient accumulation: `accum` independent micro-batches,
                # grads/metrics averaged, ONE optimizer update below. The
                # first micro-batch seeds the scan carry (no zero-tree
                # boilerplate); the rest run under lax.scan so the compiled
                # graph holds one copy of the loss body.
                ks = jax.random.split(k, accum)
                (loss, metrics), grads = draw_and_grads(
                    *jax.random.split(ks[0], 3))

                def body(carry, k_m):
                    c_loss, c_metrics, c_grads = carry
                    (l_i, m_i), g_i = draw_and_grads(
                        *jax.random.split(k_m, 3))
                    add = lambda a, b: a + b
                    return (c_loss + l_i,
                            jax.tree_util.tree_map(add, c_metrics, m_i),
                            jax.tree_util.tree_map(add, c_grads, g_i)), None

                (loss, metrics, grads), _ = jax.lax.scan(
                    body, (loss, metrics, grads), ks[1:])
                inv = 1.0 / accum
                loss = loss * inv
                metrics = jax.tree_util.tree_map(lambda a: a * inv, metrics)
                grads = jax.tree_util.tree_map(lambda a: a * inv, grads)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            metrics = jax.lax.pmean(metrics, DATA_AXIS)

            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics["lr"] = self.lr_schedule(state.step)
            new_state = TrainState(new_params, new_opt, state.step + 1)
            return new_state, metrics

        has_ts = self.use_ts
        has_depth = self.depth

        data_spec = P(DATA_AXIS)
        rep = P()

        def wrapped(state, data, key):
            rays, rgbs = data["rays"], data["rgbs"]
            ts = data.get("ts") if has_ts else None
            d_rays = data.get("d_rays") if has_depth else None
            d_depths = data.get("d_depths") if has_depth else None
            d_ts = data.get("d_ts") if has_depth else None
            perm = data.get("perm") if shuffle else None

            in_specs = [rep, data_spec, data_spec,
                        data_spec if ts is not None else rep,
                        data_spec if d_rays is not None else rep,
                        data_spec if d_depths is not None else rep,
                        data_spec if d_ts is not None else rep,
                        data_spec if perm is not None else rep,
                        rep]
            fn = jax.shard_map(
                local_step,
                mesh=self.mesh,
                in_specs=tuple(in_specs),
                out_specs=(rep, rep),
                check_vma=False,
            )
            return fn(state, rays, rgbs, ts, d_rays, d_depths, d_ts, perm, key)

        return jax.jit(wrapped, donate_argnums=(0,))

    def make_epoch_perm(self):
        """Jitted (rays, key) -> perm: an independent uniform permutation of
        each device's local shard indices, sharded like the rays. Used by
        `--sampling shuffle` to reproduce the reference DataLoader's
        without-replacement epoch semantics (main.py:96-117) with zero
        host involvement: the loop calls this once per epoch."""
        rep = P()
        data_spec = P(DATA_AXIS)

        def local_perm(rays, key):
            axis_idx = jax.lax.axis_index(DATA_AXIS)
            k = jax.random.fold_in(key, axis_idx)
            return jax.random.permutation(k, rays.shape[0]).astype(jnp.int32)

        fn = jax.shard_map(local_perm, mesh=self.mesh,
                           in_specs=(data_spec, rep), out_specs=data_spec,
                           check_vma=False)
        return jax.jit(fn)

    # -------------------------------------------------------------- eval step

    def make_eval_render(self):
        """Chunked full-image renderer: (params, rays, ts, key) -> results.

        The chunk's ray axis is sharded across the mesh via shard_map (the
        BASELINE north-star: eval/DSM ray grids split across chips); params
        are replicated and outputs come back sharded/concatenated.
        """
        rep = P()
        data_spec = P(DATA_AXIS)

        def local_render(params, rays, ts, key):
            t = ts if self.use_ts else None
            if self._use_fused_product_render:
                return self._fused_product_render(params, rays, t, key)
            return self.render(params, rays, t, key, train=False)

        fn = jax.shard_map(
            local_render,
            mesh=self.eval_mesh,
            in_specs=(rep, data_spec, data_spec, rep),
            out_specs=data_spec,
            check_vma=False,
        )

        def render_chunk(params, rays, ts, key):
            if ts is None:
                ts = jnp.zeros((rays.shape[0],), jnp.int32)
            return fn(params, rays, ts, key)

        return jax.jit(render_chunk)

    def render_image(self, params, rays: np.ndarray, ts, key=None) -> dict:
        """Host-side helper: render H*W rays in device-sized chunks and
        concatenate (the reference's batched_inference, eval_satnerf.py:46-66).

        All chunks are dispatched asynchronously before any result is
        fetched: on the tunneled TPU runtime each launch carries real RPC
        latency, and a synchronous per-chunk device_get serializes it with
        the compute (measured ~30 ms/launch — the difference between 349k
        and 417k rays/s at 64k-ray chunks). Queueing every chunk first lets
        transfer, launch latency, and compute overlap."""
        if key is None:
            key = jax.random.PRNGKey(0)
        n_eval = self.eval_mesh.devices.size
        if self.eval_mesh is not self.mesh:
            # multi-host run: params live replicated on the global mesh;
            # rehome them onto this host's eval mesh (pure local copy — a
            # replicated array is fully addressable everywhere). Cached by
            # identity: validate() renders many images from the same params.
            cached = getattr(self, "_rehomed_params", None)
            if cached is not None and cached[0] is params:
                params = cached[1]
            else:
                from satnerf_tpu.parallel.mesh import replicated

                rehomed = jax.device_put(jax.device_get(params),
                                         replicated(self.eval_mesh))
                self._rehomed_params = (params, rehomed)
                params = rehomed
        # chunk must split evenly across the eval mesh's ray axis.
        # Chunk-size note (measured, r3): bigger launches do NOT help this
        # surface the way they help the raw render step — with the ~30 B/ray
        # product fetch riding a ~12 MB/s tunnel link, 64k-ray chunks
        # pipeline the fetch under later chunks' compute better than 256k
        # ones (interleaved A/B at 1M rays: 232k vs 199k rays/s). On a
        # PCIe-attached host the fetch is free and --chunk 262144 recovers
        # the 417k serve rate (DESIGN.md "The eval product surface").
        chunk = -(-self.cfg.chunk // n_eval) * n_eval
        n = rays.shape[0]
        render_chunk = getattr(self, "_render_chunk", None)
        if render_chunk is None:
            render_chunk = self.make_eval_render()
            wire = self.cfg.eval_wire
            if wire == "float16" or (wire == "auto"
                                     and jax.default_backend() != "cpu"):
                # wire compression: the fetch link is the eval bottleneck
                # (~15 MB/s measured through the tunnel, vs 619 MB/s up), so
                # halve the fetched bytes by casting viz products to f16
                # on-device. depth feeds the DSM chain and stays f32 (f16's
                # 11-bit mantissa would cost ~0.2 m at scene scale).
                base = render_chunk

                def wire_chunk(params, r, t, k):
                    res = base(params, r, t, k)
                    return {
                        key_: (v.astype(jnp.float16)
                               if v.dtype == jnp.float32
                               and "depth" not in key_ else v)
                        for key_, v in res.items()
                    }

                render_chunk = jax.jit(wire_chunk)
            self._render_chunk = render_chunk

        pending = []
        for i in range(0, n, chunk):
            r = jnp.asarray(rays[i : i + chunk])
            pad = 0
            if r.shape[0] < chunk:
                pad = chunk - r.shape[0]
                r = jnp.pad(r, ((0, pad), (0, 0)))
            t = None
            if ts is not None:
                t = jnp.asarray(ts[i : i + chunk])
                if pad:
                    t = jnp.pad(t, ((0, pad),))
            pending.append((render_chunk(params, r, t, key), pad))

        def fetch(item):
            res, pad = item
            res = jax.device_get(res)
            if pad:
                res = {k: v[: chunk - pad] for k, v in res.items()}
            # upcast wire-compressed products so downstream eval code
            # (GeoTIFF dumps, metrics) always sees float32
            return {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
                    for k, v in res.items()}

        if len(pending) > 1:
            # fetch on a small thread pool: each device_get pays a tunnel
            # RTT plus the wire transfer, and serializing them leaves the
            # link idle between chunks while later chunks keep computing.
            # Concurrent fetches overlap the RTTs (and let the runtime
            # stream transfers back-to-back); ex.map preserves chunk order.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(pending))) as ex:
                outs = list(ex.map(fetch, pending))
        else:
            outs = [fetch(p) for p in pending]
        return {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}
