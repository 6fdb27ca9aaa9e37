"""SMOREDiffX (reference `/root/reference/src/models/smorediffx.py`).

Extends SMOREDiff with:
- **DSPDenoiser** on the soft-R conditioning representation
  (`smorediffx.py:71-140`): 'fft_mask' (per-row top-p magnitude mask),
  'wavelet' (Haar with fixed threshold), 'cheby' (Chebyshev filter over a
  provided graph Laplacian; identity when unset, like the reference's
  defaults), or 'none';
- **NoiseRecipe edge-reconstruction (PU) loss** (`smorediffx.py:50-70,
  281-302`): synthetic false positives are each positive item's top-k_hard
  most similar items under the fusion representation; BCE drives positive
  edges to 1 and synthetic fakes to 0;
- **LossScheduler** (`smorediffx.py:141-184`): epoch-scheduled diffusion
  strength beta (warmup -> hold -> cosine decay), warmup-only down-only soft
  edges, and scheduled rank/cl/edge weights;
- **soft-R stabilizers** (`smorediffx.py:246-272`): per-user row-sum
  conservation and an EMA over soft-R values held in the flax 'state'
  collection (threaded through the trainer's scan carry).
"""

from __future__ import annotations

from recommendar_systems_tpu.models.base import cfg_scalar

import jax
import jax.numpy as jnp
import numpy as np

from recommendar_systems_tpu.graph.sparse import COO
from recommendar_systems_tpu.models.layers import l2_normalize
from recommendar_systems_tpu.models.smorediff import SMOREDiff
from recommendar_systems_tpu.ops.spectral import haar_dwt1, haar_idwt1, irfft_ortho, rfft_ortho


class SMOREDiffX(SMOREDiff):
    _diffusion_default = True  # config_kwargs defaults use_diffusion_mvp on

    noise_recipe_on: bool = True
    nr_topk_fake: int = 5
    dsp_mode: str = "fft_mask"
    fft_keep_ratio: float = 0.5
    wavelet_thr: float = 0.05
    loss_sched_on: bool = True
    total_epochs: int = 200
    beta_min: float = 0.05
    beta_max: float = 0.30
    beta_warmup: int = 10
    beta_hold: int = 20
    beta_decay: int = 60
    use_cosine_decay: bool = True
    w_rank: float = 1.0
    w_cl: float = 1.0
    w_edge: float = 1.0
    use_softR_ema: bool = True
    softR_ema_tau: float = 0.2
    renorm_softR: bool = True
    r_nnz: int = 0  # nnz of R, needed to declare the EMA buffer in setup
    # [Up, Ip] when the renorm/EMA state lives DENSE (TPU fast path; see
    # _softr_dense_shape), else None -> exact (nnz,) per-edge state
    ema_dense_shape: tuple | None = None
    has_pre_epoch = True

    def setup(self):
        super().setup()
        if self.use_softR_ema:
            if self.ema_dense_shape is not None:
                # the dense state rides the same storage rule as the
                # propagated block (_softr_dtype): bf16 on TPU halves the
                # read+write traffic of the EMA passes; f32 on CPU /
                # softr_f32 keeps the per-edge equivalence pins exact
                shape, dtype = self.ema_dense_shape, self._softr_dtype()
            else:
                # the exact (nnz,) per-edge state stays f32
                shape, dtype = (self.r_nnz,), jnp.float32
            self.softR_ema_var = self.variable(
                "state", "softR_ema", lambda: jnp.zeros(shape, dtype)
            )
            # shape (1,) not (): 0-d leaves in the scanned-epoch carry hit a
            # pathological path on the axon backend (see lightgcnclip.py)
            self.softR_ema_init = self.variable(
                "state", "softR_ema_init", lambda: jnp.zeros((1,), jnp.bool_)
            )

    @staticmethod
    def _softr_dense_shape(n_users: int, n_items: int):
        """[Up, Ip] of the factored int8 count block the dense soft-R path
        will alias at runtime, or None when the sparse path will engage.

        Mirrors graph/build.py::build_norm_adj's dense-factored branch
        (densify threshold + fused tile padding + bit-packing override) —
        the flax state buffer's shape must be declared at setup time, before
        the ctx exists."""
        from recommendar_systems_tpu.graph.sparse import (
            dense_ok,
            fused_bip_enabled,
            use_bit_adj,
        )

        if (
            dense_ok(n_users, n_items)
            and fused_bip_enabled()
            and not use_bit_adj(n_users, n_items)
        ):
            from recommendar_systems_tpu.graph.build import fused_pad_shape

            return fused_pad_shape(n_users, n_items)
        return None

    # ---------------- DSP denoiser (`smorediffx.py:71-140`) ----------------
    def _dsp(self, z):
        if self.dsp_mode == "none" or self.dsp_mode == "cheby":
            # cheby requires an externally-supplied Laplacian + theta; the
            # reference defaults both to None which makes it the identity
            return z
        if self.dsp_mode == "fft_mask":
            fft = rfft_ortho(z)
            mag = jnp.abs(fft)
            k = max(1, int(mag.shape[1] * self.fft_keep_ratio))
            th = jnp.sort(mag, axis=1)[:, -k][:, None]
            mask = (mag >= th).astype(fft.dtype)
            return irfft_ortho(fft * mask, z.shape[1])
        if self.dsp_mode == "wavelet":
            a, d = haar_dwt1(z)
            d = jnp.where(jnp.abs(d) > self.wavelet_thr, d, 0.0)
            return haar_idwt1(a, d, z.shape[1])
        return z

    def _denoise_cond(self, cond_item):
        return self._dsp(cond_item)

    # ---------------- epoch schedule (`smorediffx.py:152-184`) -------------
    def _epoch(self, ctx):
        return ctx.get("epoch", jnp.asarray(1.0))

    def _schedule(self, ctx):
        if not self.loss_sched_on:
            return self.diff_beta, jnp.asarray(self.diff_only_down)
        e = self._epoch(ctx)
        warm = float(max(1, self.beta_warmup))
        t_w = e / warm
        beta_warmup = self.beta_min + (self.beta_max - self.beta_min) * t_w
        T = float(max(1, self.beta_decay))
        t_d = jnp.clip((e - self.beta_warmup - self.beta_hold) / T, 0.0, 1.0)
        if self.use_cosine_decay:
            beta_decay = self.beta_min + 0.5 * (self.beta_max - self.beta_min) * (
                1 + jnp.cos(jnp.pi * t_d)
            )
        else:
            beta_decay = self.beta_max - (self.beta_max - self.beta_min) * t_d
        beta = jnp.where(
            e <= self.beta_warmup,
            beta_warmup,
            jnp.where(e <= self.beta_warmup + self.beta_hold, self.beta_max, beta_decay),
        )
        only_down = e <= self.beta_warmup
        return beta, only_down

    def _loss_weights(self, ctx):
        if not self.loss_sched_on:
            return 1.0, self.cl_loss, 1.0
        e = self._epoch(ctx)
        lam_edge = self.w_edge * jnp.where(
            e <= self.beta_warmup + self.beta_hold, 1.0, 0.5
        )
        t = jnp.clip((e - 10.0) / float(max(1, self.beta_decay)), 0.0, 1.0)
        lam_cl = self.w_cl * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return self.w_rank, lam_cl, lam_edge

    # ---------------- soft-R with renorm + EMA (`smorediffx.py:246-272`) ---
    def _build_soft_r_dense(self, ctx, cond_item, train, ui):
        """Renorm + EMA entirely on the dense block (TPU fast path).

        The (nnz,) formulation is exact but LATENCY-bound on TPU: the
        per-step trace showed ~700 serialized small copies/gathers/scatters
        moving per-edge arrays through the scan carry (PARITY.md SMOREDiffX
        closure).  Off-edge entries of the dense block are exactly 0 and
        every operation below is per-entry multiplicative/linear, so the
        dense state carries the per-edge math EXACTLY (f32, same elementwise
        arithmetic; only the renorm row-sum order differs at f32 eps) with
        zero per-edge ops in the loop."""
        import jax

        from recommendar_systems_tpu.graph.sparse import DenseUI

        scale = self._soft_scale_dense(ctx, ui, cond_item)  # [Up, Ip] f32
        up, ip = map(int, ui.mat.shape)
        cnt = ui.mat.astype(jnp.float32)
        # Row factor folded BEFORE materializing the per-entry values: the
        # renorm row sum is r[u] * sum_i(count * scale * c[i]) — one matvec
        # over (count * scale) — so the full block
        # r * count * c * scale * (orig/new_row)[u] is produced in a SINGLE
        # fused elementwise pass instead of materialize -> row-reduce ->
        # re-scale (one fewer full [Up, Ip] f32 round trip per step; same
        # sum up to f32 ordering, which the dense-path contract already
        # admits for the renorm reduction).
        row_fac = ui.row_scale
        if self.renorm_softR:
            orig = ctx.get("softR_orig_row")
            if orig is None:
                orig = jax.ops.segment_sum(
                    ctx["R"].vals, ctx["R"].rows, num_segments=self.n_users
                )
            orig_p = (
                jnp.pad(orig, (0, up - orig.shape[0]))
                if up != orig.shape[0] else orig
            )
            # fused VPU multiply-reduce (NOT an MXU matvec): a dot_general
            # would force materializing cnt*scale f32 as a separate MXU
            # operand (a full [Up, Ip] round trip); the reduce fuses into
            # the scale producer chain and reads each operand once
            cs = jnp.sum(cnt * scale * ui.col_scale[None, :], axis=1)
            new_row = jnp.maximum(ui.row_scale * cs, 1e-6)
            row_fac = ui.row_scale * orig_p / new_row
        vals = cnt * scale * (row_fac[:, None] * ui.col_scale[None, :])
        tgt = self._softr_dtype()
        if self.use_softR_ema:
            prev = self.softR_ema_var.value.astype(jnp.float32)
            new_ema = jnp.where(
                self.softR_ema_init.value,
                (1 - self.softR_ema_tau) * prev + self.softR_ema_tau * vals,
                vals,
            ).astype(tgt)  # state and propagated block share one buffer
            if train and not self.is_initializing():
                self.softR_ema_var.value = jax.lax.stop_gradient(new_ema)
                self.softR_ema_init.value = jnp.ones((1,), jnp.bool_)
            return DenseUI(new_ema, ui.dims, None, None)
        return DenseUI(vals.astype(tgt), ui.dims, None, None)

    def build_soft_r(self, ctx, R: COO, cond_item: jnp.ndarray,
                     train: bool = True, ui=None):
        if self.ema_dense_shape is not None:
            if ui is None or tuple(map(int, ui.mat.shape)) != tuple(
                self.ema_dense_shape
            ):
                raise ValueError(
                    "soft-R state was declared DENSE "
                    f"{self.ema_dense_shape} at model construction but the "
                    "runtime adjacency block is "
                    f"{None if ui is None else tuple(ui.mat.shape)}; build "
                    "ctx with the same fused/densify knobs used for "
                    "from_config"
                )
            return self._build_soft_r_dense(ctx, cond_item, train, ui)
        scale = None
        if ui is not None:
            # dense z-score statistics (see SMOREDiff._soft_scale_dense),
            # then gather the per-edge scale so the renorm/EMA below stays
            # EXACTLY the reference's per-edge math and (nnz,) state
            scale = self._soft_scale_dense(ctx, ui, cond_item)
            vals = R.vals * scale[R.rows, R.cols]
        else:
            soft = super().build_soft_r(ctx, R, cond_item, train)
            vals = soft.vals
        if self.renorm_softR:
            # R's row sums never change: precomputed once in build_ctx
            orig_row = ctx.get("softR_orig_row")
            if orig_row is None:
                orig_row = jax.ops.segment_sum(
                    R.vals, R.rows, num_segments=self.n_users
                )
            if scale is not None:
                # sum_e r[u] c[i] scale[u,i] as ONE fused dense
                # multiply-reduce over the factored count block — replaces
                # a serialized per-edge segment_sum (same sum up to f32
                # ordering); VPU reduce, so no separate cnt*scale
                # materialization for an MXU operand
                cs = jnp.sum(
                    ui.mat.astype(jnp.float32) * scale
                    * ui.col_scale[None, :],
                    axis=1,
                )
                new_row = jnp.maximum(
                    (ui.row_scale * cs)[: self.n_users], 1e-6
                )
            else:
                new_row = jnp.maximum(
                    jax.ops.segment_sum(
                        vals, R.rows, num_segments=self.n_users
                    ),
                    1e-6,
                )
            vals = vals * (orig_row / new_row)[R.rows]
        if self.use_softR_ema:
            # reference seeds the EMA with the first soft-R (`smorediffx.py:264-271`)
            new_ema = jnp.where(
                self.softR_ema_init.value,
                (1 - self.softR_ema_tau) * self.softR_ema_var.value
                + self.softR_ema_tau * vals,
                vals,
            )
            if train and not self.is_initializing():
                self.softR_ema_var.value = jax.lax.stop_gradient(new_ema)
                self.softR_ema_init.value = jnp.ones((1,), jnp.bool_)
            vals = new_ema
        return R.with_values(vals)

    # ---------------- NoiseRecipe PU loss (`smorediffx.py:281-302`) --------
    def _edge_recon_loss(self, batch, cond_item):
        users, pos = batch["users"], batch["pos_items"]
        w = batch.get("weight")
        pos_vec = l2_normalize(cond_item[pos])
        all_items = l2_normalize(cond_item)
        sim = pos_vec @ all_items.T  # [B, I]
        sim = sim.at[jnp.arange(sim.shape[0]), pos].set(-1.0)
        _, hard_idx = jax.lax.top_k(sim, self.nr_topk_fake)  # [B, k]
        u_norm = l2_normalize(self.user_embedding)
        temp = max(self.diff_temp, 1e-6)
        s_pos = jnp.sum(u_norm[users] * l2_normalize(cond_item[pos]), -1) / temp
        s_neg = (
            jnp.einsum("bd,bkd->bk", u_norm[users], all_items[hard_idx]) / temp
        )

        def bce(logits, target):
            return jnp.maximum(logits, 0) - logits * target + jnp.log1p(
                jnp.exp(-jnp.abs(logits))
            )

        # reference: bce(s_pos, 1).mean() + bce(s_neg, 0).mean()
        pos_l = bce(s_pos, 1.0)
        neg_l = bce(s_neg, 0.0).mean(axis=1)
        if w is not None:
            denom = jnp.maximum(w.sum(), 1.0)
            return (pos_l * w).sum() / denom + (neg_l * w).sum() / denom
        return pos_l.mean() + neg_l.mean()

    def loss(self, ctx, batch, train: bool = True):
        total, parts = super().loss(ctx, batch, train)
        # recompose with scheduled weights (`smorediffx.py:303-338`)
        mf, reg, cl = parts["mf_loss"], parts["emb_loss"], parts["cl_loss"]
        edge_nce = parts.get("edge_nce", 0.0)
        recon = 0.0
        if self.noise_recipe_on:
            recon = self._edge_recon_loss(batch, self._cond_item(ctx))
        w_rank, w_cl, w_edge = self._loss_weights(ctx)
        if self.loss_sched_on:
            total = (
                w_rank * (mf + reg)
                + w_cl * cl
                + w_edge * recon
                + self.edge_nce_lambda * edge_nce
            )
        else:
            total = mf + reg + self.cl_loss * cl + recon + self.edge_nce_lambda * edge_nce
        parts = dict(parts)
        parts["edge_recon"] = recon
        return total, parts

    @classmethod
    def config_kwargs(cls, config, data) -> dict:
        def _s(v):
            return v[0] if isinstance(v, list) else v

        kw = SMOREDiff.config_kwargs.__func__(cls, config, data)
        kw.update(
            noise_recipe_on=bool(
                True if config.get("noise_recipe_on") is None
                else _s(config.get("noise_recipe_on"))
            ),
            nr_topk_fake=int(cfg_scalar(config, "nr_topk_fake", 5)),
            dsp_mode=str(_s(config.get("dsp_mode")) or "fft_mask"),
            fft_keep_ratio=float(cfg_scalar(config, "fft_keep_ratio", 0.5)),
            wavelet_thr=float(cfg_scalar(config, "wavelet_thr", 0.05)),
            loss_sched_on=bool(
                True if config.get("loss_sched_on") is None
                else config.get("loss_sched_on")
            ),
            total_epochs=int(cfg_scalar(config, "epochs", 200)),
            beta_min=float(cfg_scalar(config, "beta_min", 0.05)),
            beta_max=float(cfg_scalar(config, "beta_max", 0.30)),
            beta_warmup=int(cfg_scalar(config, "beta_warmup_ep", 10)),
            beta_hold=int(cfg_scalar(config, "beta_hold_ep", 20)),
            beta_decay=int(cfg_scalar(config, "beta_decay_ep", 60)),
            use_cosine_decay=bool(
                True if config.get("use_cosine_decay") is None
                else config.get("use_cosine_decay")
            ),
            w_rank=float(config.get("w_rank") if config.get("w_rank") is not None else 1.0),
            w_cl=float(config.get("w_cl") if config.get("w_cl") is not None else 1.0),
            w_edge=float(_s(config.get("w_edge")) if config.get("w_edge") is not None else 1.0),
            use_softR_ema=bool(
                True if config.get("use_softR_ema") is None
                else config.get("use_softR_ema")
            ),
            softR_ema_tau=float(cfg_scalar(config, "softR_ema_tau", 0.2)),
            renorm_softR=bool(
                True if config.get("renorm_softR") is None
                else config.get("renorm_softR")
            ),
            use_diffusion_mvp=bool(
                cfg_scalar(config, "use_diffusion_mvp", cls._diffusion_default)
            ),
            r_nnz=int(len(data.train_users_np)),
            ema_dense_shape=cls._softr_dense_shape(
                data.n_users, data.n_items
            ),
        )
        return kw

    @classmethod
    def from_config(cls, config, data) -> "SMOREDiffX":
        return cls(**cls.config_kwargs(config, data))

    @classmethod
    def build_ctx(cls, config, data):
        ctx = SMOREDiff.build_ctx.__func__(cls, config, data)
        ctx["epoch"] = jnp.asarray(0.0)
        if isinstance(ctx.get("R"), COO):
            # constant per-user row sums of R for the soft-R renorm
            # (`smorediffx.py:246-255`): orig_row[u] = sum_i r[u] c[i]
            R = ctx["R"]
            ctx["softR_orig_row"] = jax.ops.segment_sum(
                R.vals, R.rows, num_segments=data.n_users
            )
        return ctx

    @classmethod
    def pre_epoch(cls, ctx, rng, config):
        # epoch counter drives the beta / weight schedules (`smorediffx.py:242-249`)
        ctx = dict(ctx)
        ctx["epoch"] = ctx["epoch"] + 1.0
        return ctx


MODEL = SMOREDiffX
