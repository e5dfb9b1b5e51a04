"""Train state + optimizer + loss assembly (SURVEY.md §2.1 'Training driver').

The entire forward+loss+grad+update is ONE jitted function (SURVEY.md §3.1):
frontend -> encoder -> CTC/CE losses -> grads (ICI all-reduce implicit in the
sharded jit) -> optax adamw update.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from pytorch_asr_tpu.configs.base import ExperimentConfig, OptimConfig
from pytorch_asr_tpu.data.tokenizer import CharTokenizer, get_tokenizer
from pytorch_asr_tpu.frontend import features
from pytorch_asr_tpu.models.asr_model import ASRModel
from pytorch_asr_tpu.ops import make_decoder_io, smoothed_ce_loss
from pytorch_asr_tpu.ops.ctc_pallas import ctc_loss_auto as ctc_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    # Polyak/EMA average of params (None when cfg.train.ema_decay == 0).
    ema_params: Any = None


def eval_params(state: TrainState):
    """Weights to decode/eval with: the EMA average when maintained."""
    return state.params if state.ema_params is None else state.ema_params


def lr_schedule(cfg: OptimConfig):
    """Warmup + one of: inv-sqrt (noam), constant, cosine, exponential."""

    def fn(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        warm = cfg.peak_lr * step / cfg.warmup_steps
        frac = jnp.clip((step - cfg.warmup_steps)
                        / max(cfg.total_steps - cfg.warmup_steps, 1), 0.0, 1.0)
        if cfg.schedule == "noam":
            decay = cfg.peak_lr * jnp.sqrt(cfg.warmup_steps / step)
        elif cfg.schedule == "constant":
            decay = cfg.peak_lr
        elif cfg.schedule == "cosine":
            floor = cfg.peak_lr * cfg.end_lr_fraction
            decay = floor + (cfg.peak_lr - floor) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
        elif cfg.schedule == "exponential":
            decay = cfg.peak_lr * cfg.end_lr_fraction ** frac
        else:
            raise ValueError(f"unknown lr schedule {cfg.schedule!r}")
        return jnp.where(step < cfg.warmup_steps, warm, decay)

    return fn


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    lr = lr_schedule(cfg)
    if cfg.optimizer == "adamw":
        opt = optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        opt = optax.adam(lr, b1=cfg.b1, b2=cfg.b2)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=cfg.momentum, nesterov=True)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def build_model(cfg: ExperimentConfig, tokenizer: CharTokenizer | None = None) -> ASRModel:
    tokenizer = tokenizer or get_tokenizer(cfg.data.vocab)
    return ASRModel(cfg.frontend, cfg.model, tokenizer.vocab_size,
                    remat_encoder=cfg.train.remat_encoder)


def init_train_state(cfg: ExperimentConfig, model: ASRModel,
                     sample_batch: dict[str, Any]) -> TrainState:
    # Keys are created with an EXPLICIT impl (cfg.train.rng_impl: 'rbg' =
    # hardware RngBitGenerator, far cheaper than threefry on TPU for the
    # per-step dropout/augmentation masks) and stored as raw key data so
    # orbax checkpoints stay plain arrays.  Key shapes differ per impl
    # (threefry (2,) vs rbg (4,) uint32); checkpoints resume under the same
    # config, so shapes stay consistent across save/restore.
    rng = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)
    init_rng, state_rng = jax.random.split(rng)
    state_rng = jax.random.key_data(state_rng)
    tok = get_tokenizer(cfg.data.vocab)
    dec_in, _, _ = make_decoder_io(
        jnp.asarray(sample_batch["tokens"]), jnp.asarray(sample_batch["token_len"]),
        tok.sos_id, tok.eos_id)
    params = model.init(
        init_rng,
        jnp.asarray(sample_batch["audio"]),
        jnp.asarray(sample_batch["audio_len"]),
        targets=dec_in if cfg.model.decoder is not None else None,
        target_len=jnp.asarray(sample_batch["token_len"]) + 1
        if cfg.model.decoder is not None else None,
        train=False,
    )["params"]
    tx = make_optimizer(cfg.train.optim)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        ema_params=jax.tree.map(jnp.copy, params)
        if cfg.train.ema_decay > 0.0 else None,
    )


def compute_losses(cfg: ExperimentConfig, model: ASRModel, params, batch,
                   rng, train: bool, step=None):
    """Forward + CTC/CE/joint loss.  Returns (scalar loss, aux dict)."""
    tok = get_tokenizer(cfg.data.vocab)
    tokens = batch["tokens"]
    token_len = batch["token_len"]
    need_las = cfg.model.decoder is not None
    if need_las:
        dec_in, dec_out, dec_len = make_decoder_io(tokens, token_len,
                                                   tok.sos_id, tok.eos_id)
    else:
        dec_in = dec_out = dec_len = None
    ss_prob = 0.0
    if (need_las and train and step is not None
            and cfg.model.decoder.scheduled_sampling > 0.0):
        # `step` counts micro-batches; the ramp is documented in OPTIMIZER
        # steps, so rescale when gradient accumulation is on.
        opt_step = step // max(cfg.train.optim.accum_steps, 1)
        ramp = jnp.clip(opt_step.astype(jnp.float32)
                        / max(cfg.model.decoder.ss_ramp_steps, 1), 0.0, 1.0)
        ss_prob = cfg.model.decoder.scheduled_sampling * ramp
    out = model.apply(
        {"params": params}, batch["audio"], batch["audio_len"],
        targets=dec_in, target_len=dec_len, train=train, ss_prob=ss_prob,
        rngs={"dropout": rng} if train else None,
    )
    aux: dict[str, Any] = {"enc_len": out["enc_len"]}
    lam = cfg.model.ctc_weight
    loss = jnp.float32(0.0)
    valid = (batch["audio_len"] > 0)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    if lam > 0.0:
        per_utt = ctc_loss(out["ctc_logits"], out["enc_len"], tokens, token_len)
        denom = jnp.maximum(token_len.astype(jnp.float32), 1.0)
        ctc = jnp.sum(per_utt / denom * valid) / n_valid
        aux["ctc_loss"] = ctc
        loss = loss + lam * ctc
    if need_las and lam < 1.0:
        # Zero out padded rows: their dec_len is 1 (the eos slot) but enc is
        # garbage; mask via valid.
        dec_len_m = jnp.where(valid, dec_len, 0)
        ce = smoothed_ce_loss(out["dec_logits"], dec_out, dec_len_m,
                              cfg.model.decoder.label_smoothing)
        aux["ce_loss"] = ce
        loss = loss + (1.0 - lam) * ce
    aux["loss"] = loss
    return loss, aux


def make_train_step(cfg: ExperimentConfig, model: ASRModel):
    tx = make_optimizer(cfg.train.optim)

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(
            jax.random.wrap_key_data(state.rng, impl=cfg.train.rng_impl))
        rng = jax.random.key_data(rng)

        def loss_fn(params):
            return compute_losses(cfg, model, params, batch, step_rng,
                                  train=True, step=state.step)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        # state.step counts micro-batches; the LR schedule (inside
        # optax/MultiSteps) ticks once per OPTIMIZER update — log the LR that
        # is actually applied.
        accum = max(cfg.train.optim.accum_steps, 1)
        aux["lr"] = lr_schedule(cfg.train.optim)(state.step // accum)
        d = cfg.train.ema_decay
        if state.ema_params is not None:
            # Blend only on real optimizer updates: during an accumulation
            # window params are unchanged and re-blending would shrink the
            # effective averaging horizon by accum_steps.
            is_update = ((state.step + 1) % accum) == 0 if accum > 1 else True
            new_ema = jax.tree.map(
                lambda e, p: jnp.where(is_update, d * e + (1.0 - d) * p, e),
                state.ema_params, new_params)
        else:
            new_ema = None
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, rng=rng,
                                  ema_params=new_ema)
        return new_state, aux

    return train_step


def make_eval_step(cfg: ExperimentConfig, model: ASRModel):
    """Greedy-decode eval step: returns packed hyp ids + lengths."""
    from pytorch_asr_tpu.decoding.greedy import greedy_ctc

    def eval_step(params, batch):
        out = model.apply({"params": params}, batch["audio"], batch["audio_len"],
                          train=False)
        ids, n = greedy_ctc(out["ctc_logits"], out["enc_len"])
        return ids, n

    return eval_step
