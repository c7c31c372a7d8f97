"""Sharded flow-matching training step.

The reference ships DeepSpeed ZeRO-2/3 configs (config/zero_stage*.json) but
no training code; this is the TPU-native equivalent: GSPMD-sharded params
(FSDP = PartitionSpec over the `fsdp` axis), optax optimizer with sharded
states, rectified-flow loss, gradient checkpointing via jax.checkpoint on
the block scan.

Used by __graft_entry__.dryrun_multichip to validate the full multi-chip
(dp, fsdp, sp, tp) program compiles and executes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from versecrafter_tpu.core.config import WanDiTConfig


def flow_matching_loss(params, cfg: WanDiTConfig, rng, x0, context, cos, sin,
                       geoada_context=None, attn_impl: str = "auto",
                       remat: bool = True):
    """Rectified-flow loss: x_sig = (1-sig) x0 + sig eps; target v = eps - x0.
    remat: rematerialize blocks in backward (activation memory ~O(1 block))."""
    b = x0.shape[0]
    k_sig, k_eps = jax.random.split(rng)
    sig = jax.random.uniform(k_sig, (b,), jnp.float32)
    eps = jax.random.normal(k_eps, x0.shape, x0.dtype)
    sb = sig[:, None, None, None, None].astype(x0.dtype)
    x_sig = (1.0 - sb) * x0 + sb * eps
    target = eps - x0
    t = sig * 1000.0
    from versecrafter_tpu.models.wan_dit import (
        patchify, wan_dit_blocks, wan_dit_embed, wan_dit_head, _linear)

    tokens, e, e0, ctx, ctx_img, grid = wan_dit_embed(params, cfg, x_sig, t, context)
    gtok = None
    if geoada_context is not None and cfg.has_geoadapter:
        gtok = _linear(params["geoada_patch_embedding"],
                       patchify(geoada_context, cfg.patch_size))
    tokens = wan_dit_blocks(params, cfg, tokens, e0, cos, sin, ctx,
                            geoada_tokens=gtok, attn_impl=attn_impl,
                            context_img=ctx_img, remat=remat)
    pred = wan_dit_head(params, cfg, tokens, e, grid)
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def make_train_step(cfg: WanDiTConfig, optimizer: optax.GradientTransformation,
                    attn_impl: str = "auto", trainable_filter=None):
    """Returns (init_opt_state, train_step). `trainable_filter(path)->bool`
    freezes params (the reference trains only the GeoAdapter branch on a
    frozen backbone)."""

    def loss_fn(train_params, frozen_params, rng, x0, context, cos, sin, geo):
        params = {**frozen_params, **train_params}
        return flow_matching_loss(params, cfg, rng, x0, context, cos, sin,
                                  geoada_context=geo, attn_impl=attn_impl)

    def train_step(train_params, frozen_params, opt_state, rng, x0, context,
                   cos, sin, geoada_context=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            train_params, frozen_params, rng, x0, context, cos, sin,
            geoada_context)
        updates, opt_state = optimizer.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, loss

    return train_step


def split_trainable(params: Dict[str, Any], geoadapter_only: bool = True):
    """(trainable, frozen) split: GeoAdapter branch trains, backbone frozen
    (the reference's training setup per README/SURVEY)."""
    if not geoadapter_only:
        return params, {}
    train = {k: v for k, v in params.items() if k.startswith("geoada")}
    frozen = {k: v for k, v in params.items() if not k.startswith("geoada")}
    return train, frozen


def make_lora_train_step(cfg: WanDiTConfig,
                         optimizer: optax.GradientTransformation,
                         lora_scale: float = 1.0, attn_impl: str = "auto"):
    """LoRA finetuning step: only the low-rank factors train; the WHOLE
    base tree is frozen and the effective kernels are rebuilt in-graph per
    step (utils.lora.apply_lora_tree — differentiable through the
    factors). Beyond the reference (which only CONSUMES LoRA weights);
    exported adapters (utils.lora.lora_to_torch_sd) load through
    merge_lora / the CLI --lora_path like any reference-format LoRA."""
    from versecrafter_tpu.utils.lora import apply_lora_tree

    def loss_fn(lora, base_params, rng, x0, context, cos, sin, geo):
        params = apply_lora_tree(base_params, lora, lora_scale)
        return flow_matching_loss(params, cfg, rng, x0, context, cos, sin,
                                  geoada_context=geo, attn_impl=attn_impl)

    def train_step(lora, base_params, opt_state, rng, x0, context,
                   cos, sin, geoada_context=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, base_params, rng, x0, context, cos, sin, geoada_context)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return train_step
