"""Jitted train/eval steps.

The reference's hot loop crosses the host boundary constantly (GPU forward
-> .cpu().numpy() -> CPU JAX OT solve -> back to GPU, once per *batch* in
MRI_PET_OT.py:667-697). Here each step — forward, in-batch FOT solve,
losses, backward, optimiser update — is ONE jitted XLA computation that
never leaves the TPU.

Step factories return functions closed over the model/config so the jitted
signature only carries arrays (state, batch, coupling, rng).
"""

from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp

from otfusion_tpu.ops.fot import apply_feature_coupling, fot
from otfusion_tpu.train.losses import cosine_alignment_loss, cross_entropy
from otfusion_tpu.train.train_state import FusionTrainState


def _apply(model, params, batch_stats, *args, train, rng=None, **kwargs):
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": rng} if rng is not None else None
    if train:
        out, mutated = model.apply(
            variables, *args, train=True, rngs=rngs,
            mutable=["batch_stats"], **kwargs,
        )
        return out, mutated["batch_stats"]
    out = model.apply(variables, *args, train=False, **kwargs)
    return out, batch_stats


def make_fusion_train_step(
    model,
    in_batch_fot: bool = False,
    fot_epsilon: float = 1e-3,
    fot_max_iterations: int = 2000,
    fot_threshold: float = 1e-3,
    donate: bool = True,
    jit: bool = True,
    grad_accum: int = 1,
) -> Callable:
    """Train step for MultimodalOTFusion.

    ``in_batch_fot=True`` reproduces the base trainer's per-batch coupling
    (identity sample plan over the batch, eps=1e-3 — MRI_PET_OT.py:664-697)
    but solved on-device inside this very step. Otherwise the per-epoch
    coupling ``t_feature`` (or None for mmfusion) is used as-is.

    ``grad_accum=N`` splits the batch into N sequential microbatches
    inside the jitted step (``lax.scan``): activations live only one
    microbatch at a time (a memory knob for large effective batches on
    limited HBM), gradients average across microbatches before ONE
    optimiser update, BatchNorm statistics update sequentially per
    microbatch, and each microbatch draws its own dropout fold.
    Microbatch i takes the STRIDED rows ``i::N`` (via a
    ``(n//N, N, ...)`` reshape indexed on axis 1): under a DP mesh the
    batch axis is sharded contiguously across devices, so strided
    microbatches each keep ``(n/N)/D`` rows on EVERY device — a
    contiguous slice would pin each microbatch to a device subset,
    forcing GSPMD reshards and defeating the per-device memory saving.
    A batch whose size does not divide N (the loader's final partial
    batch) traces the plain unaccumulated path — same convention as the
    DP partial-batch fallback. With ``in_batch_fot`` the per-batch plan
    is solved per MICROBATCH (the reference's in-batch coupling at the
    microbatch size).
    """
    use_ot_loss = model.variant in ("per_epoch_attn", "base")

    def grads_and_aux(params, batch_stats, mri, pet, labels, t_feature,
                      rng):
        def loss_fn(params):
            out, new_stats = _apply(
                model, params, batch_stats, mri, pet,
                t_feature=t_feature, train=True, rng=rng,
            )
            ce = cross_entropy(out["logits"], labels)
            ot_loss = jnp.float32(0.0)
            if use_ot_loss:
                if in_batch_fot:
                    # Identity in-batch sample plan; couplings detach inside
                    # the solver, gradients flow only through the cosine
                    # alignment of the fused features.
                    bsz = out["mri_fused"].shape[0]
                    ts = jnp.eye(bsz, dtype=jnp.float32) / bsz
                    tv = fot(
                        out["pet_fused"], out["mri_fused"], ts,
                        epsilon=fot_epsilon,
                        max_iterations=fot_max_iterations,
                        threshold=fot_threshold,
                    ).coupling
                    ot_mri = apply_feature_coupling(out["pet_fused"], tv)
                else:
                    ot_mri = out["ot_mri_from_pet"]
                if ot_mri is not None:
                    ot_loss = cosine_alignment_loss(out["mri_fused"], ot_mri)
            loss = ce + ot_loss
            return loss, (out["logits"], ce, ot_loss, new_stats)

        return jax.grad(loss_fn, has_aux=True)(params)

    def step(state: FusionTrainState, mri, pet, labels, t_feature, rng):
        n = mri.shape[0]
        k = grad_accum if (grad_accum > 1 and n >= grad_accum
                           and n % grad_accum == 0) else 1
        if k == 1:
            grads, (logits, ce, ot_loss, new_stats) = grads_and_aux(
                state.params, state.batch_stats, mri, pet, labels,
                t_feature, rng,
            )
            correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        else:
            b = n // k
            # rows i::k per microbatch — see docstring (DP-shard aligned)
            strided = lambda x: x.reshape(b, k, *x.shape[1:])
            mri_s, pet_s, lbl_s = strided(mri), strided(pet), strided(labels)

            def micro(carry, i):
                acc, stats = carry
                sl = lambda x: jax.lax.dynamic_index_in_dim(
                    x, i, axis=1, keepdims=False)
                lbl = sl(lbl_s)
                g, (logits, ce, ot, new_stats) = grads_and_aux(
                    state.params, stats, sl(mri_s), sl(pet_s), lbl,
                    t_feature, jax.random.fold_in(rng, i),
                )
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                corr = jnp.sum(jnp.argmax(logits, -1) == lbl)
                return (acc, new_stats), (ce, ot, corr)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, new_stats), (ces, ots, corrs) = jax.lax.scan(
                micro, (zero, state.batch_stats), jnp.arange(k))
            grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
            # equal microbatch sizes -> mean of means == batch mean
            ce, ot_loss, correct = ces.mean(), ots.mean(), corrs.sum()
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {
            "loss": ce + ot_loss,
            "ce_loss": ce,
            "ot_loss": ot_loss,
            "correct": correct,
        }
        return state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_fusion_eval_step(model, jit: bool = True) -> Callable:
    use_ot_loss = model.variant in ("per_epoch_attn", "base")

    def step(state: FusionTrainState, mri, pet, labels, t_feature):
        out, _ = _apply(
            model, state.params, state.batch_stats, mri, pet,
            t_feature=t_feature, train=False,
        )
        ce = cross_entropy(out["logits"], labels)
        ot_loss = jnp.float32(0.0)
        # Reference eval computes total loss = ce + ot (ot=0 outside
        # training: attn:755,857); parity: eval ot_loss stays 0.
        preds = jnp.argmax(out["logits"], -1)
        return {
            "loss": ce + ot_loss,
            "ce_loss": ce,
            "ot_loss": ot_loss,
            "preds": preds,
            "logits": out["logits"],
            "correct": jnp.sum(preds == labels),
        }

    return jax.jit(step) if jit else step


def make_feature_extract_step(model, jit: bool = True) -> Callable:
    """Backbone-only forward for the per-epoch coupling service
    (reference feature_extract, attn:889-914)."""

    from otfusion_tpu.models.fusion import build_fusion_backbone

    remat = getattr(model, "remat", False)
    s2d = getattr(model, "s2d_stem", False)
    mri_backbone = build_fusion_backbone(
        model.mri_backbone, model.depth, model.dtype, remat=remat,
        s2d_stem=s2d)
    pet_backbone = build_fusion_backbone(
        model.pet_backbone, model.depth, model.dtype, remat=remat,
        s2d_stem=s2d)

    def step(state: FusionTrainState, mri, pet):
        def run(backbone, params_key, x):
            variables = {
                "params": state.params[params_key],
                "batch_stats": state.batch_stats.get(params_key, {}),
            }
            out = backbone.apply(variables, x, train=False)
            return out[1] if isinstance(out, tuple) else out

        return (
            run(mri_backbone, "mri_backbone", mri),
            run(pet_backbone, "pet_backbone", pet),
        )

    return jax.jit(step) if jit else step


def make_unimodal_train_step(model, donate: bool = True,
                             jit: bool = True,
                             grad_accum: int = 1) -> Callable:
    """CE-only train step for ResNet3DClassifier (3D_resnet.py:477-513).

    ``grad_accum`` follows the same microbatching contract as
    ``make_fusion_train_step``.
    """

    def grads_and_aux(params, batch_stats, vol, labels, rng):
        def loss_fn(params):
            (logits, feats), new_stats = _apply(
                model, params, batch_stats, vol, train=True, rng=rng
            )
            ce = cross_entropy(logits, labels)
            return ce, (logits, ce, new_stats)

        return jax.grad(loss_fn, has_aux=True)(params)

    def step(state: FusionTrainState, vol, labels, rng):
        n = vol.shape[0]
        k = grad_accum if (grad_accum > 1 and n >= grad_accum
                           and n % grad_accum == 0) else 1
        if k == 1:
            grads, (logits, ce, new_stats) = grads_and_aux(
                state.params, state.batch_stats, vol, labels, rng)
            correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        else:
            b = n // k
            # rows i::k per microbatch (DP-shard aligned, see
            # make_fusion_train_step's docstring)
            strided = lambda x: x.reshape(b, k, *x.shape[1:])
            vol_s, lbl_s = strided(vol), strided(labels)

            def micro(carry, i):
                acc, stats = carry
                sl = lambda x: jax.lax.dynamic_index_in_dim(
                    x, i, axis=1, keepdims=False)
                lbl = sl(lbl_s)
                g, (logits, ce, new_stats) = grads_and_aux(
                    state.params, stats, sl(vol_s), lbl,
                    jax.random.fold_in(rng, i),
                )
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                corr = jnp.sum(jnp.argmax(logits, -1) == lbl)
                return (acc, new_stats), (ce, corr)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, new_stats), (ces, corrs) = jax.lax.scan(
                micro, (zero, state.batch_stats), jnp.arange(k))
            grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
            ce, correct = ces.mean(), corrs.sum()
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": ce, "correct": correct}

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_unimodal_eval_step(model, jit: bool = True) -> Callable:
    def step(state: FusionTrainState, vol, labels):
        (logits, feats), _ = _apply(
            model, state.params, state.batch_stats, vol, train=False
        )
        preds = jnp.argmax(logits, -1)
        return {
            "loss": cross_entropy(logits, labels),
            "preds": preds,
            "logits": logits,
            "features": feats,
            "correct": jnp.sum(preds == labels),
        }

    return jax.jit(step) if jit else step
