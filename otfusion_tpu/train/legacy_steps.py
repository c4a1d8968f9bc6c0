"""Jitted steps for the legacy RIMA trainer.

The reference (main.py:153-250 + baseline_models_fusion.py:134-207)
computes, for EVERY training batch, two label-constrained EGW couplings
and an FOT feature plan on CPU, samples matched partners row-wise with
``torch.multinomial``, and accumulates cosine projection losses in a
Python loop. Here the whole thing — encoders, bidirectional label-masked
EGW, FOT plan, categorical partner sampling, projection losses, backward,
update — is one jitted XLA program per batch:

  * the label constraint uses the plan-masked global EGW
    (ops.gromov.entropic_gw_labels), which equals the reference's
    grouped-per-label block assembly without dynamic shapes;
  * partner sampling is ``jax.random.categorical`` over plan-row logits
    (rows with no mass fall back to uniform — the reference's
    ``T[T.sum(-1)==0] = 1e-8``, baseline_models_fusion.py:157);
  * couplings are detached; gradients flow through the projections and
    the cosine losses only, as in the reference.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from otfusion_tpu.ops.fot import fot
from otfusion_tpu.ops.gromov import entropic_gw_labels
from otfusion_tpu.train.losses import cosine_alignment_loss, cross_entropy
from otfusion_tpu.train.train_state import FusionTrainState


def _sample_partners(rng, plan):
    """Row-wise categorical partner indices from an OT plan."""
    logits = jnp.log(jnp.maximum(plan, 1e-30))
    # dead rows -> uniform
    dead = jnp.sum(plan, axis=1, keepdims=True) <= 0
    logits = jnp.where(dead, 0.0, logits)
    return jax.random.categorical(rng, logits, axis=1)


def make_legacy_train_step(
    model,
    ot_epsilon: float = 5e-3,
    gw_max_iterations: int = 500,
    donate: bool = False,
) -> Callable:
    def step(state: FusionTrainState, fundus, oct_vol, labels, rng):
        rng_enc, rng_proj, rng_fuse, rng_s1, rng_s2 = jax.random.split(
            rng, 5)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}

            (f_feat, o_feat), new_stats = model.apply(
                variables, fundus, oct_vol, train=True,
                rngs={"dropout": rng_enc}, mutable=["batch_stats"],
                method=model.encode,
            )
            new_stats = new_stats["batch_stats"]

            f_sg = jax.lax.stop_gradient(f_feat)
            o_sg = jax.lax.stop_gradient(o_feat)

            # Bidirectional label-constrained EGW on the batch.
            t_f2o = entropic_gw_labels(
                f_sg, o_sg, labels, labels,
                epsilon=ot_epsilon, max_iterations=gw_max_iterations,
            ).coupling
            t_o2f = entropic_gw_labels(
                o_sg, f_sg, labels, labels,
                epsilon=ot_epsilon, max_iterations=gw_max_iterations,
            ).coupling
            # OCT->fundus feature plan from the fundus->oct sample plan
            # (reference :146-147: fot(oct_group, fundus_group, Ts)).
            tv = fot(o_sg, f_sg, t_f2o.T, epsilon=ot_epsilon).coupling

            def apply_m(method, *args):
                out, _ = model.apply(
                    {"params": params, "batch_stats": new_stats},
                    *args, train=True, rngs={"dropout": rng_proj},
                    mutable=["batch_stats"], method=method,
                )
                return out

            pred_oct = apply_m(model.project_fundus2oct, f_feat)
            pred_fundus = apply_m(model.project_oct2fundus, o_feat)

            idx_oct = _sample_partners(rng_s1, t_f2o)      # fundus_i -> oct
            idx_fundus = _sample_partners(rng_s2, t_o2f)   # oct_i -> fundus
            ot_loss = cosine_alignment_loss(pred_oct, o_sg[idx_oct]) + \
                cosine_alignment_loss(pred_fundus, f_sg[idx_fundus])

            # Projections are passed in — computed once above for the OT
            # losses (the 4096-wide MLPs would otherwise run twice).
            (logits, _), _ = model.apply(
                {"params": params, "batch_stats": new_stats},
                f_feat, o_feat, tv, train=True,
                rngs={"dropout": rng_fuse}, mutable=["batch_stats"],
                method=model.fuse,
                pred_oct=pred_oct, pred_fundus=pred_fundus,
            )
            ce = cross_entropy(logits, labels)
            return ce + ot_loss, (logits, ce, ot_loss, new_stats)

        grads, (logits, ce, ot_loss, new_stats) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {
            "loss": ce + ot_loss,
            "ce_loss": ce,
            "ot_loss": ot_loss,
            "correct": jnp.sum(jnp.argmax(logits, -1) == labels),
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_legacy_eval_step(model) -> Callable:
    def step(state: FusionTrainState, fundus, oct_vol, labels, t_feature):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            fundus, oct_vol, t_feature, train=False,
        )
        ce = cross_entropy(out["logits"], labels)
        preds = jnp.argmax(out["logits"], -1)
        return {
            "loss": ce,
            "preds": preds,
            "logits": out["logits"],
            "correct": jnp.sum(preds == labels),
            "fundus_feat": out["fundus_feat"],
            "oct_feat": out["oct_feat"],
        }

    return jax.jit(step)
