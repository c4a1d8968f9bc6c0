"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from otfusion_tpu.models import MultimodalOTFusion
from otfusion_tpu.models.resnet3d import feature_dim
from otfusion_tpu.train import create_train_state


def _fusion_state(rng, raw_plan=False):
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn", raw_plan=raw_plan)
    mri = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    pet = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    d = feature_dim(10)
    tv = jnp.asarray(rng.uniform(0.0, 1.0, size=(d, d)), jnp.float32)
    tv = tv / tv.sum()
    state = create_train_state(model, jax.random.key(0), (mri, pet), 1e-3,
                               t_feature=tv)
    return model, state, mri, pet, tv


def test_checkpoint_crash_between_renames_recovers(tmp_path, rng):
    """A preemption between rename(dir -> .old) and rename(.tmp -> dir)
    must not lose the checkpoint: the next save promotes .old back and
    restore falls back to .old (ADVICE.md finding 2)."""
    from otfusion_tpu.utils.checkpoint import (
        checkpoint_exists,
        flush_checkpoints,
        restore_checkpoint,
        save_checkpoint,
    )

    model, state, mri, pet, tv = _fusion_state(rng)
    directory = tmp_path / "latest"
    save_checkpoint(directory, state, {"epoch": 3}, include_opt_state=True)
    flush_checkpoints()  # direct fs surgery below needs the write durable

    # Simulate the unrecovered window: dir was renamed to .old, the crash
    # hit before .tmp was renamed into place.
    os.rename(directory, tmp_path / "latest.old")
    assert not directory.exists()

    # Restore path: falls back to .old instead of failing/restarting.
    assert checkpoint_exists(directory)
    restored = restore_checkpoint(directory, state, include_opt_state=True)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )

    # Save path: promotes .old back, never rmtree'ing the only survivor.
    save_checkpoint(directory, state, {"epoch": 4}, include_opt_state=True)
    flush_checkpoints()
    assert directory.exists()
    assert not (tmp_path / "latest.old").exists()
    restore_checkpoint(directory, state, include_opt_state=True)


def test_raw_reference_plan_mode(rng):
    """raw_plan=True applies the reference flagship's exact un-normalised
    pet_feat @ T.t() (attn:728), including the transpose (ADVICE.md 3)."""
    model, state, mri, pet, tv = _fusion_state(rng, raw_plan=True)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        mri, pet, t_feature=tv, train=False,
    )
    expected = np.asarray(out["pet_feat"]) @ np.asarray(tv).T
    np.testing.assert_allclose(
        np.asarray(out["ot_mri_from_pet"]), expected, rtol=1e-5, atol=1e-5
    )

    # and the default mode differs (column-normalised barycentric proj.)
    model2, state2, _, _, _ = _fusion_state(rng, raw_plan=False)
    out2 = model2.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        mri, pet, t_feature=tv, train=False,
    )
    assert not np.allclose(np.asarray(out2["ot_mri_from_pet"]), expected)


def test_apply_device_flag_cpu_overrides_config(monkeypatch):
    """--device cpu must set the jax config (the env var alone is ignored
    when the axon plugin self-registers; ADVICE.md finding 1)."""
    from otfusion_tpu.cli.common import apply_device_flag

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    apply_device_flag("cpu")
    assert os.environ["JAX_PLATFORMS"] == "cpu"
    assert jax.config.jax_platforms == "cpu"
