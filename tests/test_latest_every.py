"""--latest-every checkpoint cadence: the resumable 'latest' checkpoint
is written every N epochs AND at the final epoch (the final-epoch save
is a contract — scripts/harvest_cohort_runs.py verifies run completion
by latest.meta.json reaching the sweep's epoch count)."""

import json
import os

import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast


def test_latest_every_cadence(tmp_path, rng):
    from otfusion_tpu.data import make_synthetic_adni
    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        NiftiDataset,
    )
    from otfusion_tpu.data.splits import stratified_split
    from otfusion_tpu.train.loop import run_unimodal_training

    tree = make_synthetic_adni(tmp_path / "adni", n_per_class=4,
                               shape=(12, 12, 12), seed=0)
    ds = NiftiDataset(root_dir=str(tree),
                      class_names=CLASS_NAMES_MRI_BINARY)
    labels = [s[1] for s in ds.samples]
    tr, va = stratified_split(labels, 0.25, 0)

    save = tmp_path / "run"
    saves = []
    import otfusion_tpu.train.loop as loop_mod

    orig = loop_mod.save_checkpoint

    def spy(directory, *a, **k):
        saves.append(os.path.basename(str(directory)))
        return orig(directory, *a, **k)

    loop_mod.save_checkpoint = spy
    try:
        run_unimodal_training(
            samples=ds.samples, train_idx=tr, val_idx=va,
            class_names=CLASS_NAMES_MRI_BINARY, model_depth=10,
            target_shape=(12, 12, 12), batch_size=4, lr=1e-3, epochs=5,
            seed=0, save_path=str(save), progress=False,
            s2d_stem=False, dtype=jnp.float32, latest_every=3,
        )
    finally:
        loop_mod.save_checkpoint = orig

    # 'latest' saved at epochs 3 and 5 (final) only
    assert saves.count("latest") == 2
    with open(save / "latest.meta.json") as f:
        assert json.load(f)["epoch"] == 5  # final epoch always saves
    # metrics rows unaffected by the cadence
    with open(save / "metrics.jsonl") as f:
        assert sum(1 for _ in f) == 5
