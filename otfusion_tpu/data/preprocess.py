"""Volume preprocessing as jitted XLA ops.

The reference preprocesses per item on the host inside DataLoader workers
(3D_resnet.py:272-290): nan_to_num -> 4D squeeze -> trilinear resize ->
per-volume z-score -> optional random axis flips. Here the resize/normalise
/flip stack is a jit-compiled device function batched over buckets of
same-shaped raw volumes, so the host only does file I/O.

Parity notes:
  * trilinear resize matches ``F.interpolate(mode="trilinear",
    align_corners=False)``: ``jax.image.resize(method="trilinear")`` uses
    the same half-pixel-centres convention.
  * z-score uses the reference's biased std and 1e-5 guard
    (``vol.sub_(mean).div_(std + 1e-5)``, MRI_PET_OT.py:366-369; torch
    ``Tensor.std`` is Bessel-corrected — we match that).
  * 4D inputs take the first volume along the last axis (3D_resnet.py:276-282).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from otfusion_tpu.data.nifti_io import read_nifti


@partial(jax.jit, static_argnames=("target_shape",))
def resize_trilinear(volume: jnp.ndarray, target_shape: tuple[int, int, int]):
    """Trilinear resize of a (D, H, W) volume to ``target_shape``."""
    return jax.image.resize(volume, target_shape, method="trilinear")


def zscore(volume: jnp.ndarray) -> jnp.ndarray:
    """Per-volume standardisation with torch-parity unbiased std."""
    mean = jnp.mean(volume)
    n = volume.size
    var = jnp.sum((volume - mean) ** 2) / jnp.maximum(n - 1, 1)
    return (volume - mean) / (jnp.sqrt(var) + 1e-5)


@partial(jax.jit, static_argnames=("target_shape",))
def preprocess_volume(
    volume: jnp.ndarray, target_shape: tuple[int, int, int]
) -> jnp.ndarray:
    """nan_to_num -> resize -> z-score. Input (D, H, W); output
    (D', H', W', 1) channels-last."""
    vol = jnp.nan_to_num(volume.astype(jnp.float32))
    vol = resize_trilinear(vol, target_shape)
    vol = zscore(vol)
    return vol[..., None]


@partial(jax.jit, static_argnames=())
def random_flips(volume: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Independent p=0.5 flips along each spatial axis (reference
    _augment, 3D_resnet.py:260-268). ``volume`` is (D, H, W, C)."""
    bits = jax.random.bernoulli(rng, shape=(3,))
    for axis in range(3):
        volume = jnp.where(
            bits[axis], jnp.flip(volume, axis=axis), volume
        )
    return volume


def resize_trilinear_np(
    volume: np.ndarray, target_shape: tuple[int, int, int]
) -> np.ndarray:
    """Pure-NumPy trilinear resize with the same half-pixel-centres
    convention as ``resize_trilinear`` (align_corners=False). Used on
    loader threads: calling jitted device code from multiple host threads
    deadlocks on some platforms, and keeping preprocessing host-side frees
    the device for the train step."""
    volume = np.asarray(volume, np.float32)
    out = volume
    for axis, new_size in enumerate(target_shape):
        old_size = out.shape[axis]
        if old_size == new_size:
            continue
        scale = old_size / new_size
        coords = (np.arange(new_size, dtype=np.float32) + 0.5) * scale - 0.5
        coords = np.clip(coords, 0.0, old_size - 1)
        lo = np.floor(coords).astype(np.int64)
        hi = np.minimum(lo + 1, old_size - 1)
        w = (coords - lo).astype(np.float32)
        moved = np.moveaxis(out, axis, 0)
        shape_w = (new_size,) + (1,) * (moved.ndim - 1)
        interp = moved[lo] * (1.0 - w.reshape(shape_w)) + moved[hi] * w.reshape(shape_w)
        out = np.moveaxis(interp, 0, axis)
    return out


def load_volume(
    path: str | Path,
    target_shape: tuple[int, int, int],
) -> np.ndarray:
    """Host I/O + host preprocessing for one scan (thread-safe; no device
    work). Returns a (D, H, W, 1) float32 array: nan_to_num -> trilinear
    resize -> z-score (Bessel std + 1e-5, torch parity)."""
    raw = read_nifti(path)
    raw = np.nan_to_num(np.asarray(raw, np.float32))
    if raw.ndim == 4:
        raw = raw[..., 0]  # first volume of a 4D series
    elif raw.ndim != 3:
        raise ValueError(f"{path}: expected 3D/4D volume, got {raw.shape}")
    vol = resize_trilinear_np(raw, tuple(target_shape))
    mean = vol.mean()
    std = vol.std(ddof=1) if vol.size > 1 else 0.0
    vol = (vol - mean) / (std + 1e-5)
    return vol[..., None]
