"""Legacy GAMMA (fundus + OCT) dataset (reference data_gamma.py:193-378).

On-disk layout (reference __getitem__, data_gamma.py:253-267):

    <root>/MGamma/<index>/data_<index>.nii                (OCT volume)
    <root>/multi-modality_images/<index>/data_<index>_fundus.png
    label CSV: columns [data, <one-hot class columns...>]

Loading parity: fundus PNG resized to 384x384 RGB, OCT volume resized to
96^3, both scaled by /255; label = argmax of the one-hot row. Train
augmentations reproduce the torchvision pipeline behaviourally: colour
jitter (p=0.8), random grayscale (p=0.2), horizontal flip for fundus;
horizontal flip for OCT (data_gamma.py:216-236). PIL replaces cv2 (absent
from this image); channel order is RGB rather than cv2's BGR — a
label-free permutation of input channels.
"""

from __future__ import annotations

import csv
import os
import random
from pathlib import Path
from typing import Iterator, List, Sequence, Tuple

import numpy as np
from PIL import Image

from otfusion_tpu.data.nifti_io import read_nifti
from otfusion_tpu.data.preprocess import resize_trilinear_np


def read_gamma_labels(label_file: str | Path) -> dict[int, int]:
    """CSV of [data, onehot...] -> {index: argmax label}."""
    out = {}
    with open(label_file) as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            if not row:
                continue
            onehot = [float(v) for v in row[1:]]
            out[int(row[0])] = int(np.argmax(onehot))
    return out


def list_gamma_cases(dataset_root: str | Path) -> List[str]:
    """Numeric case directories under the MGamma root, sorted."""
    root = Path(dataset_root)
    return sorted(
        [d.name for d in root.iterdir() if d.is_dir() and d.name.isdigit()]
    )


def load_fundus(path: str | Path, size: int = 384) -> np.ndarray:
    img = Image.open(path).convert("RGB").resize((size, size),
                                                 Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def load_oct(path: str | Path, shape=(96, 96, 96)) -> np.ndarray:
    vol = np.nan_to_num(np.asarray(read_nifti(path), np.float32))
    if vol.ndim == 4:
        vol = vol[..., 0]
    vol = resize_trilinear_np(vol, tuple(shape))
    return (vol / 255.0)[..., None]


def _color_jitter(img: np.ndarray, rng: random.Random) -> np.ndarray:
    """Brightness/contrast/saturation 0.2, hue 0.1 — behavioural stand-in
    for torchvision ColorJitter."""
    b = 1.0 + rng.uniform(-0.2, 0.2)
    c = 1.0 + rng.uniform(-0.2, 0.2)
    s = 1.0 + rng.uniform(-0.2, 0.2)
    img = img * b
    mean = img.mean()
    img = (img - mean) * c + mean
    gray = img.mean(axis=2, keepdims=True)
    img = gray + (img - gray) * s
    return np.clip(img, 0.0, 1.0)


class GammaDataset:
    """Index of (case_id, label) pairs with lazy loading."""

    def __init__(
        self,
        dataset_root: str | Path,
        label_file: str | Path,
        filelists: Sequence[str] | None = None,
        oct_shape=(96, 96, 96),
        fundus_size: int = 384,
    ):
        self.root = Path(dataset_root)
        self.images_root = Path(
            str(self.root).replace("/MGamma", "/multi-modality_images")
        )
        self.oct_shape = tuple(oct_shape)
        self.fundus_size = fundus_size
        labels = read_gamma_labels(label_file)
        cases = (
            [os.path.basename(f) for f in filelists]
            if filelists is not None
            else list_gamma_cases(self.root)
        )
        self.samples: List[Tuple[str, int]] = [
            (c, labels[int(c)]) for c in cases if c.isdigit()
            and int(c) in labels
        ]
        if not self.samples:
            raise RuntimeError(f"No GAMMA cases found under {self.root}")

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, case: str) -> Tuple[np.ndarray, np.ndarray]:
        fundus = load_fundus(
            self.images_root / case / f"data_{case}_fundus.png",
            self.fundus_size,
        )
        oct_vol = load_oct(
            self.root / case / f"data_{case}.nii", self.oct_shape
        )
        return fundus, oct_vol


class GammaLoader:
    """Batching loader with the reference's train-time augmentations."""

    def __init__(
        self,
        dataset: GammaDataset,
        indices: Sequence[int],
        batch_size: int,
        shuffle: bool = False,
        augment: bool = False,
        seed: int = 42,
        feed_dtype=np.float32,
    ):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.rng = random.Random(seed)
        # bf16 compute mode ships bf16 batches — exact, the first conv
        # casts anyway (see data/loader.py:feed_dtype_for)
        self.feed_dtype = np.dtype(feed_dtype)
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def __len__(self) -> int:
        return (len(self.indices) + self.batch_size - 1) // self.batch_size

    def _get(self, case: str):
        if case not in self._cache:
            self._cache[case] = self.dataset.load(case)
        return self._cache[case]

    def _augment(self, fundus, oct_vol):
        if self.rng.random() < 0.8:
            fundus = _color_jitter(fundus, self.rng)
        if self.rng.random() < 0.2:
            fundus = np.repeat(fundus.mean(axis=2, keepdims=True), 3, axis=2)
        if self.rng.random() < 0.5:
            fundus = fundus[:, ::-1, :]
        if self.rng.random() < 0.5:
            oct_vol = oct_vol[:, :, ::-1, :]
        return np.ascontiguousarray(fundus), np.ascontiguousarray(oct_vol)

    def __iter__(
        self,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = list(self.indices)
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            fundus, octs, labels = [], [], []
            for i in chunk:
                case, label = self.dataset.samples[i]
                f, o = self._get(case)
                if self.augment:
                    f, o = self._augment(f, o)
                fundus.append(f)
                octs.append(o)
                labels.append(label)
            yield (
                np.stack(fundus).astype(self.feed_dtype, copy=False),
                np.stack(octs).astype(self.feed_dtype, copy=False),
                np.asarray(labels, np.int32),
            )


def make_synthetic_gamma(
    root: str | Path,
    n_cases: int = 8,
    n_classes: int = 2,
    fundus_size: int = 64,
    oct_shape=(24, 24, 24),
    seed: int = 0,
) -> tuple[Path, Path]:
    """Miniature GAMMA-layout fixture; returns (mgamma_root, label_csv)."""
    from otfusion_tpu.data.nifti_io import write_nifti

    root = Path(root)
    mgamma = root / "MGamma"
    images = root / "multi-modality_images"
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_cases):
        case = f"{i:04d}"
        label = i % n_classes
        (mgamma / case).mkdir(parents=True, exist_ok=True)
        (images / case).mkdir(parents=True, exist_ok=True)
        base = rng.uniform(0, 80, size=(fundus_size, fundus_size, 3))
        base[:, :, label] += 120.0  # class-tinted channel
        Image.fromarray(base.astype(np.uint8)).save(
            images / case / f"data_{case}_fundus.png"
        )
        vol = rng.uniform(0, 100, size=oct_shape).astype(np.float32)
        vol += label * 80.0
        write_nifti(mgamma / case / f"data_{case}.nii", vol)
        onehot = [0] * n_classes
        onehot[label] = 1
        rows.append([case, *onehot])
    label_csv = root / "labels.csv"
    with open(label_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["data"] + [f"c{i}" for i in range(n_classes)])
        writer.writerows(rows)
    return mgamma, label_csv
