"""Plot artifacts: confusion-matrix and t-SNE PNGs.

Reference emits a seaborn heatmap confusion matrix
(save_confusion_matrix, 3D_resnet.py:675-702 / attn:191-220) and a t-SNE
scatter of validation logits (attn:1326-1350). Matplotlib-only here
(seaborn is absent from this image); the visual content — annotated count
heatmap with short class labels, coolwarm t-SNE scatter — is preserved.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from otfusion_tpu.metrics.classification import confusion_matrix


def save_confusion_matrix_png(
    y_true: Sequence[int],
    y_pred: Sequence[int],
    class_names: Dict[str, int],
    save_path: str | Path,
) -> None:
    labels = sorted(class_names, key=class_names.get)
    short = [l.split("_")[0] for l in labels]
    cm = confusion_matrix(y_true, y_pred, len(labels))

    fig, ax = plt.subplots(figsize=(10, 8))
    im = ax.imshow(cm, cmap="Blues")
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(
                j, i, str(cm[i, j]), ha="center", va="center",
                color="white" if cm[i, j] > cm.max() / 2 else "black",
            )
    ax.set_xticks(range(len(short)), short)
    ax.set_yticks(range(len(short)), short)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title("Confusion Matrix")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)


def save_tsne_png(
    features: np.ndarray,
    labels: Sequence[int],
    save_path: str | Path,
    title: str = "t-SNE of Validation Predictions (Best Model)",
    seed: int = 42,
) -> None:
    from sklearn.manifold import TSNE

    features = np.asarray(features)
    n = features.shape[0]
    perplexity = min(30.0, max(1.0, (n - 1) / 3.0))
    coords = TSNE(
        n_components=2, random_state=seed, perplexity=perplexity
    ).fit_transform(features)

    fig, ax = plt.subplots(figsize=(8, 6))
    scatter = ax.scatter(
        coords[:, 0], coords[:, 1], c=list(labels), cmap="coolwarm",
        alpha=0.7,
    )
    ax.set_title(title)
    ax.set_xlabel("Dim 1")
    ax.set_ylabel("Dim 2")
    fig.colorbar(scatter, ticks=sorted(set(int(l) for l in labels)))
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
