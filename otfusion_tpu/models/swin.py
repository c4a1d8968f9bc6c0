"""Swin Transformer 2D backbone (reference Models/swin_transformer.py).

Faithful compact Flax rebuild: 4x4 patch embedding, stages of
window-attention blocks with alternating cyclic shifts, relative position
bias, patch merging between stages, stochastic depth, and optional
``remat`` (the reference's ``use_checkpoint=True`` gradient checkpointing,
its only memory-scaling device — fundus_swin_network.py:31,49).

``forward_features`` parity (swin_transformer.py:745-765): returns
``(tokens, pooled)`` where tokens are the final-norm sequence and pooled
is their mean. The fundus build config (fundus_swin_network.build_model,
:13-77): img 384, patch 4, embed 128, depths (2,2,18,2), heads
(4,8,16,32), window 12 -> ``swin_base_384()``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws^2, ws^2) additive mask for shifted windows."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wss, :] = cnt
            cnt += 1
    windows = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    windows = windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    attn_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        bnw, n, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        attn = (q * (head_dim ** -0.5)) @ k.transpose(0, 1, 3, 2)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads), jnp.float32,
        )
        idx = _relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, self.heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, self.heads, n, n)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, c = x.shape
        ws = min(self.window, h, w)
        shift = self.shift if ws < min(h, w) else 0

        shortcut = x
        # Block-internal norms emit the compute dtype (stats/params stay
        # f32 in flax); only the final token norm pins f32.
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        # Pad to window multiples (official Swin pads in forward; the
        # reference's 384/4/12 geometry always divides so it never hits
        # this, but other input sizes do).
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        windows = _window_partition(y, ws)
        attn = WindowAttention(self.dim, self.heads, ws,
                               dtype=self.dtype)(windows, mask, train)
        y = _window_reverse(attn, ws, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w, :]
        x = shortcut + self._drop_path(y, train)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        # exact (erf) GELU: torch nn.GELU's default, which the Swin
        # .pth weights were trained under — flax's tanh approximation
        # diverges ~1e-3 per block (caught by test_torch_golden.py)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + self._drop_path(y, train)

    def _drop_path(self, y, train):
        if self.drop_path == 0.0 or not train:
            return y
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
        return jnp.where(mask, y / keep, 0.0)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:  # official Swin pads odd feature maps
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            h, w = h + h % 2, w + w % 2
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False,
                        dtype=self.dtype)(x)


class SwinTransformer2D(nn.Module):
    """Returns (tokens, pooled) like the reference forward_features."""

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 12
    patch_size: int = 4
    drop_path_rate: float = 0.5
    remat: bool = True
    # parity with the swin_transformer_vis.py variant, which additionally
    # returns the feature map after the third-from-last stage (:752-756)
    return_hidden: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)

        total_blocks = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_blocks)
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if self.remat \
            else SwinBlock

        bi = 0
        vis_feat = None
        for stage, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** stage)
            for i in range(depth):
                x = block_cls(
                    dim, self.heads[stage], self.window,
                    shift=0 if i % 2 == 0 else self.window // 2,
                    drop_path=float(dpr[bi]), dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, train)
                bi += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"merge{stage}")(x)
            if stage == len(self.depths) - 3:
                # reference captures AFTER the stage's downsample
                # (BasicLayer.forward applies PatchMerging last,
                # swin_transformer_vis.py:568-570, capture at :752-756)
                vis_feat = x

        tokens = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.reshape(b, -1, x.shape[-1]).astype(jnp.float32))
        pooled = tokens.mean(axis=1)
        if self.return_hidden:
            return tokens, pooled, vis_feat
        return tokens, pooled


def swin_base_384(dtype=jnp.float32, **kwargs) -> SwinTransformer2D:
    """Fundus config (fundus_swin_network.build_model:13-77)."""
    return SwinTransformer2D(embed_dim=128, depths=(2, 2, 18, 2),
                             heads=(4, 8, 16, 32), window=12,
                             drop_path_rate=0.5, dtype=dtype, **kwargs)
