"""Per-modality VAE preprocessing for latent-space OT matching.

The reference's CV/LOO drivers import ``perturbot.preprocess.vae``
(``train_vae_rna``/``train_vae_acc``/``train_vae_prot``,
``SCVI_LATENT_KEY`` — cv.py:17-23, loo.py:21-26) to run the OT matching
in scVI latent spaces instead of raw feature space
(loo.py:188-283 ``run_models_vae_then_ot``: per-modality VAEs trained on
the training folds, couplings solved between their latents, predictions
decoded from the OT-mapped latent). The implementing module is **absent
from the reference repository** (like predict.scvi_vae) — this is a
native reconstruction of the call-site semantics with a compact Flax
VAE per modality (scvi-tools replaced; the harness consumes only the
latent coordinates, never scVI's count-model internals).

Unlike eval/vae.py (the SHARED-latent adversarial matching method
"VAE"/"VAE_label"), these are INDEPENDENT per-modality compressors: no
cross-modal alignment is learned here — alignment is the OT solver's
job, exactly the reference's division of labour.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

# Parity with scvi-tools' obsm key (cv.py:22 imports it by this name).
SCVI_LATENT_KEY = "X_scVI"

_HIDDEN = 256


class ModalityVAE(NamedTuple):
    """Trained single-modality VAE (params + normalisation stats)."""

    params: dict
    dim: int
    latent_dim: int
    mean: np.ndarray
    std: np.ndarray


def _module(dim: int, latent_dim: int):
    import jax.numpy as jnp
    from flax import linen as nn

    class VAE(nn.Module):
        def setup(self):
            self.enc_h1 = nn.Dense(_HIDDEN)
            self.enc_h2 = nn.Dense(_HIDDEN)
            self.mu = nn.Dense(latent_dim)
            self.logvar = nn.Dense(latent_dim)
            self.dec_h1 = nn.Dense(_HIDDEN)
            self.dec_h2 = nn.Dense(_HIDDEN)
            self.out = nn.Dense(dim)

        def encode(self, x):
            h = nn.relu(self.enc_h1(x))
            h = nn.relu(self.enc_h2(h))
            return self.mu(h), jnp.clip(self.logvar(h), -8.0, 8.0)

        def decode(self, z):
            h = nn.relu(self.dec_h1(z))
            h = nn.relu(self.dec_h2(h))
            return self.out(h)

        def __call__(self, x):  # init-only
            mu, lv = self.encode(x)
            return self.decode(mu)

    return VAE()


def _zstats(a):
    mean = a.mean(axis=0)
    std = a.std(axis=0)
    return mean, np.where(std < 1e-12, 1.0, std)


def train_modality_vae(
    x_dict: Dict,
    latent_dim: int = 10,
    *,
    steps: int = 500,
    lr: float = 1e-3,
    seed: int = 0,
) -> Tuple[ModalityVAE, Dict]:
    """Train one VAE on every sample of one modality (the
    ``train_vae_rna``-family semantics: fit on the training AnnData,
    expose latents under SCVI_LATENT_KEY). ``x_dict`` is the harness's
    {treatment label: (n_l, d)} layout; returns (model, log)."""
    import jax
    import jax.numpy as jnp
    import optax

    x = np.concatenate(
        [np.asarray(x_dict[k], np.float64) for k in sorted(x_dict)])
    mean, std = _zstats(x)
    xn = jnp.asarray((x - mean) / std, jnp.float32)
    dim = x.shape[1]

    module = _module(dim, latent_dim)
    params = module.init(jax.random.PRNGKey(seed), xn[:1])["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def enc(p, h):
        return module.apply({"params": p}, h,
                            method=lambda m, v: m.encode(v))

    def dec(p, z):
        return module.apply({"params": p}, z,
                            method=lambda m, v: m.decode(v))

    def loss_fn(p, rng):
        mu, lv = enc(p, xn)
        z = mu + jnp.exp(0.5 * lv) * jax.random.normal(rng, mu.shape)
        recon = jnp.mean((dec(p, z) - xn) ** 2)
        kl = 0.5 * jnp.mean(jnp.exp(lv) + mu**2 - 1.0 - lv)
        return recon + 5e-2 * kl, (recon, kl)

    def step(carry, rng):
        p, s = carry
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, rng)
        up, s = opt.update(g, s)
        p = optax.apply_updates(p, up)
        return (p, s), loss

    import jax.random as jrandom

    rngs = jrandom.split(jrandom.PRNGKey(seed + 1), steps)
    (params, _), losses = jax.lax.scan(step, (params, opt_state), rngs)
    params = jax.device_get(params)
    model = ModalityVAE(params=params, dim=dim, latent_dim=latent_dim,
                        mean=mean, std=std)
    return model, {
        "final_loss": float(np.asarray(losses)[-1]),
        "losses": np.asarray(losses[:: max(1, steps // 50)]).tolist(),
    }


def encode(model: ModalityVAE, x: np.ndarray) -> np.ndarray:
    """Posterior-mean latent coordinates (the SCVI_LATENT_KEY obsm)."""
    import jax.numpy as jnp

    module = _module(model.dim, model.latent_dim)
    xn = jnp.asarray(
        (np.asarray(x, np.float64) - model.mean) / model.std, jnp.float32)
    mu, _ = module.apply({"params": model.params}, xn,
                         method=lambda m, v: m.encode(v))
    return np.asarray(mu, np.float64)


def decode(model: ModalityVAE, z: np.ndarray) -> np.ndarray:
    """Latent -> data space (un-normalised back to the input scale)."""
    import jax.numpy as jnp

    module = _module(model.dim, model.latent_dim)
    out = module.apply({"params": model.params},
                       jnp.asarray(z, jnp.float32),
                       method=lambda m, v: m.decode(v))
    return np.asarray(out, np.float64) * model.std + model.mean


def encode_dict(model: ModalityVAE, x_dict: Dict) -> Dict:
    """Encode every treatment group ({label: (n_l, d)} -> latents)."""
    return {k: encode(model, np.asarray(v)) for k, v in x_dict.items()}
