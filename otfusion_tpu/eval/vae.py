"""Cross-modal shared-latent VAE matching ("VAE"/"VAE_label" methods).

The reference harness registers ``train_vae_model`` (and a
``use_label=False`` partial) as coupling methods (cv_inner_loop.py:69-70)
and consumes the trained model through ``infer_from_Xs``/``infer_from_Ys``
(encode each modality into a shared latent space) and
``predict_from_model`` (translate X → Y through the latent)
(cv_inner_loop.py:287-301, loo.py:114-185). The implementing module,
``perturbot.predict.scvi_vae``, is **absent from the reference
repository** — this is a native reconstruction of those call-site
semantics, the harness's scvi-tools dependency replaced by a compact Flax
model trained on device.

Model. One VAE per modality with a SHARED latent space:
``enc_x/dec_x`` and ``enc_y/dec_y`` (Gaussian posteriors, MSE
reconstruction, standard-normal KL). Alignment between the two latent
clouds — the property the matching metrics score — comes from an
adversarial term: a discriminator classifies which modality a latent came
from, and the encoders are trained to fool it (least-squares GAN,
alternating updates inside one jitted ``lax.scan``). ``use_label=True``
("VAE_label") conditions the discriminator on the treatment label, so
alignment is enforced *within* each treatment group rather than only
marginally — the label-aware variant's entire point.

Hyperparameters arrive as the reference's tuple grid
``(adv_weight, latent_dim, learning_rate)``
(cv_inner_loop.py:121-129: adv ∈ {1,5,10,50,100}, latent 128, lr 1e-4).

Downstream (matching quality) the harness builds kNN couplings between
``infer_from_Xs``/``infer_from_Ys`` latents via ``get_Ts_from_nn_multKs``
and scores FOSCTTM with ``use_barycenter=False`` — both already native
(metrics/ot_quality.py, eval/matching.py).

Expected quality: adversarial alignment matches latent DISTRIBUTIONS,
not pointwise correspondences — with a rotation-invariant Gaussian prior
the sample-level matching is fundamentally under-determined without a
pairing signal. This is the weak baseline the OT coupling methods are
shown to beat (the harness's entire comparison); near-random FOSCTTM on
hard data is the expected behaviour, not a defect.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

_HIDDEN = 256


class VAEMatchModel(NamedTuple):
    """Trained cross-modal VAE bundle (the harness's opaque "model")."""

    params: dict          # flax params of the joint module
    dim_x: int
    dim_y: int
    latent_dim: int
    x_mean: np.ndarray
    x_std: np.ndarray
    y_mean: np.ndarray
    y_std: np.ndarray
    n_labels: int


def _zstats(a):
    mean = a.mean(axis=0)
    std = a.std(axis=0)
    return mean, np.where(std < 1e-12, 1.0, std)


def _joint_module(dim_x, dim_y, latent_dim):
    import jax.numpy as jnp
    from flax import linen as nn

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.relu(nn.Dense(_HIDDEN)(h))
            h = nn.relu(nn.Dense(_HIDDEN)(h))
            mu = nn.Dense(latent_dim)(h)
            logvar = nn.Dense(latent_dim)(h)
            return mu, jnp.clip(logvar, -8.0, 8.0)

    class Decoder(nn.Module):
        out_dim: int

        @nn.compact
        def __call__(self, z):
            h = nn.relu(nn.Dense(_HIDDEN)(z))
            h = nn.relu(nn.Dense(_HIDDEN)(h))
            return nn.Dense(self.out_dim)(h)

    class Discriminator(nn.Module):
        @nn.compact
        def __call__(self, z, label_onehot=None):
            if label_onehot is not None:
                z = jnp.concatenate([z, label_onehot], axis=-1)
            h = nn.relu(nn.Dense(_HIDDEN)(z))
            h = nn.relu(nn.Dense(_HIDDEN)(h))
            return nn.Dense(1)(h)[..., 0]

    class Joint(nn.Module):
        """Container so one params tree carries all five submodules."""

        def setup(self):
            self.enc_x = Encoder()
            self.enc_y = Encoder()
            self.dec_x = Decoder(out_dim=dim_x)
            self.dec_y = Decoder(out_dim=dim_y)
            self.disc = Discriminator()

        def __call__(self, x, y, label_onehot=None):
            # init-only pass touching every submodule
            mx, _ = self.enc_x(x)
            my, _ = self.enc_y(y)
            return (
                self.dec_x(mx),
                self.dec_y(my),
                self.disc(mx, label_onehot),
                self.disc(my, label_onehot),
            )

    return Joint()


def train_vae_model(
    train_data: Tuple[Dict, Dict],
    eps=(10.0, 128, 1e-4),
    use_label: bool = True,
    *,
    steps: int = 600,
    seed: int = 0,
) -> Tuple[VAEMatchModel, Dict]:
    """Train the shared-latent cross-modal VAE (reconstruction of the
    missing ``perturbot.predict.scvi_vae.train_vae_model``). ``eps`` is
    the reference's hyperparameter tuple ``(adv_weight, latent_dim, lr)``.
    Returns ``(model, log)`` like every other coupling method."""
    import jax
    import jax.numpy as jnp
    import optax

    adv_w, latent_dim, lr = float(eps[0]), int(eps[1]), float(eps[2])
    x_dict, y_dict = train_data
    labels = sorted(x_dict.keys())
    n_labels = len(labels)
    x = np.concatenate([np.asarray(x_dict[l], np.float64) for l in labels])
    y = np.concatenate([np.asarray(y_dict[l], np.float64) for l in labels])
    lab_x = np.concatenate(
        [np.full(np.asarray(x_dict[l]).shape[0], i)
         for i, l in enumerate(labels)]
    )
    lab_y = np.concatenate(
        [np.full(np.asarray(y_dict[l]).shape[0], i)
         for i, l in enumerate(labels)]
    )
    x_mean, x_std = _zstats(x)
    y_mean, y_std = _zstats(y)
    xn = jnp.asarray((x - x_mean) / x_std, jnp.float32)
    yn = jnp.asarray((y - y_mean) / y_std, jnp.float32)
    oh_x = (jax.nn.one_hot(jnp.asarray(lab_x), n_labels)
            if use_label else None)
    oh_y = (jax.nn.one_hot(jnp.asarray(lab_y), n_labels)
            if use_label else None)

    module = _joint_module(x.shape[1], y.shape[1], latent_dim)
    params = module.init(
        jax.random.PRNGKey(seed), xn[:1], yn[:1],
        oh_x[:1] if use_label else None,
    )["params"]

    # One params tree; generator and discriminator each own an optimiser
    # that adams its own top-level branches and ZEROES the other's
    # (multi_transform — note optax.masked would pass the other side's
    # raw gradients through unchanged, which is wrong here).
    def _labels(disc_side):
        return {k: ("on" if (k == "disc") == disc_side else "off")
                for k in params}

    def _split_opt(disc_side):
        return optax.multi_transform(
            {"on": optax.adam(lr), "off": optax.set_to_zero()},
            _labels(disc_side),
        )

    gen_opt = _split_opt(False)
    disc_opt = _split_opt(True)
    gen_state = gen_opt.init(params)
    disc_state = disc_opt.init(params)

    def enc(p, name, h):
        return module.apply({"params": p}, h,
                            method=lambda m, v: getattr(m, name)(v))

    def dec(p, name, z):
        return module.apply({"params": p}, z,
                            method=lambda m, v: getattr(m, name)(v))

    def disc_fn(p, z, oh):
        return module.apply({"params": p}, z, oh,
                            method=lambda m, v, o: m.disc(v, o))

    def reparam(rng, mu, logvar):
        return mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)

    def latents(p, rng):
        mux, lvx = enc(p, "enc_x", xn)
        muy, lvy = enc(p, "enc_y", yn)
        r1, r2 = jax.random.split(rng)
        return (reparam(r1, mux, lvx), reparam(r2, muy, lvy),
                (mux, lvx, muy, lvy))

    def gen_loss(p, rng):
        zx, zy, (mux, lvx, muy, lvy) = latents(p, rng)
        rx = dec(p, "dec_x", zx)
        ry = dec(p, "dec_y", zy)
        recon = jnp.mean((rx - xn) ** 2) + jnp.mean((ry - yn) ** 2)
        kl = 0.5 * (
            jnp.mean(jnp.exp(lvx) + mux**2 - 1.0 - lvx)
            + jnp.mean(jnp.exp(lvy) + muy**2 - 1.0 - lvy)
        )
        # LSGAN generator term: both clouds pushed to the decision
        # boundary — the discriminator is frozen in this loss (its
        # gradient flows only into the encoders via optax.masked).
        dx = disc_fn(p, zx, oh_x)
        dy = disc_fn(p, zy, oh_y)
        adv = jnp.mean((dx - 0.5) ** 2) + jnp.mean((dy - 0.5) ** 2)
        # beta-VAE weighting: the KL anchors BOTH posteriors to the
        # same standard-normal prior — without it the two encoders drift
        # to different latent scales and cross-decoding (dec_y . enc_x)
        # leaves the decoder's training distribution.
        return recon + 5e-2 * kl + adv_w * 1e-2 * adv, (recon, kl, adv)

    def disc_loss(p, rng):
        zx, zy, _ = latents(p, rng)
        zx = jax.lax.stop_gradient(zx)
        zy = jax.lax.stop_gradient(zy)
        dx = disc_fn(p, zx, oh_x)
        dy = disc_fn(p, zy, oh_y)
        # X latents labelled 0, Y latents labelled 1 (LSGAN)
        return jnp.mean(dx**2) + jnp.mean((dy - 1.0) ** 2)

    def step(carry, rng):
        p, gen_s, disc_s = carry
        dl, dg = jax.value_and_grad(disc_loss)(p, rng)
        d_up, disc_s = disc_opt.update(dg, disc_s)
        p = optax.apply_updates(p, d_up)
        (gl, aux), gg = jax.value_and_grad(gen_loss, has_aux=True)(p, rng)
        g_up, gen_s = gen_opt.update(gg, gen_s)
        p = optax.apply_updates(p, g_up)
        return (p, gen_s, disc_s), (gl, dl, *aux)

    rngs = jax.random.split(jax.random.PRNGKey(seed + 1), steps)
    (params, _, _), traces = jax.jit(
        lambda c, r: jax.lax.scan(step, c, r)
    )((params, gen_state, disc_state), rngs)

    model = VAEMatchModel(
        params=jax.device_get(params), dim_x=x.shape[1], dim_y=y.shape[1],
        latent_dim=latent_dim,
        x_mean=x_mean, x_std=x_std, y_mean=y_mean, y_std=y_std,
        n_labels=n_labels,
    )
    gl, dl, recon, kl, adv = (np.asarray(t) for t in traces)
    log = {
        "final_gen_loss": float(gl[-1]),
        "final_disc_loss": float(dl[-1]),
        "final_recon": float(recon[-1]),
        "final_kl": float(kl[-1]),
        "final_adv": float(adv[-1]),
        "adv_weight": adv_w,
        "latent_dim": latent_dim,
        "lr": lr,
        "use_label": use_label,
    }
    return model, log


def _encode(model: VAEMatchModel, a: np.ndarray, which: str) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    mean, std = ((model.x_mean, model.x_std) if which == "enc_x"
                 else (model.y_mean, model.y_std))
    an = jnp.asarray((np.asarray(a, np.float64) - mean) / std, jnp.float32)
    module = _joint_module(model.dim_x, model.dim_y, model.latent_dim)
    mu, _ = module.apply({"params": model.params}, an,
                         method=lambda m, v: getattr(m, which)(v))
    return np.asarray(jax.device_get(mu), np.float64)


def infer_from_Xs(x_dict: Dict, model: VAEMatchModel, dim_y: int) -> Dict:
    """Encode each source group into the shared latent
    (call-site spec: cv_inner_loop.py:290, loo.py:173)."""
    return {l: _encode(model, v, "enc_x") for l, v in x_dict.items()}


def infer_from_Ys(y_dict: Dict, model: VAEMatchModel, dim_x: int) -> Dict:
    """Encode each target group into the shared latent
    (cv_inner_loop.py:289, loo.py:172)."""
    return {l: _encode(model, v, "enc_y") for l, v in y_dict.items()}


def predict_from_model(
    test_x: np.ndarray, model: VAEMatchModel, dim_y: int
) -> np.ndarray:
    """Translate X → Y through the shared latent: encode with enc_x
    (posterior mean), decode with dec_y, un-normalise
    (cv_inner_loop.py:317, loo.py:174)."""
    import jax
    import jax.numpy as jnp

    xn = jnp.asarray(
        (np.asarray(test_x, np.float64) - model.x_mean) / model.x_std,
        jnp.float32,
    )
    module = _joint_module(model.dim_x, model.dim_y, model.latent_dim)

    def fwd(m, v):
        mu, _ = m.enc_x(v)
        return m.dec_y(mu)

    yn = module.apply({"params": model.params}, xn, method=fwd)
    return (np.asarray(jax.device_get(yn), np.float64) * model.y_std
            + model.y_mean)


__all__ = [
    "VAEMatchModel",
    "infer_from_Xs",
    "infer_from_Ys",
    "predict_from_model",
    "train_vae_model",
]
