"""Tests for the Perturb-OT evaluation harness rebuild
(otfusion_tpu/eval/ vs reference perturbot/perturbot/eval/)."""

import numpy as np
import pytest

from otfusion_tpu.eval import (
    coupling_confusion_matrix,
    get_FOSCTTM,
    get_diag_fracs,
    get_evals,
    get_rel_mse,
    make_G,
    ols_normed,
    predict,
    run_all,
    run_feature_matching,
    run_inner_cv,
    run_loo,
    run_outer_cv,
    train_mlp,
    weight_1_ols_normed,
    weighted_ols_normed,
)
from otfusion_tpu.eval.prediction import spearman_rowwise
from otfusion_tpu.eval.vae import (
    infer_from_Xs,
    infer_from_Ys,
    predict_from_model,
    train_vae_model,
)
from otfusion_tpu.ops.api import (
    get_coupling_cot_sinkhorn,
    get_coupling_each_cot_sinkhorn,
)


def synthetic_screen(
    n_labels=6, n=12, d=5, dp=4, noise=0.05, seed=0, linear=True
):
    """Chemical-screen-shaped data: per label, X and Y rows share a latent
    (true pairing = same row index); Z buckets the first latent dim."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, d))
    b = rng.normal(size=(3, dp))
    xs, ys, zs = {}, {}, {}
    for l in range(n_labels):
        z = rng.normal(size=(n, 3))
        xs[l] = z @ a + noise * rng.normal(size=(n, d))
        ys[l] = (z @ b if linear else np.tanh(z @ b)) + noise * rng.normal(
            size=(n, dp)
        )
        zs[l] = (z[:, 0] > 0).astype(int)
    return {
        "Xs_dict": xs,
        "Xt_dict": ys,
        "Zs_dict": {"dosage": zs},
        "Zt_dict": {"dosage": zs},
    }


def perfect_couplings(xs):
    """Identity couplings with total mass 1 across labels — the
    normalisation the reference call sites apply before get_diag_fracs
    (all.py:132-140)."""
    total = sum(v.shape[0] for v in xs.values())
    return {k: np.eye(v.shape[0]) / total for k, v in xs.items()}


def random_couplings(xs, ys):
    total = sum(
        xs[k].shape[0] * ys[k].shape[0] for k in xs
    )
    return {
        k: np.ones((xs[k].shape[0], ys[k].shape[0])) / total for k in xs
    }


# ---------------------------------------------------------------- matching


def test_confusion_matrix_matches_loop_oracle(rng):
    data = synthetic_screen(n_labels=3, n=6)
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    zs = data["Zs_dict"]["dosage"]
    ts = {k: rng.random((6, 6)) for k in xs}
    cmat, dfrac = coupling_confusion_matrix(ts, xs, ys, zs, zs)
    # straight-line oracle (reference match.py:61-65 semantics)
    m = max(int(v.max()) for v in zs.values()) + 1
    want = np.zeros((m, m))
    for k in xs:
        for i in range(6):
            for j in range(6):
                want[int(zs[k][i]), int(zs[k][j])] += ts[k][i, j]
    np.testing.assert_allclose(cmat, want, rtol=1e-12)
    assert dfrac == pytest.approx(np.trace(want))


def test_diag_fracs_perfect_and_random_endpoints():
    data = synthetic_screen()
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    zs = data["Zs_dict"]["dosage"]
    _, rel_perfect = get_diag_fracs(perfect_couplings(xs), xs, ys, zs, zs)
    _, rel_random = get_diag_fracs(random_couplings(xs, ys), xs, ys, zs, zs)
    assert rel_perfect == pytest.approx(1.0)
    assert rel_random == pytest.approx(0.0, abs=1e-12)


def test_diag_fracs_accepts_dense_block_matrix():
    data = synthetic_screen(n_labels=3, n=5)
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    zs = data["Zs_dict"]["dosage"]
    ts = perfect_couplings(xs)
    dense = np.zeros((15, 15))
    for i, k in enumerate(xs):
        dense[i * 5 : (i + 1) * 5, i * 5 : (i + 1) * 5] = ts[k]
    d1, r1 = get_diag_fracs(ts, xs, ys, zs, zs)
    d2, r2 = get_diag_fracs(dense, xs, ys, zs, zs)
    assert d1 == pytest.approx(d2)
    assert r1 == pytest.approx(r2)


def test_foscttm_identity_coupling_near_zero():
    data = synthetic_screen(noise=0.0)
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    # identity coupling barycentrically projects each x_i exactly onto
    # its true y_i -> FOSCTTM 0 (match.py:202-206 semantics)
    _, mean_f = get_FOSCTTM(perfect_couplings(xs), xs, ys)
    assert mean_f == pytest.approx(0.0, abs=1e-12)
    _, mean_rand = get_FOSCTTM(random_couplings(xs, ys), xs, ys)
    assert mean_rand > 0.2  # uniform projection ranks ~ random


def test_rel_mse_endpoints():
    xs = {0: np.zeros((8, 3))}
    rel = get_rel_mse({0: np.eye(8)})
    assert rel[0] == pytest.approx(0.0)
    rel = get_rel_mse({0: np.ones((8, 8))})
    assert rel[0] == pytest.approx(1.0)


# -------------------------------------------------------------- prediction


def test_spearman_matches_scipy(rng):
    from scipy.stats import spearmanr

    a = rng.normal(size=(7, 9))
    b = rng.normal(size=(7, 9))
    a[2, :3] = a[2, 3]  # force ties
    ours = spearman_rowwise(a, b)
    want = [spearmanr(a[i], b[i])[0] for i in range(7)]
    np.testing.assert_allclose(ours, want, atol=1e-9)


def test_get_evals_keys_and_perfect_prediction():
    y = np.random.default_rng(1).normal(size=(10, 6))
    ev = get_evals(y, y)
    assert ev["MSE"] == pytest.approx(0.0)
    assert ev["Pearson_corr"] == pytest.approx(1.0)
    for k in ["Pearson_corr", "Spearman_corr", "Pearson_samples",
              "Spearman_samples", "MSE"]:
        assert k in ev


def test_weighted_ols_recovers_linear_map(rng):
    data = synthetic_screen(noise=0.01, seed=3)
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    param = weighted_ols_normed(xs, ys, perfect_couplings(xs))
    x_test = np.concatenate(list(xs.values()))
    y_test = np.concatenate(list(ys.values()))
    pred = predict(x_test, param)
    # in-sample fit with the perfect coupling ~= plain OLS on pairs
    assert np.mean((pred - y_test) ** 2) < 0.01
    # the uniform-coupling "random" baseline collapses to the mean
    param_rand = weight_1_ols_normed(xs, ys)
    pred_rand = predict(x_test, param_rand)
    assert np.mean((pred - y_test) ** 2) < np.mean((pred_rand - y_test) ** 2)


def test_ols_normed_equals_weighted_with_identity():
    data = synthetic_screen(seed=4)
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    p1 = ols_normed(xs, ys)
    p2 = weighted_ols_normed(xs, ys, perfect_couplings(xs))
    np.testing.assert_allclose(p1["W"], p2["W"], atol=1e-8)


def test_make_G_matches_reference_semantics():
    g = make_G(5, np.array([0, 1, 0, 1, 1]))
    want = np.array(
        [[1, 0, 1, 0, 0],
         [0, 1, 0, 1, 1],
         [1, 0, 1, 0, 0],
         [0, 1, 0, 1, 1],
         [0, 1, 0, 1, 1]], dtype=float)
    np.testing.assert_array_equal(g, want)


def test_train_mlp_fits_barycentric_targets():
    data = synthetic_screen(noise=0.01, seed=5)
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    model, log = train_mlp((xs, ys), perfect_couplings(xs), epochs=200)
    x_all = np.concatenate(list(xs.values()))
    y_all = np.concatenate(list(ys.values()))
    pred = model(x_all)
    assert pred.shape == y_all.shape
    assert np.mean((pred - y_all) ** 2) < 0.05
    assert log["final_loss"] < log["loss_curve"][0]


# ------------------------------------------------------------------ ECOOT


def test_ecoot_global_coupling_marginals():
    data = synthetic_screen(n_labels=2, n=6, seed=6)
    t, log = get_coupling_cot_sinkhorn(
        (data["Xs_dict"], data["Xt_dict"]), 0.5
    )
    assert t.shape == (12, 12)
    np.testing.assert_allclose(t.sum(1), np.full(12, 1 / 12), atol=1e-2)
    assert "Tv" in log


def test_ecoot_each_per_label_dict():
    data = synthetic_screen(n_labels=2, n=5, seed=7)
    ts, log = get_coupling_each_cot_sinkhorn(
        (data["Xs_dict"], data["Xt_dict"]), 0.5
    )
    assert set(ts) == {0, 1}
    assert ts[0].shape == (5, 5)
    assert log[0]["Tv"].shape == (5, 4)


# ---------------------------------------------------------------- harness


def test_inner_cv_structure_and_best_eps():
    # LEOT needs matching feature dims (cross sq-euclidean cost)
    data = synthetic_screen(n_labels=10, n=8, d=5, dp=5, seed=8)
    result = run_inner_cv(
        data, "LEOT_ott", test_idx=0, epsilons=[1e-1, 1e-3]
    )
    assert set(result["best_eps"]) == {"matching", "pred"}
    assert result["best_eps"]["matching"] in (1e-1, 1e-3)
    assert set(result["matching_evals"]) == {1e-1, 1e-3}
    # best_eps["matching"] is the argmin of the matching scores
    assert result["best_eps"]["matching"] == min(
        result["matching_evals"], key=result["matching_evals"].get
    )
    assert len(result["test_labels"]) == 2
    # couplings stored per (eps, val-fold)
    assert len(result["T"][1e-3]) == 5


def test_outer_cv_baseline_perfect_beats_random():
    data = synthetic_screen(n_labels=6, n=10, seed=9, noise=0.02)
    perfect = run_outer_cv(
        data, "EGWL_ott", 0, 1e-3, 1e-3, baseline="perfect"
    )
    rand = run_outer_cv(
        data, "EGWL_ott", 0, 1e-3, 1e-3, baseline="random"
    )
    assert perfect["matching_evals"]["rel_dfracs"] == pytest.approx(1.0)
    assert (perfect["pred_evals"]["full"]["MSE"]
            < rand["pred_evals"]["full"]["MSE"])


def test_loo_ot_beats_random_baseline():
    data = synthetic_screen(n_labels=4, n=10, seed=10, noise=0.02)
    rows, log = run_loo(data, "EGWL_ott", eps=1e-3)
    assert len(rows) == 4 * 4  # 4 hold-outs x (ot + 3 baselines)
    by_id = {}
    for row in rows:
        by_id.setdefault(row["_id"], []).append(row["MSE"])
    assert np.mean(by_id["perfect"]) <= np.mean(by_id["random"])
    # OT coupling should do meaningfully better than the random floor
    assert np.mean(by_id["ot"]) < np.mean(by_id["random"])
    assert set(log["ot_couplings"]) == {0, 1, 2, 3}


def test_run_all_normalises_and_scores():
    data = synthetic_screen(n_labels=3, n=8, seed=11)
    result = run_all(data, "EGWL_ott", eps=1e-3)
    total = sum(np.asarray(v).sum() for v in result["T"].values())
    assert total == pytest.approx(1.0)
    assert 0.0 <= result["matching_evals"]["mean_foscttm"] <= 1.0
    assert np.isfinite(result["matching_evals"]["rel_dfracs"])


def test_feature_matching_perfect_coupling_recovers_feature_pairs():
    # Y features are a permutation of X features: the FOT Tv under the
    # perfect sample coupling should concentrate on the permutation.
    rng = np.random.default_rng(12)
    perm = np.array([2, 0, 3, 1])
    xs, ys = {}, {}
    for l in range(2):
        x = rng.normal(size=(24, 4))
        xs[l] = x
        ys[l] = x[:, perm] + 0.01 * rng.normal(size=(24, 4))
    data = {"Xs_dict": xs, "Xt_dict": ys,
            "Zs_dict": {"dosage": {l: np.zeros(24, int) for l in range(2)}},
            "Zt_dict": {"dosage": {l: np.zeros(24, int) for l in range(2)}}}
    result = run_feature_matching(data, "perfect", eps=1e-3)
    tv = np.asarray(result["Tv"])
    assert tv.shape == (4, 4)
    # Tv[i, j] couples X-feature i with Y-feature j, and Y[:, j] equals
    # X[:, perm[j]] — so the mass sits at Tv[perm[j], j].
    on_perm = tv[perm, np.arange(4)].sum()
    assert on_perm > 2.0 * (tv.sum() / 4.0)  # ≥2x the uniform share


def test_cli_all_roundtrip(tmp_path):
    import pickle

    from otfusion_tpu.cli.perturbot_eval import main

    data = synthetic_screen(n_labels=3, n=6, d=5, dp=5, seed=13)
    path = tmp_path / "screen.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    rc = main(["--out-dir", str(tmp_path), "--quiet",
               "all", "LEOT_ott", str(path), "0.001"])
    assert rc == 0
    with open(tmp_path / "all_LEOT_ott.0.001.pkl", "rb") as f:
        result = pickle.load(f)
    assert "matching_evals" in result and "T" in result


# -------------------------------------------------------------------- VAE


def test_vae_train_and_roundtrip():
    data = synthetic_screen(n_labels=3, n=20, d=8, dp=6, seed=20)
    xs, ys = data["Xs_dict"], data["Xt_dict"]
    model, log = train_vae_model((xs, ys), (10.0, 4, 1e-3), steps=300)
    assert np.isfinite(log["final_gen_loss"])
    assert np.isfinite(log["final_disc_loss"])
    lx = infer_from_Xs(xs, model, 6)
    ly = infer_from_Ys(ys, model, 8)
    assert lx[0].shape == (20, 4) and ly[0].shape == (20, 4)
    # both latent clouds anchored to the shared prior: comparable scales
    sx = np.concatenate(list(lx.values())).std()
    sy = np.concatenate(list(ly.values())).std()
    assert 0.2 < sx / sy < 5.0
    pred = predict_from_model(np.concatenate(list(xs.values())), model, 6)
    assert pred.shape == (60, 6)
    assert np.all(np.isfinite(pred))


def test_vae_registry_and_inner_cv_branch():
    from otfusion_tpu.eval.harness import OT_METHOD_HYPERPARAMS, OT_METHOD_MAP

    assert "VAE" in OT_METHOD_MAP and "VAE_label" in OT_METHOD_MAP
    assert OT_METHOD_HYPERPARAMS["VAE"][0] == (1, 128, 1e-4)
    data = synthetic_screen(n_labels=10, n=8, d=6, dp=5, seed=21)
    result = run_inner_cv(
        data, "VAE_label", test_idx=0,
        epsilons=[(5.0, 4, 1e-3)], n_splits=2,
    )
    eps = (5.0, 4, 1e-3)
    assert result["best_eps"]["matching"] == eps
    assert np.isfinite(result["matching_evals"][eps])
    # dfracs arrive as per-k dicts on the VAE path
    assert isinstance(result["dfracs"][eps][0], dict)
    mses = [d["MSE"] for d in result["pred_evals"][eps]]
    assert all(np.isfinite(m) for m in mses)


def test_vae_run_all_and_loo_branches():
    data = synthetic_screen(n_labels=3, n=12, d=6, dp=5, seed=22)
    result = run_all(data, "VAE", eps=(5.0, 4, 1e-3))
    assert 0.0 <= result["matching_evals"]["mean_foscttm"] <= 1.0
    assert isinstance(result["matching_evals"]["rel_dfracs"], dict)
    rows, log = run_loo(data, "VAE_label", eps=(5.0, 4, 1e-3))
    assert len(rows) == 3  # one VAE row per hold-out
    assert all(r["_id"] == "VAE" for r in rows)
    assert all(np.isfinite(r["MSE"]) for r in rows)
    assert "latent_X" in log and "pred_T_k5" in log


def test_outer_cv_ot_method_end_to_end():
    """Non-baseline outer loop: EGWL coupling on train-val labels, MLP
    prediction on the held-out fold (cv_outer_loop.py:176-284 path)."""
    data = synthetic_screen(n_labels=5, n=10, seed=30, noise=0.02)
    result = run_outer_cv(data, "EGWL_ott", 0, 1e-3, 1e-3)
    me = result["matching_evals"]
    assert 0.0 <= me["mean_foscttm"] <= 1.0
    assert np.isfinite(me["rel_dfracs"])
    pe = result["pred_evals"]["full"]
    # NOTE: no absolute-quality bound here — GW couplings are invariant
    # to isometries of the feature clouds, so a reflection-flipped
    # alignment can score well on FOSCTTM yet predict poorly; measuring
    # exactly that is the harness's purpose, not a defect to assert away.
    assert np.isfinite(pe["MSE"])
    for k in ["Pearson_corr", "Spearman_corr", "Pearson_samples",
              "Spearman_samples"]:
        assert np.isfinite(pe[k])
    assert result["pred"]["Y_pred"].shape == result["pred"]["Y_true"].shape
    assert result["log"]["match"] is not None


def test_modality_vae_roundtrip():
    """Per-modality VAE preprocessing (reference perturbot.preprocess.vae,
    absent upstream): encode compresses to latent_dim, decode returns to
    data scale, and the reconstruction beats predicting the mean."""
    from otfusion_tpu.eval.preprocess import (
        decode,
        encode,
        encode_dict,
        train_modality_vae,
    )

    data = synthetic_screen(n_labels=4, n=16, d=6)
    x_dict = data["Xs_dict"]
    model, log = train_modality_vae(x_dict, latent_dim=3, steps=400,
                                    seed=0)
    assert np.isfinite(log["final_loss"])
    lat = encode_dict(model, x_dict)
    assert set(lat) == set(x_dict)
    assert all(v.shape == (16, 3) for v in lat.values())
    x0 = np.asarray(x_dict[0])
    rec = decode(model, encode(model, x0))
    mse_rec = float(np.mean((rec - x0) ** 2))
    mse_mean = float(np.mean((x0 - x0.mean(0)) ** 2))
    assert mse_rec < 0.8 * mse_mean, (mse_rec, mse_mean)


def test_run_loo_latent_vae_then_ot():
    """VAE-then-OT LOO (reference run_models_vae_then_ot, loo.py:188-283):
    couplings solved between per-fold VAE latents, prediction decoded
    from the OT-mapped latent, baselines ride along."""
    from otfusion_tpu.eval.harness import run_loo_latent
    from otfusion_tpu.eval.preprocess import SCVI_LATENT_KEY

    data = synthetic_screen(n_labels=4, n=12, d=5, dp=4)
    rows, log = run_loo_latent(data, "ECOOT", 1e-2, latent_dim=3,
                               vae_steps=300)
    # one row per (held-out label) x (ot_latent + 3 baselines)
    assert len(rows) == 4 * 4
    assert {r["loo_test_idx"] for r in rows} == {0, 1, 2, 3}
    assert len(log["ot_couplings"]) == 4
    assert len(log[SCVI_LATENT_KEY]) == 4
    lat_x, lat_y = log[SCVI_LATENT_KEY][0]
    assert all(v.shape[1] == 3 for v in lat_x.values())
    for r in rows:
        for k, v in r.items():
            if isinstance(v, float):
                assert np.isfinite(v) or np.isnan(v)


def test_run_loo_latent_rejects_vae_methods():
    from otfusion_tpu.eval.harness import run_loo_latent

    data = synthetic_screen(n_labels=3, n=8)
    with pytest.raises(ValueError, match="shared-latent"):
        run_loo_latent(data, "VAE", (1.0, 8, 1e-4))


def test_cli_loo_latent_vae(tmp_path):
    import pickle

    from otfusion_tpu.cli.perturbot_eval import main

    data = synthetic_screen(n_labels=3, n=8, d=5, dp=4, seed=5)
    path = tmp_path / "screen.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    rc = main(["--out-dir", str(tmp_path), "--quiet",
               "loo", "ECOOT", str(path), "0.01",
               "--latent-vae", "--latent-dim", "3"])
    assert rc == 0
    with open(tmp_path / "loo_vae_ECOOT.0.01.pkl", "rb") as f:
        result = pickle.load(f)
    assert len(result["evals"]) == 3 * 4
    assert "X_scVI" in result["log"]
