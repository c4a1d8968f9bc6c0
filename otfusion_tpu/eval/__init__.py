"""TPU-native rebuild of the reference's Perturb-OT evaluation harness.

The reference vendors ``perturbot/perturbot/eval/`` (cv.py,
cv_inner_loop.py, cv_outer_loop.py, loo.py, all.py, feature_matching.py,
match.py, prediction.py, utils.py — SURVEY.md §2.8): a 5-fold
cross-validation + leave-one-out battery that scores every OT coupling
method on (a) matching quality (FOSCTTM, label-confusion diagonal
fractions) and (b) downstream cross-modal prediction (coupling-weighted
regression / MLP), sweeping the entropic-regularisation hyperparameter.

As committed upstream it is **not runnable**: it imports a
``perturbot.predict`` package (linear_regression, mlp, scvi_vae) and
``perturbot.preprocess.vae`` that do not exist in the repository, and its
launchers write LSF ``bsub`` scripts with hardcoded GPFS paths
(eval/cv.py:125-146). This package rebuilds the harness natively:

* the OT-method registry maps onto the device solvers in
  :mod:`otfusion_tpu.ops.api` (one jitted/vmapped XLA program per solve
  instead of a ``multiprocessing.Pool`` of CPU solves);
* the missing predictors are reconstructed from their call sites
  (:mod:`otfusion_tpu.eval.predictors` — coupling-weighted OLS in closed
  form on device, Flax MLP on barycentric-projected targets);
* the VAE matching family ("VAE"/"VAE_label"), whose scvi-tools
  implementation is also missing upstream, is reconstructed natively as
  an adversarially-aligned shared-latent Flax VAE
  (:mod:`otfusion_tpu.eval.vae`);
* the LSF submitter is replaced by an in-process grid runner
  (:func:`otfusion_tpu.eval.harness.run_grid` and the
  ``otfusion-perturbot-eval`` CLI).
"""

from otfusion_tpu.eval.matching import (
    coupling_confusion_matrix,
    get_FOSCTTM,
    get_diag_fracs,
    get_rel_mse,
)
from otfusion_tpu.eval.prediction import get_evals, get_evals_preds
from otfusion_tpu.eval.predictors import (
    make_G,
    ols_normed,
    predict,
    train_mlp,
    weight_1_ols_normed,
    weight_conc_normed,
    weighted_ols_normed,
)
from otfusion_tpu.eval.vae import (
    VAEMatchModel,
    infer_from_Xs,
    infer_from_Ys,
    predict_from_model,
    train_vae_model,
)
from otfusion_tpu.eval.harness import (
    OT_METHOD_HYPERPARAMS,
    OT_METHOD_MAP,
    run_all,
    run_feature_matching,
    run_grid,
    run_inner_cv,
    run_loo,
    run_outer_cv,
)

__all__ = [
    "coupling_confusion_matrix",
    "get_FOSCTTM",
    "get_diag_fracs",
    "get_rel_mse",
    "get_evals",
    "get_evals_preds",
    "make_G",
    "ols_normed",
    "predict",
    "train_mlp",
    "weight_1_ols_normed",
    "weight_conc_normed",
    "weighted_ols_normed",
    "OT_METHOD_HYPERPARAMS",
    "OT_METHOD_MAP",
    "VAEMatchModel",
    "infer_from_Xs",
    "infer_from_Ys",
    "predict_from_model",
    "train_vae_model",
    "run_all",
    "run_feature_matching",
    "run_grid",
    "run_inner_cv",
    "run_loo",
    "run_outer_cv",
]
