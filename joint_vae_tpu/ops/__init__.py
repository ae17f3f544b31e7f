"""Pure math primitives: losses, priors, sampling, sigma, scores, ROC.

Everything here is a jittable pure function on arrays/pytrees — no Python-side
state, no host sync.  These are the TPU-native equivalents of the reference's
``module/losses.py``, ``module/priors.py``, ``module/vae_layers/layers.py``
(Sampling/Sigma) and ``utils/roc_curves.py``.
"""

from .losses import mse_loss, categorical_loss, x_loss  # noqa: F401
from .priors import PriorConfig, init_prior_params, prior_kl, prior_log_density  # noqa: F401
from .roc import roc_curve, fpr_at_tpr, tpr_at_fpr, auroc_one_sided_exact  # noqa: F401
from .sampling import reparameterize  # noqa: F401
from .scores import batch_dist_measures, predict_after_evaluate  # noqa: F401
from .sigma import SigmaConfig, SigmaState  # noqa: F401
