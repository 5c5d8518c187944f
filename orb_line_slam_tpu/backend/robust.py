"""Robust kernels and chi2 thresholds shared by all optimizers.

Mirrors the reference's use of g2o RobustKernelHuber with deltas
sqrt(5.991) (2-DoF mono) and sqrt(7.815) (3-DoF stereo), and the chi2
outlier gates of Optimizer::PoseOptimization / LocalBundleAdjustment
(SURVEY.md §2.1 row 13).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991    # 95% quantile, 2 DoF
CHI2_STEREO = 7.815  # 95% quantile, 3 DoF


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel as a function of squared error.

    w(e) = 1 for e^2 <= delta^2, else delta/|e| — multiplying the
    information matrix by w reproduces g2o's robustified Gauss-Newton.
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, 1.0, delta / e)
