"""Pure-JAX compute kernels: the TPU-hot layer of the framework."""

from bayesian_ensembling_tpu.ops import dtw_pallas, linalg_pallas, svgp

from bayesian_ensembling_tpu.ops.distributions import DiagGaussian, FullCovGaussian
from bayesian_ensembling_tpu.ops.dtw import (
    dba,
    dtw_pairwise_sq,
    squared_dtw,
    squared_dtw_with_path,
)
from bayesian_ensembling_tpu.ops.gp import (
    GPParams,
    fit_gp,
    fit_gp_batch,
    fit_gp_batch_chunked,
    fit_gp_batch_segment,
    init_params,
    matern32,
    nlml,
    posterior,
    rbf,
)
from bayesian_ensembling_tpu.ops.scoring import (
    batched_imq_ksd,
    diag_log_likelihood,
    fullcov_constant_vector_log_likelihood,
    gaussian_crps,
    imq_ksd_1d,
    mean_gaussian_crps,
)
from bayesian_ensembling_tpu.ops.wasserstein import (
    batched_gaussian_barycentre,
    bures_covariance_distance,
    gaussian_barycentre_1d,
    gaussian_barycentre_1d_fixed_point,
    gaussian_w2_distance,
    gaussian_w2_distance_diag,
    sqrtm_psd,
)

__all__ = [
    "dtw_pallas",
    "linalg_pallas",
    "svgp",
    "DiagGaussian",
    "FullCovGaussian",
    "dba",
    "dtw_pairwise_sq",
    "squared_dtw",
    "squared_dtw_with_path",
    "GPParams",
    "fit_gp",
    "fit_gp_batch",
    "fit_gp_batch_chunked",
    "fit_gp_batch_segment",
    "init_params",
    "matern32",
    "nlml",
    "posterior",
    "rbf",
    "batched_imq_ksd",
    "diag_log_likelihood",
    "fullcov_constant_vector_log_likelihood",
    "gaussian_crps",
    "imq_ksd_1d",
    "mean_gaussian_crps",
    "batched_gaussian_barycentre",
    "bures_covariance_distance",
    "gaussian_barycentre_1d",
    "gaussian_barycentre_1d_fixed_point",
    "gaussian_w2_distance",
    "gaussian_w2_distance_diag",
    "sqrtm_psd",
]
