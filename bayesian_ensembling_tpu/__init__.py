"""Bayesian multi-model ensembling, rebuilt TPU-native on JAX/XLA/Pallas.

Same capability surface as the reference ``bayesian_ensembling`` library
(see SURVEY.md): wrap per-climate-model simulation output, emulate each model
with a probabilistic model (DBA mean + heteroskedastic GP, or mean-field
Gaussian), weight models against observations (log-likelihood, inverse-square,
uniform, inter-model similarity, KSD, CRPS), and combine the posteriors via a
Gaussian Wasserstein-2 barycentre — but with every hot loop expressed as
batched/vmapped XLA programs shardable over a TPU mesh.

Precision policy: explicit, *no* import-time global float64 switch (the
reference flips ``jax_enable_x64`` on import, ``ensembles/__init__.py:8-10``).
TPU paths default to float32; the float64 CPU oracle is opt-in via
``jax.config.update("jax_enable_x64", True)`` in the caller or test harness.
"""

from bayesian_ensembling_tpu import metrics, ops, pipeline
from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.data import ModelCollection, Posterior, ProcessModel
from bayesian_ensembling_tpu.models.gp_3d import GPDTW3D
from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D
from bayesian_ensembling_tpu.models.mean_field import MeanField, MeanFieldApproximation
from bayesian_ensembling_tpu.ops.dtw import dba
from bayesian_ensembling_tpu.validation import (
    PerfectModelTest,
    batched_pmt,
    load_model_collection,
)
from bayesian_ensembling_tpu.schemes import (
    Barycentre,
    MultiModelMean,
    WeightedModelMean,
)
from bayesian_ensembling_tpu.weights import (
    AbstractWeight,
    CRPSWeight,
    InverseSquareWeight,
    KSDWeight,
    LogLikelihoodWeight,
    ModelSimilarityWeight,
    UniformWeight,
)

__version__ = "0.1.0"


def __getattr__(name: str):
    # ``plotters`` pulls in matplotlib; import it lazily so the core library
    # works in plotting-free installs (ADVICE r1: eager import broke a clean
    # ``pip install bayesian_ensembling_tpu``).
    if name in ("plotters", "serve"):
        import importlib

        module = importlib.import_module(f"bayesian_ensembling_tpu.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "ops",
    "metrics",
    "pipeline",
    # NB: "plotters" is deliberately NOT in __all__ — it imports matplotlib
    # lazily via module __getattr__, and `import *` must stay working in a
    # matplotlib-free install.
    "serve",
    "DimArray",
    "GPDTW3D",
    "PerfectModelTest",
    "batched_pmt",
    "load_model_collection",
    "ModelCollection",
    "Posterior",
    "ProcessModel",
    "GPDTW1D",
    "MeanField",
    "MeanFieldApproximation",
    "dba",
    "Barycentre",
    "MultiModelMean",
    "WeightedModelMean",
    "AbstractWeight",
    "CRPSWeight",
    "InverseSquareWeight",
    "KSDWeight",
    "LogLikelihoodWeight",
    "ModelSimilarityWeight",
    "UniformWeight",
    "__version__",
]
