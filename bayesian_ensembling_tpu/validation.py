"""Perfect-model test harness: leave-one-out validation of the ensembling
framework.

Capability match for ``PerfectModelTest``
(``/root/reference/ensembles/utils.py:32-225``): each model in turn becomes
the "pseudo truth"; the remaining models are emulated, weighted against the
pseudo observations' past, combined with the ensemble scheme over the
forecast period, and scored (NLL / RMSE / W2) against the pseudo truth, with
a pooled multi-model-mean baseline.  Results accumulate into a CSV; weight
bar charts and projection figures are written per test.

TPU-first notes: emulation of the whole leave-one-out collection is batched
(one XLA program per collection, models/gp_dtw.py), and the harness never
pickles — prefit collections round-trip through npz checkpoints
(ModelCollection.save/load replaces utils.py:22-30 + data.py:397-404).
"""

from __future__ import annotations

import copy
import os
import typing as tp

import numpy as np

from bayesian_ensembling_tpu import metrics
from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
from bayesian_ensembling_tpu.schemes import MultiModelMean
from bayesian_ensembling_tpu.weights import ModelSimilarityWeight

__all__ = ["PerfectModelTest", "load_model_collection"]


def load_model_collection(path: str) -> ModelCollection:
    """Load a checkpointed ModelCollection (reference utils.py:22-30, minus
    the pickle format and its stray ``self`` parameter)."""
    return ModelCollection.load(path)


class PerfectModelTest:
    """Leave-one-out ensembling validation."""

    def __init__(
        self,
        hindcast_models: ModelCollection,
        forecast_models: ModelCollection,
        emulate_method: tp.Callable,
        weight_method: tp.Callable,
        ensemble_method: tp.Callable,
        ssp: str,
        include_sim: bool = False,
        save_dir: tp.Optional[str] = None,
        scheme_kwargs: tp.Optional[dict] = None,
    ) -> None:
        if hindcast_models.model_names != forecast_models.model_names:
            raise ValueError("hindcast and forecast collections must match")
        self.hindcast_models = hindcast_models
        self.forecast_models = forecast_models
        self.emulate_method = emulate_method
        self.weight_method = weight_method
        self.ensemble_method = ensemble_method
        self.ssp = ssp
        self.include_sim = include_sim
        self.save_dir = save_dir
        # Extra kwargs for the ensemble scheme call — e.g.
        # {"compat_fixed_point": True} to validate with the reference's
        # sigma-inflating fixed-point barycentre (wasserstein.py:82-97 there).
        self.scheme_kwargs = scheme_kwargs or {}
        if save_dir:
            self.fig_dir = os.path.join(save_dir, "figs")
            self.csv_dir = os.path.join(save_dir, "csvs")
            for d in (
                os.path.join(self.fig_dir, "weights"),
                os.path.join(self.fig_dir, "projs"),
                self.csv_dir,
            ):
                os.makedirs(d, exist_ok=True)

    # ------------------------------------------------------------------ core
    def _run_single_test(
        self,
        hindcast: ModelCollection,
        forecast: ModelCollection,
        pseudo_past: ProcessModel,
        pseudo_future: ProcessModel,
        n_optim_nits: int = 1000,
        use_prefit_models: bool = False,
    ):
        if not use_prefit_models:
            hindcast.fit(self.emulate_method(), n_optim_nits=n_optim_nits)
            forecast.fit(self.emulate_method(), n_optim_nits=n_optim_nits)
            pseudo_future.distribution = self.emulate_method().fit(
                pseudo_future, n_optim_nits=n_optim_nits
            )

        weight_fn = self.weight_method()
        weights = weight_fn(hindcast, pseudo_past)
        mean_weights = weights.mean("time")
        if self.include_sim:
            sim = ModelSimilarityWeight()(hindcast, mode="single")
            total = mean_weights.values * sim.values[:, 0]
            total = total / total.sum()
        else:
            total = mean_weights.values

        if self.save_dir:
            self._plot_weights(forecast, total, weight_fn.name, pseudo_future.name)

        w_fore = np.broadcast_to(
            total[:, None], (len(forecast), len(forecast.time))
        )
        from bayesian_ensembling_tpu.coords import DimArray

        w_da = DimArray(
            np.ascontiguousarray(w_fore),
            ("model", "time"),
            {"time": forecast.time},
        )
        bary = self.ensemble_method()(forecast, w_da, **self.scheme_kwargs)

        obs_vals = pseudo_future.data.values
        nll_b = metrics.nll(bary, obs_vals)
        rmse_b = metrics.rmse(bary, obs_vals)
        w2_b = metrics.w2_between_posteriors(bary, pseudo_future.distribution)

        # Multi-model-mean baseline (utils.py:148-155).
        mmm = MultiModelMean()(forecast)
        nll_m = metrics.nll(mmm, obs_vals)
        rmse_m = metrics.rmse(mmm, obs_vals)
        w2_m = metrics.w2_between_posteriors(mmm, pseudo_future.distribution)

        if self.save_dir:
            self._plot_projection(bary, mmm, pseudo_future, weight_fn.name)

        return nll_b, rmse_b, w2_b, nll_m, rmse_m, w2_m

    def run(self, n_optim_nits: int = 1000, use_prefit_models: bool = False):
        """Leave-one-out over every model; returns a pandas DataFrame and
        (when save_dir is set) writes the CSV (utils.py:184-225)."""
        import pandas as pd

        wname = self.weight_method().name
        rows = []
        n = len(self.hindcast_models)
        for i in range(n):
            hind = [copy.copy(m) for m in self.hindcast_models]
            fore = [copy.copy(m) for m in self.forecast_models]
            pseudo_past = hind.pop(i)
            pseudo_future = fore.pop(i)
            out = self._run_single_test(
                ModelCollection(hind),
                ModelCollection(fore),
                pseudo_past,
                pseudo_future,
                n_optim_nits=n_optim_nits,
                use_prefit_models=use_prefit_models,
            )
            rows.append([pseudo_past.name, *out])

        df = pd.DataFrame(
            rows,
            columns=[
                "model as pseudo obs",
                f"nll_bary_{wname}",
                f"rmse_bary_{wname}",
                f"w2_bary_{wname}",
                "nll_mmm",
                "rmse_mmm",
                "w2_mmm",
            ],
        )
        if self.save_dir:
            suffix = f"{wname}_plus_sim" if self.include_sim else wname
            path = os.path.join(
                self.csv_dir, f"perfect_model_test_results_{suffix}_{self.ssp}.csv"
            )
            df.to_csv(path)
            print(f"Saved results to {path}")
        return df

    # --------------------------------------------------------------- figures
    def _plot_weights(self, forecast, total, wname, pseudo_name):
        import matplotlib.pyplot as plt

        plt.figure()
        plt.bar(forecast.model_names, np.asarray(total))
        plt.ylabel("Weights")
        plt.xticks(rotation="vertical")
        suffix = f"{wname}_plus_sim" if self.include_sim else wname
        path = os.path.join(
            self.fig_dir,
            "weights",
            f"{suffix}_with_{pseudo_name}_as_pseudo_truth_{self.ssp}.png",
        )
        plt.savefig(path, bbox_inches="tight")
        plt.close()

    def _plot_projection(self, bary, mmm, pseudo_future, wname):
        import matplotlib.pyplot as plt

        from bayesian_ensembling_tpu.plotters import cmap, plot_posterior_temporal

        fig, ax = plt.subplots(figsize=(6.5, 4))
        plot_posterior_temporal(bary, ax=ax, color=cmap()[0], label="Barycentre", n_sigma=(2,))
        if pseudo_future.distribution is not None:
            plot_posterior_temporal(
                pseudo_future.distribution, ax=ax, color=cmap()[1],
                label="True model", n_sigma=(2,),
            )
        plot_posterior_temporal(mmm, ax=ax, color=cmap()[2], label="MMM", n_sigma=(2,))
        ax.set_xlabel("Time")
        ax.set_ylabel("Temperature anomaly (degC)\nrelative to 1961-1990")
        ax.legend()
        suffix = f"{wname}_plus_sim" if self.include_sim else wname
        path = os.path.join(
            self.fig_dir,
            "projs",
            f"{pseudo_future.name}_as_pseudo_truth_{suffix}_{self.ssp}.png",
        )
        fig.savefig(path)
        plt.close(fig)
