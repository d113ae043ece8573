"""Aggregate the perfect-model-test campaign CSVs into the summary table.

Reads every ``perfect_model_test_results_*.csv`` under the given campaign
directories (written by ``experiments/perfect_model_tests.py``; column
contract from the reference's PerfectModelTest at
/root/reference/ensembles/utils.py:192,209-224) and reports, per
(scenario, weighter), whether the barycentre beats the pooled
multi-model-mean baseline on mean NLL / RMSE / W2 over the leave-one-out
folds — the reference's headline scientific validation.

Usage: python benchmarks/pmt_summary.py [campaign_dir ...]
       (default: experiments/pmt_campaign experiments/pmt_campaign_compatfp)
"""

import glob
import math
import os
import re
import sys

import numpy as np
import pandas as pd


def sign_test_p(wins: int, n: int) -> float:
    """Exact two-sided binomial sign-test p-value (H0: win prob = 0.5).

    Minlike definition: sum the probabilities of all outcomes no more
    likely than the observed one.  Ties must be excluded by the caller
    (standard paired sign test).  Pure stdlib — no scipy dependency."""
    if n == 0:
        return float("nan")
    probs = [math.comb(n, k) * 0.5**n for k in range(n + 1)]
    observed = probs[wins]
    return float(min(1.0, sum(p for p in probs if p <= observed * (1 + 1e-12))))


def summarise(campaign_dir: str) -> pd.DataFrame:
    rows = []
    for path in sorted(
        glob.glob(os.path.join(campaign_dir, "*", "csvs", "*.csv"))
    ):
        m = re.match(
            r"perfect_model_test_results_(.+)_(ssp\d+)\.csv",
            os.path.basename(path),
        )
        if not m:
            continue
        wname, ssp = m.groups()
        df = pd.read_csv(path)
        # include-sim runs suffix the FILE name with _plus_sim but keep the
        # plain weighter name in the metric columns (validation.py).
        col_name = wname.removesuffix("_plus_sim")
        # CRPS is a round-3 addition; campaigns written before it lack the
        # columns, so include it only when present.
        metric_names = ("nll", "rmse", "w2") + (
            ("crps",) if f"crps_bary_{col_name}" in df.columns else ()
        )
        bary_cols = {
            metric: f"{metric}_bary_{col_name}" for metric in metric_names
        }
        row = {"ssp": ssp, "weighter": wname, "n_folds": len(df)}
        for metric, col in bary_cols.items():
            b = df[col].mean()
            mm = df[f"{metric}_mmm"].mean()
            row[f"{metric}_bary"] = b
            row[f"{metric}_mmm"] = mm
            row[f"{metric}_bary_wins"] = bool(b < mm)
            # Paired per-fold comparison: the fold (one pseudo-truth model)
            # is the exchangeable unit, so the sign test runs on fold wins,
            # not on the fold-MEAN comparison above (which one outlier fold
            # can decide — the ssp434/460 MMM-NLL blowups in BASELINE.md).
            diffs = df[col].values - df[f"{metric}_mmm"].values
            fw = int(np.sum(diffs < 0))
            fn = int(np.sum(diffs != 0))
            row[f"{metric}_fold_wins"] = f"{fw}/{fn}"
            row[f"_{metric}_fw"] = fw
            row[f"_{metric}_fn"] = fn
        rows.append(row)
    return pd.DataFrame(rows)


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = sys.argv[1:] or [
        os.path.join(here, "experiments", "pmt_campaign"),
        os.path.join(here, "experiments", "pmt_campaign_compatfp"),
    ]
    for d in dirs:
        if not os.path.isdir(d):
            print(f"{d}: missing, skipped")
            continue
        df = summarise(d)
        if df.empty:
            print(f"{d}: no CSVs")
            continue
        print(f"\n== {os.path.basename(d)} ({df['ssp'].nunique()} SSPs x "
              f"{df['weighter'].nunique()} weighters) ==")
        shown = df[[c for c in df.columns if not c.startswith("_")]]
        with pd.option_context("display.width", 250, "display.precision", 3):
            print(shown.to_string(index=False))
        for metric in ("w2", "rmse", "nll", "crps"):
            col = f"{metric}_bary_wins"
            if col not in df.columns or df[col].isna().all():
                continue
            wins = int(df[col].fillna(False).sum())
            n = int(df[col].notna().sum())
            # Pooled fold-level paired sign test.  Caveat stated in the
            # output: folds are shared across the weighter cells of one
            # scenario (same leave-one-out splits), so the pooled count
            # overstates independence ACROSS weighters; the per-weighter
            # pools below are the defensible units.
            fw = int(df[f"_{metric}_fw"].sum())
            fn = int(df[f"_{metric}_fn"].sum())
            print(
                f"barycentre beats MMM on {metric.upper()}: {wins}/{n} cells; "
                f"folds {fw}/{fn} (pooled sign test p={sign_test_p(fw, fn):.2g}; "
                f"folds shared across weighters)"
            )
            for wname, sub in df.groupby("weighter"):
                fw_w = int(sub[f"_{metric}_fw"].sum())
                fn_w = int(sub[f"_{metric}_fn"].sum())
                print(
                    f"  {wname}: folds {fw_w}/{fn_w} "
                    f"(sign test p={sign_test_p(fw_w, fn_w):.2g})"
                )


if __name__ == "__main__":
    main()
