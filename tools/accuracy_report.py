#!/usr/bin/env python
"""Accuracy harness — parity with the reference's distributions.js
(/root/reference/distributions.js:8-29,50-63,113): compare the digest
against the empirical distribution function over several distributions,
reporting avg relative RMSE and max error across a percentile grid,
averaged over multiple seeded runs.

Usage: python tools/accuracy_report.py [n_samples] [n_runs]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tdigest_spark.sketch.tdigest import TDigest  # noqa: E402


def gen(name: str, rng: np.random.Generator, n: int) -> np.ndarray:
    # distribution set mirrors distributions.js:65-111
    if name == "uniform":
        return rng.random(n)
    if name == "gaussian":
        return rng.normal(0, 1, n)
    if name == "chisq":
        return rng.chisquare(3, n)
    if name == "exponential":
        return rng.exponential(1.0, n)
    if name == "brownian":
        return np.cumsum(rng.normal(0, 1, n))
    raise ValueError(name)


def compare_edf(digest: TDigest, sorted_vals: np.ndarray, n_pct: int = 100):
    # reference compare(): relative error of quantiles vs EDF over a
    # percentile grid (distributions.js:31-48)
    n = len(sorted_vals)
    ps = (np.arange(n_pct) + 0.5) / n_pct
    est = np.atleast_1d(digest.quantile(ps))
    exact = sorted_vals[np.minimum((ps * n).astype(int), n - 1)]
    scale = sorted_vals[-1] - sorted_vals[0]
    err = np.abs(est - exact) / max(scale, 1e-12)
    return float(np.sqrt((err**2).mean())), float(err.max())


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print(f"digest vs EDF, {runs} runs x {n} samples, delta=0.01 "
          f"(values relative to data range)")
    print(f"{'distribution':<12} {'avg RMSE':>10} {'avg maxerr':>11} "
          f"{'centroids':>10}")
    for name in ["uniform", "gaussian", "chisq", "exponential", "brownian"]:
        rmses, maxes, sizes = [], [], []
        for run in range(runs):
            rng = np.random.default_rng(1000 + run)
            vals = gen(name, rng, n)
            d = TDigest(0.01).push(vals)
            r, m = compare_edf(d, np.sort(vals))
            rmses.append(r)
            maxes.append(m)
            sizes.append(d.size)
        print(
            f"{name:<12} {np.mean(rmses):>10.2e} {np.mean(maxes):>11.2e} "
            f"{np.mean(sizes):>10.0f}"
        )


if __name__ == "__main__":
    main()
