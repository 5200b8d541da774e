"""Plotters for the driver CSV outputs.

Ports of plot_l2_vs_time.py, plot_newton_iterations.py, and
plot_newton_solves_per_step.py — each consumes a driver CSV and writes a
PNG."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_l2_vs_time(error_csv, out_png, log_y=True):
    """L2-error history from any driver error CSV (step,time,...l2...)."""
    plt = _plt()
    data = np.genfromtxt(error_csv, delimiter=",", names=True)
    t = data["time"]
    plt.figure(figsize=(8, 4.5))
    for name in data.dtype.names:
        if "l2" in name.lower():
            plt.plot(t, data[name], lw=2, label=name)
    plt.xlabel("Time (s)")
    plt.ylabel("L2 error")
    if log_y:
        plt.yscale("log")
    plt.grid(True, alpha=0.25)
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_png, dpi=180)
    plt.close()
    return out_png


def plot_newton_iterations(newton_csv, out_png):
    """Per-solve residual trajectories from a Newton history CSV."""
    plt = _plt()
    data = np.genfromtxt(newton_csv, delimiter=",", names=True)
    plt.figure(figsize=(8, 4.5))
    steps = np.unique(data["step"])
    for s in steps[:: max(1, len(steps) // 20)]:
        sel = data["step"] == s
        plt.semilogy(data["iter"][sel], data["residual"][sel], "-o",
                     ms=3, lw=1, alpha=0.6)
    plt.xlabel("Newton iteration")
    plt.ylabel("|R|")
    plt.grid(True, alpha=0.25)
    plt.tight_layout()
    plt.savefig(out_png, dpi=180)
    plt.close()
    return out_png


def plot_newton_solves_per_step(newton_csv, out_png):
    """Newton iteration count per time step."""
    plt = _plt()
    data = np.genfromtxt(newton_csv, delimiter=",", names=True)
    steps = np.unique(data["step"])
    counts = [int(data["iter"][data["step"] == s].max()) + 1 for s in steps]
    times = [float(data["time"][data["step"] == s][0]) for s in steps]
    plt.figure(figsize=(8, 4.5))
    plt.plot(times, counts, "k-", lw=1.5)
    plt.xlabel("Time (s)")
    plt.ylabel("Newton iterations per step")
    plt.grid(True, alpha=0.25)
    plt.tight_layout()
    plt.savefig(out_png, dpi=180)
    plt.close()
    return out_png


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=["l2", "newton_iters", "newton_per_step"])
    ap.add_argument("csv")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    out = args.out or str(Path(args.csv).with_suffix(".png"))
    if args.kind == "l2":
        plot_l2_vs_time(args.csv, out)
    elif args.kind == "newton_iters":
        plot_newton_iterations(args.csv, out)
    else:
        plot_newton_solves_per_step(args.csv, out)
    print(f"Wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
