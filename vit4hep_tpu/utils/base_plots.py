"""Training-curve plots (reference `/root/reference/experiments/base_plots.py:16-62`):
loss/validation-loss and learning-rate/metric curves written as PDFs into the
run directory at the end of training."""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def plot_loss(filename, train_loss, val_loss=None, val_every=1, logy=True):
    """Training (and optionally validation) loss curve."""
    fig, ax = plt.subplots(figsize=(6, 4))
    steps = np.arange(1, len(train_loss) + 1)
    ax.plot(steps, train_loss, lw=0.8, label="train", color="#0000cc")
    if val_loss is not None and len(val_loss):
        val_steps = (np.arange(1, len(val_loss) + 1)) * val_every
        ax.plot(val_steps, val_loss, lw=1.2, label="validation", color="#cc0000")
    if logy and np.all(np.asarray(train_loss) > 0):
        ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel("loss")
    ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(filename, dpi=200)
    plt.close(fig)


def plot_metric(filename, values, ylabel, logy=False):
    """Generic per-iteration metric curve (learning rate, grad norm, ...)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.arange(1, len(values) + 1), values, lw=0.8, color="#0000cc")
    if logy and np.all(np.asarray(values) > 0):
        ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    fig.savefig(filename, dpi=200)
    plt.close(fig)
