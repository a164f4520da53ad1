#!/usr/bin/env python
"""Record the SyntheticFlow convergence curve committed under docs/.

Trains the tests/test_convergence.py multiscale-f32 configuration for 600
steps on the CPU backend, logging loss/EPE every 10 steps, and writes
docs/convergence_synthetic.csv + docs/convergence_synthetic.pdf.

Run from the repo root: python scripts/record_convergence.py
"""

import csv
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from pwcnet_tpu.data import DataLoader, get_dataset  # noqa: E402
from pwcnet_tpu.models import PWCDCNet  # noqa: E402
from pwcnet_tpu.train_lib import (  # noqa: E402
    create_train_state,
    make_train_step,
)

STEPS, LOG_EVERY = 600, 10


def main():
    docs = Path(__file__).parent.parent / "docs"
    dset = get_dataset("Synthetic")(
        train_or_val="train", dataset_dir=".", num_samples=16,
        image_shape=(32, 32), max_disp=2,
    )
    loader = DataLoader(
        dset, batch_size=8, shuffle=True, drop_last=True, seed=1
    )
    model = PWCDCNet(num_levels=3, output_level=1, search_range=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3),
        learning_rate=1e-3, lr_scheduling=False,
    )
    step = make_train_step(model, donate=False)

    rows = []
    s = 0
    while s < STEPS:
        for images, flows in loader:
            state, m = step(state, jnp.asarray(images), jnp.asarray(flows))
            s += 1
            if s % LOG_EVERY == 0:
                rows.append(
                    (s, float(m["loss"]), float(m["epe"]))
                )
                print(f"step {s}: loss {rows[-1][1]:.4f} epe {rows[-1][2]:.4f}")
            if s >= STEPS:
                break

    with open(docs / "convergence_synthetic.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "train_loss", "train_epe_px"])
        w.writerows(rows)

    plot(rows, docs / "convergence_synthetic.pdf")
    print("wrote docs/convergence_synthetic.{csv,pdf}")


def plot(rows, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps = [r[0] for r in rows]
    loss = [r[1] for r in rows]
    epe = [r[2] for r in rows]

    ink, muted, grid = "#1f2430", "#5c6470", "#e3e6ea"
    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(6.0, 4.6), sharex=True, constrained_layout=True
    )
    # two measures of different scale -> two stacked panels, never dual axes
    for ax, ys, color, title in (
        (ax1, loss, "#4063d8", "training loss (multiscale + weight decay)"),
        (ax2, epe, "#8549ba", "training EPE (px)"),
    ):
        ax.plot(steps, ys, color=color, linewidth=2)
        ax.set_title(title, loc="left", fontsize=10, color=ink)
        ax.grid(True, color=grid, linewidth=0.8)
        ax.set_axisbelow(True)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        for spine in ("left", "bottom"):
            ax.spines[spine].set_color(muted)
        ax.tick_params(colors=muted, labelsize=8)
    ax2.axhline(0.5, color=muted, linewidth=1, linestyle="--")
    ax2.annotate(
        "0.5 px test threshold", (steps[0], 0.5), textcoords="offset points",
        xytext=(2, 4), fontsize=8, color=muted,
    )
    ax2.set_xlabel("step", fontsize=9, color=muted)
    fig.suptitle(
        "PWCDCNet on SyntheticFlow — 16 samples, 32x32, b8, lr 1e-3, CPU",
        fontsize=10, color=ink,
    )
    fig.savefig(path)


if __name__ == "__main__":
    main()
