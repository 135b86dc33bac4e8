"""Render the two-parameter bifurcation set of the slow/fast wave families.

Combines artifacts/existence_boundary/boundary.npz (the slow family's
grazing existence boundary beta*(sigma), traced by --track-boundary) and
artifacts/fold_curve/fold.npz (the fast family's smooth fold beta_fold(sigma),
continued by --track-fold) into one (beta, sigma) plane figure, with the
round-2 one-parameter reference points overlaid.

Colors: boundary curves follow their family (slow = slot 1 blue, fast =
slot 2 orange — same assignment as every other diagram in artifacts/);
reference points are neutral open markers.
"""

import pathlib

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = pathlib.Path(__file__).resolve().parent

SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e2dd"
S1 = "#2a78d6"   # slow family
S2 = "#eb6834"   # fast family


def main():
    fig, ax = plt.subplots(figsize=(7.6, 5.2), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    b = np.load(HERE / "existence_boundary" / "boundary.npz")
    order = np.argsort(b["sigma"])
    ax.plot(b["beta_star"][order], b["sigma"][order], "o-", color=S1,
            lw=1.8, ms=4, mew=0, label="slow family: grazing boundary "
            r"$\beta^*(\sigma)$")
    # the wave exists to the LEFT of the grazing curve (down to the lower
    # branch end near beta ~ 2.3, far off this crop)
    ax.fill_betweenx(b["sigma"][order], 12.6, b["beta_star"][order],
                     color=S1, alpha=0.06, lw=0)
    ax.set_xlim(12.6, 20.8)

    fold_file = HERE / "fold_curve" / "fold.npz"
    if fold_file.exists():
        f = np.load(fold_file)
        order = np.argsort(f["sigma"])
        ax.plot(f["beta"][order], f["sigma"][order], "s-", color=S2,
                lw=1.8, ms=4, mew=0, label="fast family: smooth fold "
                r"$\beta_{fold}(\sigma)$")

    # round-2 one-parameter reference points (independent walks)
    refs = [(16.0144, 0.0, "arclength walk"), (13.0589, 1.7049,
                                               "sigma walk")]
    for beta, sigma, name in refs:
        ax.plot(beta, sigma, "o", mfc="none", mec=TEXT2, ms=8, mew=1.3,
                zorder=5)
        ax.annotate(name, (beta, sigma), xytext=(7, 5),
                    textcoords="offset points", fontsize=7.5, color=TEXT2)

    ax.grid(True, color=GRID, lw=0.7, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT2, labelsize=8.5)
    ax.set_xlabel(r"synaptic rate  $\beta$", color=TEXT, fontsize=10)
    ax.set_ylabel(r"heterogeneity  $\sigma$", color=TEXT, fontsize=10)
    ax.set_ylim(bottom=-0.05)
    ax.legend(loc="center right", frameon=False, fontsize=9, labelcolor=TEXT)
    ax.set_title("Bifurcation set in the $(\\beta, \\sigma)$ plane\n"
                 "(--track-boundary / --track-fold, N=512 fp64)",
                 color=TEXT, fontsize=10.5, loc="left")
    fig.savefig(HERE / "bifurcation_set.png", bbox_inches="tight",
                facecolor=SURFACE)
    print("wrote", HERE / "bifurcation_set.png")


if __name__ == "__main__":
    main()
