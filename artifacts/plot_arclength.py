"""Render the pseudo-arclength diagram from the round-2 walker checkpoints.

Produces artifacts/arclength_diagram.png: the two walkers in (beta, c)
state-parameter space — the guarded walker pinning the slow family's
grazing-type end, and the discovery walker tunnelling across it onto the
fast family and mapping it down to beta = 4.495.  Two fixed categorical
series (guarded = blue, discovery = orange, same slots as
branch_diagram.png); the grazing boundary is an annotated reference line,
not a series.
"""

import json
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
S1 = "#2a78d6"   # slot 1: guarded walker (arclength_fold)
S2 = "#eb6834"   # slot 2: discovery walker (arclength_branches)


def load(sweep):
    rows = []
    with open(HERE / sweep / "steps.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            d = np.load(HERE / sweep / f"step_{rec['index']:05d}.npz")
            rows.append((rec["index"], rec["beta"], d["solution"][0]))
    rows.sort()
    return np.array([(b, c) for _, b, c in rows])


def main():
    fold = load("arclength_fold")
    disc = load("arclength_branches")
    bstar = fold[-1, 0]

    fig, ax = plt.subplots(figsize=(8.4, 5.0), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    # grazing boundary: reference line, recessive
    ax.axvline(bstar, color=GRID, lw=1.2, zorder=1)
    ax.annotate(f"grazing boundary\nβ* ≈ {bstar:.4f}",
                xy=(bstar, 0.475), xytext=(bstar - 3.4, 0.46),
                color=TEXT2, fontsize=9,
                arrowprops=dict(arrowstyle="-", color=TEXT2, lw=0.8))

    # discovery walk: path order matters (it jumps), so draw as a path
    ax.plot(disc[:, 0], disc[:, 1], color=S2, lw=2, zorder=2,
            solid_capstyle="round")
    ax.plot(disc[::6, 0], disc[::6, 1], "o", color=S2, ms=4, zorder=3,
            markeredgecolor=SURFACE, markeredgewidth=1)
    # guarded walk
    ax.plot(fold[:, 0], fold[:, 1], color=S1, lw=2, zorder=4)
    ax.plot(fold[::4, 0], fold[::4, 1], "o", color=S1, ms=4, zorder=5,
            markeredgecolor=SURFACE, markeredgewidth=1)

    # direct labels (text in ink, mark carries identity)
    ax.annotate("slow family (guarded walker)", xy=(11.6, 0.352),
                color=TEXT2, fontsize=9)
    ax.annotate("fast family (discovery walker,\nafter the basin jump)",
                xy=(7.2, 0.50), color=TEXT2, fontsize=9)
    ax.annotate("jump", xy=(15.55, 0.43), color=TEXT2, fontsize=8.5,
                rotation=90)

    ax.set_xlabel("β  (mean synaptic rate)", color=TEXT, fontsize=10)
    ax.set_ylabel("c  (wave speed)", color=TEXT, fontsize=10)
    ax.set_title("Pseudo-arclength continuation: two 3-spike wave families "
                 "(N=512, σ=0, fp64)", color=TEXT, fontsize=11, pad=12)
    ax.tick_params(colors=TEXT2, labelsize=9)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.grid(color=GRID, lw=0.6, alpha=0.8)
    ax.set_axisbelow(True)

    handles = [plt.Line2D([], [], color=S1, lw=2, label="guarded walker"),
               plt.Line2D([], [], color=S2, lw=2, label="discovery walker "
                                                        "(--allow-branch-jump)")]
    ax.legend(handles=handles, loc="lower right", frameon=False,
              fontsize=9, labelcolor=TEXT2)

    out = HERE / "arclength_diagram.png"
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
