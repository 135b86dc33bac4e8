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
            rows.append((rec["index"], rec["beta"], d["solution"][0],
                         d["solution"][-1]))
    rows.sort()
    return np.array([(b, c, z3) for _, b, c, z3 in rows])


def main():
    fold = load("arclength_fold")
    disc = load("arclength_branches")
    fast = load("arclength_fastbranch_up")   # guarded walk over the fold
    bstar = fold[-1, 0]
    bfold = fast[:, 0].max()

    fig, (ax, ax2) = plt.subplots(
        2, 1, figsize=(8.4, 7.6), dpi=160, sharex=True,
        gridspec_kw={"height_ratios": [3, 2]})
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    ax2.set_facecolor(SURFACE)

    # grazing boundary: reference line, recessive
    ax.axvline(bstar, color=GRID, lw=1.2, zorder=1)
    ax.annotate(f"grazing boundary\nβ* ≈ {bstar:.4f}",
                xy=(bstar, 0.475), xytext=(bstar - 3.4, 0.46),
                color=TEXT2, fontsize=9,
                arrowprops=dict(arrowstyle="-", color=TEXT2, lw=0.8))

    # fold rounding: smooth fold of the fast family at beta ~ 20.30
    ax.axvline(bfold, color=GRID, lw=1.2, zorder=1)
    ax.annotate(f"smooth fold\nβ ≈ {bfold:.3f}",
                xy=(bfold, 0.56), xytext=(bfold - 3.0, 0.545),
                color=TEXT2, fontsize=9,
                arrowprops=dict(arrowstyle="-", color=TEXT2, lw=0.8))

    # discovery walk: path order matters (it jumps), so draw as a path
    ax.plot(disc[:, 0], disc[:, 1], color=S2, lw=2, zorder=2,
            solid_capstyle="round")
    ax.plot(disc[::6, 0], disc[::6, 1], "o", color=S2, ms=4, zorder=3,
            markeredgecolor=SURFACE, markeredgewidth=1)
    # guarded walks: slow family to its grazing end + fast family over its
    # fold (both sheets) — same categorical slot, they are the same method
    ax.plot(fold[:, 0], fold[:, 1], color=S1, lw=2, zorder=4)
    ax.plot(fold[::4, 0], fold[::4, 1], "o", color=S1, ms=4, zorder=5,
            markeredgecolor=SURFACE, markeredgewidth=1)
    ax.plot(fast[:, 0], fast[:, 1], color=S1, lw=2, zorder=4)
    ax.plot(fast[::6, 0], fast[::6, 1], "o", color=S1, ms=4, zorder=5,
            markeredgecolor=SURFACE, markeredgewidth=1)

    # direct labels (text in ink, mark carries identity)
    ax.annotate("slow family (guarded walker)", xy=(11.6, 0.352),
                color=TEXT2, fontsize=9)
    ax.annotate("fast family (discovery walker,\nafter the basin jump)",
                xy=(6.4, 0.475), color=TEXT2, fontsize=9)
    ax.annotate("fold return sheet\n(guarded walker, resumed)",
                xy=(9.0, 0.415), color=TEXT2, fontsize=9)
    ax.annotate("jump", xy=(15.55, 0.43), color=TEXT2, fontsize=8.5,
                rotation=90)

    # second panel: trailing spike offset separates the fold's two sheets
    # (they overlap in the c projection)
    for arr, col in ((disc, S2), (fold, S1), (fast, S1)):
        ax2.plot(arr[:, 0], arr[:, 2], color=col, lw=2, zorder=3)
    ax2.axvline(bstar, color=GRID, lw=1.2, zorder=1)
    ax2.axvline(bfold, color=GRID, lw=1.2, zorder=1)
    ax2.annotate("upper sheet", xy=(17.0, 9.2), color=TEXT2, fontsize=9)
    ax2.annotate("return sheet", xy=(7.6, 13.3), color=TEXT2, fontsize=9)
    ax2.annotate("slow family", xy=(13.2, 2.6), color=TEXT2, fontsize=9)
    ax2.set_ylabel("z₃  (trailing spike offset)", color=TEXT, fontsize=10)
    ax2.tick_params(colors=TEXT2, labelsize=9)
    for sp in ("top", "right"):
        ax2.spines[sp].set_visible(False)
    for sp in ("left", "bottom"):
        ax2.spines[sp].set_color(GRID)
    ax2.grid(color=GRID, lw=0.6, alpha=0.8)
    ax2.set_axisbelow(True)

    ax2.set_xlabel("β  (mean synaptic rate)", color=TEXT, fontsize=10)
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
