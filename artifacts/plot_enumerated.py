"""Render the automatic branch-enumeration diagram.

Produces artifacts/enumerated_diagram.png from
artifacts/enumerated_branches/branch_*.npz (written by the CLI's
``--enumerate-branches`` mode): every wave family the worklist enumerator
found, drawn in (beta, c) with the trailing-spike panel that separates the
fast family's fold sheets.

Color follows the *family*, not the walk: slow = categorical slot 1
(blue), fast = slot 2 (orange) — the same assignment as
branch_diagram.png / arclength_diagram.png, so the three figures read as
one system.  Walks within a family differ by marker, and the three
branch-end mechanisms (grazing boundary, smooth fold, accumulation point)
are annotated reference lines, not series.
"""

import glob
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
S1 = "#2a78d6"   # slot 1: slow wave family
S2 = "#eb6834"   # slot 2: fast wave family
MARKERS = ["o", "s", "^", "D", "v", "P"]


def main():
    runs = []
    for f in sorted(glob.glob(str(HERE / "enumerated_branches"
                                  / "branch_*.npz"))):
        d = np.load(f, allow_pickle=True)
        runs.append((str(d["origin"]), d["points"]))
    if not runs:
        raise SystemExit("no branch_*.npz found — run the CLI with "
                         "--enumerate-branches first")

    fig, (ax, ax2) = plt.subplots(
        2, 1, figsize=(8.4, 7.6), dpi=160, sharex=True,
        gridspec_kw={"height_ratios": [2.0, 1.0], "hspace": 0.08})
    fig.patch.set_facecolor(SURFACE)

    seen_family = set()
    for k, (origin, pts) in enumerate(runs):
        beta, c, z3 = pts[:, -1], pts[:, 0], pts[:, -2]
        fast = bool(np.mean(z3) > 5.0)       # families separate in z3
        color = S2 if fast else S1
        fam = "fast" if fast else "slow"
        label = f"{fam} family" if fam not in seen_family else None
        seen_family.add(fam)
        for a, y in ((ax, c), (ax2, z3)):
            a.plot(beta, y, color=color, lw=1.6, alpha=0.85, zorder=3)
            a.plot(beta, y, MARKERS[k % len(MARKERS)], color=color, ms=2.6,
                   mew=0, alpha=0.8, zorder=4,
                   label=label if a is ax else None)
        label = None

    # the (unrecorded) seed the whole enumeration grew from
    seed = (13.0589, 0.32624, 1.36899)
    ax.plot(seed[0], seed[1], "o", mfc="none", mec=TEXT2, ms=7, mew=1.2,
            zorder=5)
    ax.annotate("seed", (seed[0], seed[1]), xytext=(0, 9),
                textcoords="offset points", ha="center", fontsize=7.5,
                color=TEXT2)
    ax2.plot(seed[0], seed[2], "o", mfc="none", mec=TEXT2, ms=7, mew=1.2,
             zorder=5)

    # branch-end mechanisms as annotated reference lines (not series)
    ends = [(16.0144, "grazing\nboundary"), (20.3245, "smooth\nfold"),
            (4.4949, "accumulation\npoint")]
    for b, name in ends:
        for a in (ax, ax2):
            a.axvline(b, color=TEXT2, lw=0.8, ls=(0, (4, 3)), zorder=2)
        ax.annotate(name, (b, ax.get_ylim()[1]), xytext=(4, -4),
                    textcoords="offset points", ha="left", va="top",
                    fontsize=7.5, color=TEXT2)

    for a in (ax, ax2):
        a.set_facecolor(SURFACE)
        a.grid(True, color=GRID, lw=0.7, zorder=0)
        for s in ("top", "right"):
            a.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            a.spines[s].set_color(GRID)
        a.tick_params(colors=TEXT2, labelsize=8.5)
    ax.set_ylabel("wave speed  c", color=TEXT, fontsize=10)
    ax2.set_ylabel("trailing spike offset  $z_3$", color=TEXT, fontsize=10)
    ax2.set_xlabel(r"synaptic rate  $\beta$", color=TEXT, fontsize=10)
    ax.legend(loc="center right", frameon=False, fontsize=9,
              labelcolor=TEXT)
    ax.set_title("Automatic branch enumeration: every wave family from one "
                 "seed\n(--enumerate-branches, N=512 fp64, exact bordered "
                 "Jacobians)", color=TEXT, fontsize=10.5, loc="left")
    fig.savefig(HERE / "enumerated_diagram.png", bbox_inches="tight",
                facecolor=SURFACE)
    print("wrote", HERE / "enumerated_diagram.png")


if __name__ == "__main__":
    main()
