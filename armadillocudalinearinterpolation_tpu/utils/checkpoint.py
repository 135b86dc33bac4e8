"""Continuation checkpoint/resume.

The reference carries continuation state ``(beta, solution)`` only in local
variables of ``main`` (``/root/reference/Driver.cu:107-109``) — a crash loses
the sweep.  Here each continuation step persists a small JSON+npz record so a
100-point sweep (BASELINE.md config 5) resumes from the last completed step.
"""

from __future__ import annotations

import json
import pathlib
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class ContinuationStep:
    """One completed continuation step."""

    index: int
    beta: float
    solution: np.ndarray
    residual_norm: float
    converged: bool
    n_unstable: Optional[int] = None
    eigenvalues: Optional[np.ndarray] = None


class ContinuationCheckpoint:
    """Append-only checkpoint for a parameter sweep."""

    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self._index_file = self.path / "steps.jsonl"

    def save(self, step: ContinuationStep) -> None:
        rec = {
            "index": step.index,
            "beta": step.beta,
            "residual_norm": step.residual_norm,
            "converged": step.converged,
            "n_unstable": step.n_unstable,
        }
        np.savez(self.path / f"step_{step.index:05d}.npz",
                 solution=step.solution,
                 eigenvalues=(step.eigenvalues
                              if step.eigenvalues is not None else np.array([])))
        # Crash-safe O(1) append: write + flush + fsync per record; a kill
        # mid-write can leave at most one truncated LAST line, which
        # load_all skips (a crash between steps loses nothing).
        import os
        with open(self._index_file, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def load_all(self) -> list[ContinuationStep]:
        if not self._index_file.exists():
            return []
        by_index: dict[int, dict] = {}
        lines = self._index_file.read_text().splitlines()
        for lineno, line in enumerate(lines):
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError as e:
                if lineno == len(lines) - 1:
                    # truncated tail from a crash mid-append: the step it
                    # described was not completed durably — resume redoes it
                    import warnings
                    warnings.warn(
                        f"skipping truncated final line of "
                        f"{self._index_file} (crash mid-append)")
                    continue
                raise ValueError(
                    f"corrupt checkpoint index {self._index_file} at line "
                    f"{lineno + 1}: {e}") from e
            # Re-running a sweep into the same directory appends a fresh
            # record per index; the latest write wins (its .npz is the
            # one on disk).
            by_index[int(rec["index"])] = rec
        steps = []
        for index in sorted(by_index):
            rec = by_index[index]
            data = np.load(self.path / f"step_{index:05d}.npz")
            ev = data["eigenvalues"]
            steps.append(ContinuationStep(
                index=index, beta=rec["beta"],
                solution=data["solution"],
                residual_norm=rec["residual_norm"],
                converged=rec["converged"],
                n_unstable=rec.get("n_unstable"),
                eigenvalues=ev if ev.size else None))
        return steps

    def last(self) -> Optional[ContinuationStep]:
        steps = self.load_all()
        return steps[-1] if steps else None
