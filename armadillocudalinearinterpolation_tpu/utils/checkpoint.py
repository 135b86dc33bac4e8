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
        with open(self._index_file, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def load_all(self) -> list[ContinuationStep]:
        if not self._index_file.exists():
            return []
        steps = []
        with open(self._index_file) as f:
            for line in f:
                rec = json.loads(line)
                data = np.load(self.path / f"step_{rec['index']:05d}.npz")
                ev = data["eigenvalues"]
                steps.append(ContinuationStep(
                    index=rec["index"], beta=rec["beta"],
                    solution=data["solution"],
                    residual_norm=rec["residual_norm"],
                    converged=rec["converged"],
                    n_unstable=rec.get("n_unstable"),
                    eigenvalues=ev if ev.size else None))
        return steps

    def last(self) -> Optional[ContinuationStep]:
        steps = self.load_all()
        return steps[-1] if steps else None
