"""Checkpoint / exact resume.

The reference has no restart workflow (visualization-only output —
SURVEY.md §5.4); the rebuild adds one because the state is a single array
bundle: ``{step, t, dt, u}`` round-trips exactly through one .npz file, so
a killed run resumes bit-identically.
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, u, t: float, dt: float, step: int, meta: dict | None = None):
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            u=np.asarray(u),
            t=np.float64(t),
            dt=np.float64(dt),
            step=np.int64(step),
            meta=json.dumps(meta or {}),
        )
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
    return path


def load_checkpoint(path: str):
    with np.load(path, allow_pickle=False) as z:
        u = jnp.asarray(z["u"])
        t = float(z["t"])
        dt = float(z["dt"])
        step = int(z["step"])
        meta = json.loads(str(z["meta"]))
    return u, t, dt, step, meta


class CheckpointManager:
    """Periodic snapshots with retention, as a Simulator callback."""

    def __init__(self, directory: str, every: int = 10, keep: int = 3, name: str = "ckpt"):
        self.directory = directory
        self.every = every
        self.keep = keep
        self.name = name
        os.makedirs(directory, exist_ok=True)
        # seed retention from checkpoints already on disk, so a resumed run
        # keeps pruning the previous run's files and latest() finds them
        self._written: list[str] = sorted(
            glob.glob(os.path.join(directory, f"{name}_*.npz"))
        )
        self._last_step = (
            int(self._written[-1].rsplit("_", 1)[1].split(".")[0])
            if self._written else 0
        )

    def __call__(self, step: int, t: float, u, record):
        # intermediate records of a jitted multi-step block pair a LATER
        # state with this record's clock — checkpointing them would break
        # exact resume, so only state-consistent records are snapshotted.
        # The cadence is "every `every` steps have elapsed since the last
        # snapshot", NOT step % every == 0: in block mode only block-FINAL
        # steps are consistent and retries shift their step numbers, so a
        # modulus test could miss every consistent record and silently
        # write nothing for the whole run.
        if not getattr(record, "state_consistent", True):
            return
        if step - self._last_step < self.every:
            return
        path = os.path.join(self.directory, f"{self.name}_{step:07d}.npz")
        # saving the controller's NEXT dt (and the failure-memory cap, when
        # active) makes a resumed run continue the uninterrupted trajectory
        # exactly
        dt = record.next_dt or record.dt
        meta = None
        if getattr(record, "dt_cap", None) is not None:
            meta = {"dt_cap": record.dt_cap}
        save_checkpoint(path, u, t, dt, step, meta)
        self._last_step = step
        self._written.append(path)
        while len(self._written) > self.keep:
            old = self._written.pop(0)
            if os.path.exists(old):
                os.remove(old)

    def latest(self) -> str | None:
        return self._written[-1] if self._written else None
