"""Flight recording + checkpoint/resume.

The reference captures experiments with ``rosbag record`` driven by
``bag_record.py`` (topic list in ``bfctrl_config.yaml:71-87``) and carries
two pieces of live state across solves (warm start ``mNlpW0``, shifted
reference path — ``HighLvlMpc.cpp:129``, ``AvoidanceStateMachine.cpp:46-53``).
Here:

- :class:`FlightRecorder` accumulates per-tick diagnostic pytrees (host side)
  and writes a compressed ``.npz`` "bag" plus a JSON manifest with config
  provenance (the ``description.yaml`` analogue,
  ``tools/mpc_obstacle_casadi.py:266-288``),
- :func:`save_checkpoint` / :func:`load_checkpoint` persist any pytree of
  arrays (WorldState, EngineState, RollingMap, ...) with orbax so long
  Monte-Carlo campaigns resume exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any

import jax
import numpy as np


class FlightRecorder:
    """Append-only recorder for per-tick pytrees (host side, outside jit)."""

    def __init__(self, path: str, config: Any = None):
        self.path = path
        self._rows: list[Any] = []
        self._config = config

    def record(self, diag: Any) -> None:
        self._rows.append(jax.tree.map(np.asarray, diag))

    def __len__(self) -> int:
        return len(self._rows)

    def save(self) -> str:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *self._rows)
        flat, treedef = jax.tree.flatten(stacked)
        arrays = {f"leaf_{i}": a for i, a in enumerate(flat)}
        np.savez_compressed(self.path, **arrays)
        manifest = {
            "created": time.strftime("%Y-%m-%d %H:%M:%S"),
            "ticks": len(self._rows),
            "treedef": str(treedef),
            "config": _config_to_dict(self._config),
        }
        with open(self.path + ".manifest.json", "w") as f:
            json.dump(manifest, f, indent=2, default=str)
        return self.path

    @staticmethod
    def load(path: str) -> list[np.ndarray]:
        """Load the recorded leaves (ordered as flattened)."""
        with np.load(path) as z:
            return [z[f"leaf_{i}"] for i in range(len(z.files))]


def _config_to_dict(cfg: Any):
    if cfg is None:
        return None
    if dataclasses.is_dataclass(cfg):
        return dataclasses.asdict(cfg)
    return str(cfg)


def save_checkpoint(path: str, state: Any) -> None:
    """Persist a pytree of arrays with orbax (atomic, versioned)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`; ``like`` provides
    structure/dtypes (e.g. a freshly initialized state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray, like)
    restored = ckptr.restore(path, target)
    return jax.tree.map(lambda l, r: jax.numpy.asarray(r, dtype=np.asarray(l).dtype), like, restored)
