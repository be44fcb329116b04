"""Visualization — the rviz publishers, as matplotlib figures.

The reference publishes the predicted path, associated obstacle markers and
the colorized merged cloud to rviz (``AvoidanceStateMachine.cpp:398-466``,
``FrameKDMap::GetPtCloud``).  Headless equivalents for notebooks/reports:

- :func:`plot_flight`: top-down + altitude view of a trajectory through an
  obstacle field (with clearance-colored track),
- :func:`plot_predicted_horizon`: one tick's predicted horizon + associated
  obstacle points,
- :func:`plot_campaign`: fleet overview from a recorded campaign bag.
"""

from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    return plt


def plot_flight(traj, field=None, path="flight.png", clearance=None):
    """traj: (T, >=3) positions; field: ObstacleField; clearance: (T,)."""
    plt = _mpl()
    traj = np.asarray(traj)
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 8), height_ratios=[3, 1])
    if field is not None:
        xy = np.asarray(field.cyl_xy)
        r = np.asarray(field.cyl_r)
        m = np.asarray(field.cyl_mask)
        for (cx, cy), cr in zip(xy[m], r[m]):
            ax1.add_patch(plt.Circle((cx, cy), cr, color="0.55"))
    if clearance is not None:
        sc = ax1.scatter(
            traj[:, 0], traj[:, 1], c=np.asarray(clearance), cmap="RdYlGn",
            s=6, vmin=0.0, vmax=2.0,
        )
        fig.colorbar(sc, ax=ax1, label="clearance [m]")
    else:
        ax1.plot(traj[:, 0], traj[:, 1], "b-")
    ax1.set_aspect("equal")
    ax1.set_xlabel("x [m]")
    ax1.set_ylabel("y [m]")
    ax1.set_title("top-down")
    ax2.plot(traj[:, 0], traj[:, 2])
    ax2.set_xlabel("x [m]")
    ax2.set_ylabel("z [m]")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_predicted_horizon(predicted, obstacles, ref_path=None, path="horizon.png"):
    """predicted: (N+1, >=3); obstacles: (N, K, 3) associated points."""
    plt = _mpl()
    predicted = np.asarray(predicted)
    obstacles = np.asarray(obstacles).reshape(-1, 3)
    obstacles = obstacles[obstacles[:, 0] < 9000]  # drop far sentinels
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.plot(predicted[:, 0], predicted[:, 1], "b.-", label="predicted")
    if ref_path is not None:
        ref_path = np.asarray(ref_path)
        ax.plot(ref_path[:, 0], ref_path[:, 1], "g--", label="reference")
    if len(obstacles):
        ax.scatter(obstacles[:, 0], obstacles[:, 1], c="r", s=12, label="obstacles")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_campaign(positions, clearances, path="campaign.png"):
    """positions: (T, B, 3) per-chunk final positions; clearances: (T, B)."""
    plt = _mpl()
    p = np.asarray(positions)
    c = np.asarray(clearances)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    for b in range(p.shape[1]):
        ax1.plot(p[:, b, 0], p[:, b, 1], alpha=0.5)
    ax1.set_title(f"fleet tracks (B={p.shape[1]})")
    ax1.set_aspect("equal")
    ax2.hist(c.min(axis=0), bins=30)
    ax2.axvline(0.0, color="r")
    ax2.set_title("per-scenario min clearance")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
