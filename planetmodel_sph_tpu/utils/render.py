"""Point-sprite particle renderer (PNG), replacing Unity sphere rendering.

The reference draws each particle as a sphere mesh scaled to its support
radius with a random per-particle base color
(``ParticleAuthoring.cs:165,193-199``; Hybrid Renderer). Off-graph here:
matplotlib scatter with marker size tracking the smoothing length and color
tracking density.
"""

from __future__ import annotations

import numpy as np


def render_png(state, path: str, axis=(0, 1), extent: float | None = None,
               color_by: str = "rho") -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos = np.asarray(state.pos)
    h = np.asarray(state.h)
    c = np.asarray(getattr(state, color_by))
    if c.ndim > 1:
        c = np.linalg.norm(c, axis=-1)

    a0, a1 = axis
    fig, ax = plt.subplots(figsize=(7, 7), dpi=110)
    if extent is None:
        extent = float(np.percentile(np.abs(pos[:, [a0, a1]]), 99.5)) * 1.3 + 1e-6
    size = np.clip(40.0 * (h / max(extent, 1e-6)) * 7.0, 0.5, 60.0) ** 2
    sc = ax.scatter(pos[:, a0], pos[:, a1], s=size, c=c, cmap="inferno",
                    alpha=0.6, linewidths=0)
    ax.set_xlim(-extent, extent)
    ax.set_ylim(-extent, extent)
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    fig.colorbar(sc, ax=ax, label=color_by)
    ax.set_xlabel("xyz"[a0])
    ax.set_ylabel("xyz"[a1])
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
