"""Point-sprite particle renderer (PNG) + animation assembly.

The reference draws each particle as a sphere mesh scaled to its support
radius with a random per-particle base color in a live Unity viewport
(``ParticleAuthoring.cs:165,193-199``; Hybrid Renderer). The offline
stand-in: matplotlib scatter with marker size tracking the smoothing
length, color tracking a field (or a stable per-particle random base
color, ``color_by='id'``), an optional velocity quiver overlay, and a GIF
assembler for ``--render-every`` frame sequences.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def _stable_colors(n: int, seed: int = 0):
    """Per-particle random base colors, stable across frames/steps (the
    ParticleAuthoring.cs:193-199 random-color analog, but deterministic)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(0.25, 1.0, size=(n, 3))


def render_png(state, path: str, axis=(0, 1), extent: float | None = None,
               color_by: str = "rho", quiver: bool = False,
               quiver_max: int = 400, blocks=None) -> str:
    """Render one frame.

    color_by: any scalar/vector ParticleState field name (vectors use
    their norm), or 'id' for stable per-particle random colors.
    quiver: overlay velocity arrows on a subsample of particles.
    blocks: optional SimConfig — overlay the Morton-block AABB wireframes
    of the current neighbor structure (the debug-draw analog of the
    vendored ``DisplayBroadphaseSystem``, which draws broadphase AABBs).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos = np.asarray(state.pos)
    h = np.asarray(state.h)

    a0, a1 = axis
    fig, ax = plt.subplots(figsize=(7, 7), dpi=110)
    if extent is None:
        extent = float(np.percentile(np.abs(pos[:, [a0, a1]]), 99.5)) * 1.3 + 1e-6
    size = np.clip(40.0 * (h / max(extent, 1e-6)) * 7.0, 0.5, 60.0) ** 2

    if color_by == "id":
        colors = _stable_colors(pos.shape[0])
        sc = ax.scatter(pos[:, a0], pos[:, a1], s=size, c=colors,
                        alpha=0.6, linewidths=0)
    elif color_by == "material":
        # categorical per-material colors + a named legend (continuous
        # colormaps wash the few discrete matids into one hue); ONE
        # scatter ordered big-markers-first so dense small-h material
        # (e.g. an iron core) isn't overplotted by puffy large-h halos
        from matplotlib.lines import Line2D
        from ..ops import eos as eos_ops
        mid = np.asarray(state.matid)
        palette = ("#b0633a", "#9b9b9b", "#e8d44d", "#7fd4ff", "#3a6fd8")
        order = np.argsort(-size)
        colors = np.asarray([palette[i % len(palette)]
                             for i in range(len(eos_ops.MATERIAL_NAMES))])
        ax.scatter(pos[order, a0], pos[order, a1], s=size[order],
                   c=colors[mid[order]], alpha=0.6, linewidths=0)
        handles = [Line2D([], [], marker="o", linestyle="", markersize=8,
                          color=palette[i % len(palette)],
                          label=eos_ops.MATERIAL_NAMES[i])
                   for i in np.unique(mid)]
        ax.legend(handles=handles, loc="upper right", facecolor="#202020",
                  labelcolor="white")
    else:
        c = np.asarray(getattr(state, color_by))
        if c.ndim > 1:
            c = np.linalg.norm(c, axis=-1)
        sc = ax.scatter(pos[:, a0], pos[:, a1], s=size, c=c, cmap="inferno",
                        alpha=0.6, linewidths=0)
        fig.colorbar(sc, ax=ax, label=color_by)

    if quiver:
        vel = np.asarray(state.vel)
        stride = max(1, pos.shape[0] // quiver_max)
        ax.quiver(pos[::stride, a0], pos[::stride, a1],
                  vel[::stride, a0], vel[::stride, a1],
                  color="#60c0ff", width=2e-3, alpha=0.8)

    if blocks is not None:
        from matplotlib.patches import Rectangle
        from ..ops import structure
        import jax

        st = jax.jit(lambda p, hh, m: structure.build(p, hh, m, blocks))(
            state.pos, state.h, state.mass)
        grp = st.groups
        g = grp.live.shape[0]
        p_b = np.asarray(state.pos)[np.asarray(grp.tgt_idx)].reshape(
            g, -1, 3)
        live = np.asarray(grp.live)
        for gi in range(g):
            if not live[gi].any():
                continue
            pts = p_b[gi][live[gi]][:, [a0, a1]]
            lo, hi = pts.min(axis=0), pts.max(axis=0)
            ax.add_patch(Rectangle(lo, *(hi - lo), fill=False,
                                   edgecolor="#40ff90", linewidth=0.5,
                                   alpha=0.55))

    ax.set_xlim(-extent, extent)
    ax.set_ylim(-extent, extent)
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    ax.set_xlabel("xyz"[a0])
    ax.set_ylabel("xyz"[a1])
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def assemble_gif(frames, out_path: str, fps: float = 10.0) -> str:
    """Assemble PNG frames into an animated GIF (the live-viewport stand-in).

    `frames`: a directory containing frame_*.png, or an explicit list of
    paths. Uses PIL only (no ffmpeg in the image).
    """
    from PIL import Image

    if isinstance(frames, str):
        paths = sorted(glob.glob(os.path.join(frames, "*.png")))
    else:
        paths = list(frames)
    if not paths:
        raise ValueError(f"no frames found for {out_path}")
    imgs = [Image.open(p).convert("P", palette=Image.ADAPTIVE) for p in paths]
    imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000.0 / fps), loop=0)
    return out_path
