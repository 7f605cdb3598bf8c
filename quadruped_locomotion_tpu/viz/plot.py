"""Host-side visualization: preview + closed-loop telemetry plots.

The capability equivalent of the reference's visualization stack — the
RViz preview display scrubbing a recorded StateBatch
(``free_gait_rviz_plugin/src/FreeGaitPreviewDisplay.cpp:42-400``), the
foothold/support-polygon markers (``RosVisualization.cpp``,
``free_gait_marker/src/marker_manager/MarkerManager.cpp:87-200``) and
the rqt monitor's progress view — re-designed for the TPU workflow:
rendering is pure host-side matplotlib over recorded arrays (a preview
:class:`~..rollout.preview.StateBatch` or closed-loop rollout
telemetry), producing shareable PNGs instead of a live ROS GUI. No
rendering ever touches the device path.

Figure anatomy (both entry points):

* **top-down track** — torso XY path, per-leg swing trajectories,
  foothold marks at stance switches, the final support polygon;
* **height profile** — base z and per-leg foot z over time;
* **support gantt** — stance/swing bars per leg (the preview's
  scrubbable contact timeline);
* **progress strip** — schedule step index (preview) or QP KKT health
  (closed loop) over time.

Per-leg colors are a fixed categorical assignment (LF, RF, RH, LH) from
the Okabe–Ito colorblind-safe set — identity is also carried by the
legend and marker shape, never by color alone.
"""

from __future__ import annotations

import numpy as np

LEG_NAMES = ("LF", "RF", "RH", "LH")
# Okabe–Ito colorblind-safe categorical colors, fixed leg order.
LEG_COLORS = ("#0072B2", "#E69F00", "#009E73", "#CC79A7")
LEG_MARKERS = ("o", "s", "^", "D")
INK = "#333333"
GRID = "#DDDDDD"


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _style(ax, title=None, xlabel=None, ylabel=None):
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    if title:
        ax.set_title(title, color=INK, fontsize=10)
    if xlabel:
        ax.set_xlabel(xlabel, color=INK, fontsize=9)
    if ylabel:
        ax.set_ylabel(ylabel, color=INK, fontsize=9)
    ax.tick_params(labelsize=8, colors=INK)


def _support_polygon_xy(feet_xy, support):
    """Counter-clockwise hull of the supporting feet (≤ 4 points)."""
    pts = feet_xy[np.asarray(support, bool)]
    if len(pts) < 3:
        return pts
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    return pts[np.argsort(ang)]


def _plot_track(ax, base_xy, feet, support):
    """Top-down torso path + swing trajectories + footholds + polygon."""
    T = len(base_xy)
    ax.plot(
        base_xy[:, 0], base_xy[:, 1], color=INK, linewidth=2.0,
        label="torso", zorder=3,
    )
    sup = np.asarray(support, bool)
    for leg in range(4):
        fx = feet[:, leg, 0].copy()
        fy = feet[:, leg, 1].copy()
        # swing trajectories: NaN-mask stance ticks (≙ StateBatchComputer
        # computeEndEffectorTrajectories)
        fx_sw = np.where(sup[:, leg], np.nan, fx)
        fy_sw = np.where(sup[:, leg], np.nan, fy)
        ax.plot(
            fx_sw, fy_sw, color=LEG_COLORS[leg], linewidth=1.2, zorder=2
        )
        # foothold marks at touchdowns (swing → support transitions)
        td = np.flatnonzero(sup[1:, leg] & ~sup[:-1, leg]) + 1
        marks = np.concatenate([[0], td, [T - 1]])
        ax.scatter(
            fx[marks], fy[marks], s=26, marker=LEG_MARKERS[leg],
            color=LEG_COLORS[leg], edgecolors="white", linewidths=0.8,
            label=f"{LEG_NAMES[leg]} foothold", zorder=4,
        )
    poly = _support_polygon_xy(feet[-1, :, :2], sup[-1])
    if len(poly) >= 3:
        ax.fill(
            poly[:, 0], poly[:, 1], color="#888888", alpha=0.15,
            zorder=1, label="final support",
        )
    ax.set_aspect("equal", adjustable="datalim")
    _style(ax, "top-down track", "x [m]", "y [m]")
    ax.legend(fontsize=7, loc="best", framealpha=0.9)


def _plot_heights(ax, times, base_z, feet_z):
    ax.plot(times, base_z, color=INK, linewidth=2.0, label="base")
    for leg in range(4):
        ax.plot(
            times, feet_z[:, leg], color=LEG_COLORS[leg], linewidth=1.2,
            label=LEG_NAMES[leg],
        )
    _style(ax, "heights", "t [s]", "z [m]")
    ax.legend(fontsize=7, ncol=5, loc="best", framealpha=0.9)


def _plot_support_gantt(ax, times, support):
    sup = np.asarray(support, bool)
    dt = times[1] - times[0] if len(times) > 1 else 0.01
    for leg in range(4):
        on = sup[:, leg]
        edges = np.flatnonzero(np.diff(on.astype(int)))
        starts = np.concatenate([[0], edges + 1])
        ends = np.concatenate([edges + 1, [len(on)]])
        spans = [
            (times[s], times[e - 1] - times[s] + dt)
            for s, e in zip(starts, ends)
            if on[s]
        ]
        ax.broken_barh(
            spans, (3 - leg - 0.35, 0.7), color=LEG_COLORS[leg]
        )
    ax.set_yticks(range(4))
    ax.set_yticklabels(reversed(LEG_NAMES))
    _style(ax, "support (stance bars)", "t [s]")


def plot_preview(batch, path: str, title: str | None = None) -> str:
    """Render a preview :class:`~..rollout.preview.StateBatch` to a PNG —
    ≙ the RViz preview display + markers, as a static storyboard."""
    plt = _mpl()
    times = np.asarray(batch.times)
    base = np.asarray(batch.base_position)
    feet = np.asarray(batch.feet_world)
    support = np.asarray(batch.support)
    step_index = np.asarray(batch.step_index)

    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    _plot_track(axes[0, 0], base[:, :2], feet, support)
    _plot_heights(axes[0, 1], times, base[:, 2], feet[:, :, 2])
    _plot_support_gantt(axes[1, 0], times, support)
    ax = axes[1, 1]
    ax.step(times, step_index, color=INK, linewidth=2.0, where="post")
    _style(ax, "schedule progress", "t [s]", "step index")
    fig.suptitle(title or "free-gait preview", color=INK, fontsize=12)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path


def plot_telemetry(tel: dict, path: str, title: str | None = None) -> str:
    """Render closed-loop rollout telemetry (the dict produced by
    ``rollout.closed_loop.rollout`` / ``rollout.script_loop.run_schedule``)
    to a PNG — ≙ the controller's ``/capture_log_data`` ring-buffer replay
    plots + the rqt monitor progress view."""
    plt = _mpl()
    tel = {k: np.asarray(v) for k, v in tel.items() if not isinstance(v, dict)}
    base = tel["base_position"]
    feet = tel["feet_world"]
    T = len(base)
    times = np.arange(T) * 0.01  # planner ticks
    support = tel.get("support")
    if support is None:
        # script_loop telemetry: infer stance from foot height
        support = feet[:, :, 2] < 0.01

    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    _plot_track(axes[0, 0], base[:, :2], feet, support)
    _plot_heights(axes[0, 1], times, base[:, 2], feet[:, :, 2])
    _plot_support_gantt(axes[1, 0], times, support)
    ax = axes[1, 1]
    if "qp_kkt" in tel:
        kkt = np.maximum(tel["qp_kkt"].reshape(T, -1).max(axis=1), 1e-12)
        ax.semilogy(times, kkt, color=INK, linewidth=1.5)
        _style(ax, "force-distribution QP health", "t [s]", "max KKT")
    elif "step_index" in tel:
        ax.step(times, tel["step_index"], color=INK, linewidth=2.0,
                where="post")
        _style(ax, "schedule progress", "t [s]", "step index")
    fig.suptitle(title or "closed-loop telemetry", color=INK, fontsize=12)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path
