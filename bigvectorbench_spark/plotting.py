"""Pareto chart rendering — the reference's published output artifact
(plot.py:23-101 via plotting/utils.py:16-38 create_pointset; README.md's
recall/QPS plots).  The reference draws one chart per dataset: recall on x,
QPS on a log y, one Pareto-frontier staircase per algorithm with the raw
(non-frontier) run points faded behind it.

This module reproduces that artifact with a dependency-free SVG writer —
matplotlib is not assumed (and not present in the target container); when it
IS importable, :func:`render_pareto_png` produces the PNG twin through the
same pointset code.  All geometry is computed driver-side from the metrics
rows (a handful of runs per dataset), so there is nothing distributed here —
the distributed work is producing the metrics, not drawing them.

Series styling: a fixed algorithm→slot assignment into a validated
colorblind-safe categorical palette (assigned in registry order, never
cycled by on-screen count), 2px lines, ≥8px markers with a distinct marker
SHAPE per series as secondary encoding, a legend for ≥2 series, and a native
``<title>`` tooltip per marker.  Low-contrast slots rely on the relief rule:
the legend text + the metrics CSV table carry identity and values.
"""

from __future__ import annotations

import math
import os
from typing import Mapping, Sequence

# Fixed categorical slots (validated light-mode palette; adjacent-pair CVD
# dE >= 8, normal-vision >= 15).  Color follows the ALGORITHM, not its rank
# in the current chart: a chart with only {ivf, pq} still uses slots 3 and 5.
_PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100",
            "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
_ALGO_SLOTS = ["flat-expr", "flat-gemm", "ivf", "hnsw", "pq", "ivfpq", "sq8"]
_MARKERS = ["circle", "square", "diamond", "tri-up", "tri-down", "plus", "cross"]

_INK = "#333333"        # titles / axis labels
_INK_MUTED = "#707070"  # tick labels
_GRID = "#e4e4e0"
_SURFACE = "#fcfcfb"


def style_for(algorithm: str) -> tuple[str, str]:
    """(color, marker) for an algorithm — stable across charts and filters."""
    try:
        i = _ALGO_SLOTS.index(algorithm)
    except ValueError:
        i = (hash(algorithm) % (len(_PALETTE) - len(_ALGO_SLOTS))) + len(_ALGO_SLOTS)
    return _PALETTE[i % len(_PALETTE)], _MARKERS[i % len(_MARKERS)]


def create_pointset(
    points: Sequence[tuple[str, float, float]],
) -> tuple[list[tuple[str, float, float]], list[tuple[str, float, float]]]:
    """(frontier, all) run points for one algorithm — the reference's
    create_pointset (plotting/utils.py:16-38) with both metrics
    higher-is-better (recall, QPS): sort by descending y then descending x
    and keep the staircase of strictly-increasing x.  Returns points as
    (run_label, x, y)."""
    pts = [(l, x, y) for (l, x, y) in points if x and y]
    pts.sort(key=lambda t: (-t[2], -t[1]))
    frontier, last_x = [], float("-inf")
    for l, x, y in pts:
        if x > last_x:
            last_x = x
            frontier.append((l, x, y))
    return frontier, pts


def _log_ticks(lo: float, hi: float) -> list[float]:
    lo = max(lo, 1e-12)
    a, b = math.floor(math.log10(lo)), math.ceil(math.log10(hi))
    if a == b:
        b += 1
    return [10.0 ** e for e in range(a, b + 1)]


def _fmt(v: float) -> str:
    if v >= 1000 or v == int(v):
        return f"{int(v):d}" if v < 1e6 else f"{v:.0e}"
    return f"{v:g}"


def _marker_svg(shape: str, cx: float, cy: float, color: str, title: str) -> str:
    r = 4.5
    t = f"<title>{title}</title>"
    common = f'fill="{color}" stroke="{_SURFACE}" stroke-width="1.5"'
    if shape == "circle":
        body = f'<circle cx="{cx:.1f}" cy="{cy:.1f}" r="{r}" {common}>{t}</circle>'
    elif shape == "square":
        body = (f'<rect x="{cx - r:.1f}" y="{cy - r:.1f}" width="{2*r}" '
                f'height="{2*r}" {common}>{t}</rect>')
    elif shape == "diamond":
        p = f"{cx},{cy - r - 1} {cx + r + 1},{cy} {cx},{cy + r + 1} {cx - r - 1},{cy}"
        body = f'<polygon points="{p}" {common}>{t}</polygon>'
    elif shape == "tri-up":
        p = f"{cx},{cy - r - 1} {cx + r + 1},{cy + r} {cx - r - 1},{cy + r}"
        body = f'<polygon points="{p}" {common}>{t}</polygon>'
    elif shape == "tri-down":
        p = f"{cx},{cy + r + 1} {cx + r + 1},{cy - r} {cx - r - 1},{cy - r}"
        body = f'<polygon points="{p}" {common}>{t}</polygon>'
    elif shape == "plus":
        body = (f'<path d="M{cx - r},{cy} H{cx + r} M{cx},{cy - r} V{cy + r}" '
                f'stroke="{color}" stroke-width="3" fill="none">{t}</path>')
    else:  # cross
        body = (f'<path d="M{cx - r},{cy - r} L{cx + r},{cy + r} '
                f'M{cx - r},{cy + r} L{cx + r},{cy - r}" '
                f'stroke="{color}" stroke-width="3" fill="none">{t}</path>')
    return body


def render_pareto_svg(
    data: Mapping[str, Sequence[tuple[str, float, float]]],
    path: str,
    *,
    title: str = "Recall / Queries per second",
    xlabel: str = "Recall",
    ylabel: str = "Queries per second (1/s) — log scale",
    raw: bool = True,
) -> str:
    """Write the per-dataset Pareto chart as a standalone SVG.

    ``data`` maps algorithm → [(run_label, recall, qps), ...] (the metrics
    rows).  Each algorithm gets its frontier staircase as a 2px line with
    markers; with ``raw`` the dominated points render faded behind it.
    Returns ``path``."""
    W, H = 860, 520
    ml, mr, mt, mb = 70, 190, 48, 56
    pw, ph = W - ml - mr, H - mt - mb

    all_pts = [p for pts in data.values() for p in pts if p[1] and p[2]]
    if not all_pts:
        raise ValueError("no plottable points (all runs have zero recall or qps)")
    ys = [p[2] for p in all_pts]
    yticks = _log_ticks(min(ys), max(ys))
    y0, y1 = math.log10(yticks[0]), math.log10(yticks[-1])

    def X(x):
        return ml + x * pw

    def Y(y):
        return mt + ph - (math.log10(max(y, 1e-12)) - y0) / (y1 - y0) * ph

    e = []
    e.append(f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
             f'viewBox="0 0 {W} {H}" font-family="Helvetica, Arial, sans-serif">')
    e.append(f'<rect width="{W}" height="{H}" fill="{_SURFACE}"/>')
    e.append(f'<text x="{ml}" y="26" font-size="16" fill="{_INK}" '
             f'font-weight="bold">{title}</text>')

    # grid + ticks (recessive)
    for xv in [i / 5 for i in range(6)]:
        e.append(f'<line x1="{X(xv):.1f}" y1="{mt}" x2="{X(xv):.1f}" '
                 f'y2="{mt + ph}" stroke="{_GRID}"/>')
        e.append(f'<text x="{X(xv):.1f}" y="{mt + ph + 18}" font-size="11" '
                 f'fill="{_INK_MUTED}" text-anchor="middle">{xv:g}</text>')
    for yv in yticks:
        e.append(f'<line x1="{ml}" y1="{Y(yv):.1f}" x2="{ml + pw}" '
                 f'y2="{Y(yv):.1f}" stroke="{_GRID}"/>')
        e.append(f'<text x="{ml - 8}" y="{Y(yv) + 4:.1f}" font-size="11" '
                 f'fill="{_INK_MUTED}" text-anchor="end">{_fmt(yv)}</text>')
    e.append(f'<line x1="{ml}" y1="{mt + ph}" x2="{ml + pw}" y2="{mt + ph}" '
             f'stroke="{_INK_MUTED}"/>')
    e.append(f'<text x="{ml + pw / 2:.0f}" y="{H - 14}" font-size="13" '
             f'fill="{_INK}" text-anchor="middle">{xlabel}</text>')
    e.append(f'<text x="20" y="{mt + ph / 2:.0f}" font-size="13" fill="{_INK}" '
             f'text-anchor="middle" transform="rotate(-90 20 {mt + ph / 2:.0f})">'
             f'{ylabel}</text>')

    legend_y = mt + 6
    for algo in sorted(data, key=_algo_order):
        color, marker = style_for(algo)
        frontier, pts = create_pointset(data[algo])
        if raw:
            for l, x, y in pts:
                e.append(f'<g opacity="0.25">{_marker_svg(marker, X(x), Y(y), color, f"{l}: recall={x:.4f}, qps={y:.1f}")}</g>')
        if frontier:
            path_d = " ".join(f"{X(x):.1f},{Y(y):.1f}" for _, x, y in frontier)
            e.append(f'<polyline points="{path_d}" fill="none" stroke="{color}" '
                     f'stroke-width="2"/>')
            for l, x, y in frontier:
                e.append(_marker_svg(marker, X(x), Y(y), color,
                                     f"{l}: recall={x:.4f}, qps={y:.1f}"))
        # legend row (always present; identity never color-alone — the
        # marker shape + text label ride along)
        lx = ml + pw + 18
        e.append(_marker_svg(marker, lx, legend_y, color, algo))
        e.append(f'<line x1="{lx - 12}" y1="{legend_y}" x2="{lx + 12}" '
                 f'y2="{legend_y}" stroke="{color}" stroke-width="2"/>')
        e.append(f'<text x="{lx + 18}" y="{legend_y + 4}" font-size="12" '
                 f'fill="{_INK}">{algo}</text>')
        legend_y += 22

    e.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(e))
    return path


def _algo_order(algo: str) -> tuple[int, str]:
    try:
        return (_ALGO_SLOTS.index(algo), algo)
    except ValueError:
        return (len(_ALGO_SLOTS), algo)


def render_pareto_png(data, path, **kw) -> str | None:
    """PNG twin through matplotlib when importable (the container does not
    ship it); returns None otherwise.  Same pointset + styling rules."""
    try:
        import matplotlib
    except ImportError:
        return None
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    for algo in sorted(data, key=_algo_order):
        color, _ = style_for(algo)
        frontier, pts = create_pointset(data[algo])
        if kw.get("raw", True) and pts:
            ax.plot([p[1] for p in pts], [p[2] for p in pts], "o",
                    color=color, alpha=0.25, ms=5)
        if frontier:
            ax.plot([p[1] for p in frontier], [p[2] for p in frontier],
                    "-o", color=color, label=algo, lw=2, ms=7)
    ax.set_yscale("log")
    ax.set_xlabel(kw.get("xlabel", "Recall"))
    ax.set_ylabel(kw.get("ylabel", "Queries per second (1/s)"))
    ax.set_title(kw.get("title", "Recall / Queries per second"))
    ax.grid(True, which="major", color="0.85")
    ax.legend(loc="center left", bbox_to_anchor=(1, 0.5), prop={"size": 9})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def pointset_from_metrics(rows) -> dict[str, list[tuple[str, float, float]]]:
    """Group metrics rows (dicts or Rows with algorithm/label/mean_recall/
    qps) into the per-algorithm pointsets the renderers take."""
    data: dict[str, list[tuple[str, float, float]]] = {}
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        data.setdefault(d["algorithm"], []).append(
            (d["label"], float(d["mean_recall"]), float(d["qps"])))
    return data
