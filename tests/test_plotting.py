"""Pareto chart artifact (reference plot.py:23-101 / plotting/utils.py:16-38).

The renderer is driver-side string building — no Spark needed; the CLI
end-to-end (metrics CSV → SVG) is covered by the --plot smoke below it.
"""

import os

import pytest

from bigvectorbench_spark import plotting as pl


POINTS = {
    "ivf": [("ivf[np=1]", 0.62, 220.0), ("ivf[np=4]", 0.91, 80.0),
            ("ivf[np=8]", 0.99, 30.0), ("ivf[np=2]", 0.80, 120.0),
            ("ivf-dominated", 0.60, 100.0)],
    "flat-gemm": [("flat", 1.0, 45.0)],
}


def test_create_pointset_staircase():
    """Mirrors the reference semantics: sort by descending QPS, keep the
    strictly-increasing-recall staircase; dominated runs stay in the raw
    list only."""
    frontier, raw = pl.create_pointset(POINTS["ivf"])
    assert [l for l, _, _ in frontier] == [
        "ivf[np=1]", "ivf[np=2]", "ivf[np=4]", "ivf[np=8]"]
    assert len(raw) == 5                       # dominated point kept in raw
    # frontier is monotone: recall strictly up, qps strictly down
    xs = [x for _, x, _ in frontier]
    ys = [y for _, _, y in frontier]
    assert xs == sorted(xs) and ys == sorted(ys, reverse=True)


def test_create_pointset_drops_zero_points():
    frontier, raw = pl.create_pointset([("a", 0.0, 10.0), ("b", 0.5, 0.0),
                                        ("c", 0.9, 5.0)])
    assert [l for l, _, _ in frontier] == ["c"] and len(raw) == 1


def test_style_is_entity_stable():
    """Color follows the algorithm, never its rank in the current chart."""
    assert pl.style_for("ivf") == pl.style_for("ivf")
    colors = {a: pl.style_for(a)[0] for a in
              ["flat-expr", "flat-gemm", "ivf", "hnsw", "pq", "ivfpq", "sq8"]}
    assert len(set(colors.values())) == 7      # distinct fixed slots
    markers = {a: pl.style_for(a)[1] for a in colors}
    assert len(set(markers.values())) == 7     # shape = secondary encoding


def test_render_pareto_svg(tmp_path):
    out = str(tmp_path / "plots" / "fx.svg")
    got = pl.render_pareto_svg(POINTS, out, title="fx")
    assert got == out and os.path.exists(out)
    svg = open(out).read()
    assert len(svg) > 2000 and svg.startswith("<svg")
    assert svg.count("<polyline") == 2          # one frontier line per algo
    assert "ivf[np=4]: recall=0.9100" in svg    # native <title> tooltip
    assert "flat-gemm" in svg and "ivf" in svg  # legend text labels
    # log-y gridline labels cover the data's decades
    assert ">100<" in svg and ">10<" in svg


def test_render_pareto_svg_empty_raises(tmp_path):
    with pytest.raises(ValueError, match="no plottable"):
        pl.render_pareto_svg({"a": [("r", 0.0, 0.0)]}, str(tmp_path / "x.svg"))


def test_render_png_gated(tmp_path):
    """PNG twin: returns a path when matplotlib importable, None otherwise —
    never raises (the container ships no matplotlib)."""
    got = pl.render_pareto_png(POINTS, str(tmp_path / "fx.png"))
    try:
        import matplotlib  # noqa: F401
        assert got is not None and os.path.exists(got)
    except ImportError:
        assert got is None


def test_pointset_from_metrics():
    rows = [{"algorithm": "ivf", "label": "ivf[np=1]",
             "mean_recall": "0.62", "qps": "220.0"},
            {"algorithm": "flat-gemm", "label": "flat",
             "mean_recall": "1.0", "qps": "45.0"}]
    data = pl.pointset_from_metrics(rows)
    assert set(data) == {"ivf", "flat-gemm"}
    assert data["ivf"] == [("ivf[np=1]", 0.62, 220.0)]


def test_cli_plot_end_to_end(spark, tmp_path, monkeypatch):
    """run_benchmark --plot writes a non-trivial SVG from the metrics CSV
    (VERDICT r6 ask #3 'Done' condition), and a second invocation appends
    to the catalog without the read-then-overwrite crash."""
    import sys as _sys
    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(sys_path_root, "scripts"))
    import run_benchmark as rb

    out = str(tmp_path / "results")
    base = ["run_benchmark.py", "--dataset", "random-xs-32-euclidean",
            "--max-queries", "5", "--runs", "1", "--count", "5", "--out", out]
    monkeypatch.setattr(_sys, "argv", base + ["--algorithm", "flat-expr"])
    assert rb.main() == 0
    monkeypatch.setattr(_sys, "argv",
                        base + ["--algorithm", "flat-gemm", "--plot"])
    assert rb.main() == 0                      # append path + plot
    svg_path = os.path.join(out, "plots", "random-xs-32-euclidean.svg")
    assert os.path.exists(svg_path)
    svg = open(svg_path).read()
    assert len(svg) > 2000 and "<polyline" in svg
    assert "flat-expr" in svg and "flat-gemm" in svg   # both catalog rows
