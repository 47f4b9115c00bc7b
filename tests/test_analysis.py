"""Analysis tools on synthetic CSVs (schema parity with the reference)."""

import pandas as pd
import pytest


@pytest.fixture
def agg_csv(tmp_path):
    df = pd.DataFrame({
        "Key": ["PCG-none-cpu", "PCG-ic-cpu", "Neural", "Neural+TPU"],
        "Total Time (ms)": [69.6, 49.6, 48.8, 20.5],
        "Solve Time (ms)": [69.58, 41.0, 48.6, 20.3],
        "Precond Time (ms)": [0.002, 8.59, 0.19, 0.19],
        "#Iteration": [474.3, 109.4, 113.4, 113.4],
    })
    p = tmp_path / "infer_case_6.csv"
    df.to_csv(p, index=False)
    return p


@pytest.fixture
def persample_csv(tmp_path):
    rows = []
    for key in ["Neural", "PCG-none-cpu"]:
        for size, t in [(2048, 20.0), (8192, 60.0), (32768, 200.0)]:
            rows.append({
                "Key": key, "Solve Time (ms)": t,
                "Precond Time (ms)": 1.0, "#Iteration": 100,
                "Matrix Size": size,
            })
    p = tmp_path / "all_infer_case_6.csv"
    pd.DataFrame(rows).to_csv(p, index=False)
    return p


def test_plot_scalability(persample_csv):
    from tpu_spai.analysis.plots import plot_scalability

    out = plot_scalability(str(persample_csv), step=32)
    assert out.endswith(".png")


def test_plot_bars_and_converge(agg_csv, tmp_path):
    from tpu_spai.analysis.plots import plot_bars, plot_converge

    assert plot_bars(str(agg_csv)).endswith(".png")
    out = plot_converge(str(agg_csv.parent), "case", ["6"])
    assert out.endswith(".png")


def test_compute_stats(persample_csv):
    from tpu_spai.analysis.plots import compute_stats

    g = compute_stats(str(persample_csv), min_size=4000, max_size=40000)
    assert set(g["Key"]) == {"Neural", "PCG-none-cpu"}
    assert "Total Time (ms)" in g.columns


def test_tab_to_latex(agg_csv):
    from tpu_spai.analysis.latex import tab_to_latex

    tex = tab_to_latex(str(agg_csv.parent), "case", ["6"])
    assert r"\begin{tabular}" in tex
    assert r"\textbf{" in tex  # best cell bolded
    assert "$10^{-6}$" in tex


def test_visualize_mesh(tmp_path):
    # ~ misc/visualize_msh.py: render boundary faces to a PNG
    import numpy as np

    from tpu_spai.analysis.visualize import main as viz_main
    from tpu_spai.datagen.meshes import unit_box_tet

    verts, elems = unit_box_tet(3, 3, 3)
    np.save(tmp_path / "v.npy", verts)
    np.save(tmp_path / "e.npy", elems)
    out = tmp_path / "mesh.png"
    assert viz_main([str(tmp_path / "v.npy"), str(tmp_path / "e.npy"),
                     str(out)]) == 0
    assert out.exists() and out.stat().st_size > 1000
