"""Format/schema tests for the experiment paths that can't run live here
(Milvus/MSVBASE need Docker; ann-benchmarks HDF5 needs a download) — pinning
the CSV row writer and the dataset converters so the unexercised code paths
don't rot (round-1 verdict item 10)."""

import os

import numpy as np
import pytest


def test_milvus_save_row_schema(tmp_path):
    """CSV schema must match the reference's
    `filter_width,method,recall,average_time,qps,threads[,build_time,memory]`
    (ref: experiments/run_our_method.py:538-567, run_milvus.py)."""
    from rangefilteredann_tpu.experiments.run_milvus import save_row

    d = str(tmp_path)
    save_row(d, "sift-128-euclidean", "pow-2", "hnsw_64_500", 0.987,
             0.000123, 8130.1, 16, build_time=42.5)
    save_row(d, "sift-128-euclidean", "pow-3", "msvbase", 0.9, 0.001, 1000.0,
             16)
    path = os.path.join(d, "sift-128-euclidean_results.csv")
    lines = open(path).read().strip().split("\n")
    header = lines[0].split(",")
    assert header[:6] == ["filter_width", "method", "recall", "average_time",
                          "qps", "threads"]
    row = lines[1].split(",")
    assert row[0] == "pow-2" and row[1] == "hnsw_64_500"
    assert float(row[2]) == 0.987 and int(row[5]) == 16
    # appending keeps one header
    assert sum(ln.startswith("filter_width") for ln in lines) == 1
    assert len(lines) == 3


def test_redcaps_converter_protocol_files(tmp_path, monkeypatch):
    """convert_redcaps must emit the reference's protocol files with
    normalized vectors, float64 timestamp labels, and per-fraction
    query-range + GT files (ref: generate_redcaps_data.py:65-80,
    filter_generation_utils.py)."""
    from rangefilteredann_tpu.experiments import datasets as ds

    rng = np.random.default_rng(0)
    n, d, nq = 64, 8, 6
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ts = (1.6e9 + rng.integers(0, 1e6, size=n)).astype(np.float64)
    qs = rng.normal(size=(nq, d)).astype(np.float32)
    np.save(tmp_path / "emb.npy", emb)
    np.save(tmp_path / "ts.npy", ts)
    np.save(tmp_path / "qs.npy", qs)
    out = tmp_path / "out"
    # keep the fraction sweep tiny for test speed
    monkeypatch.setattr(ds, "EXPERIMENT_FILTER_POWERS", [0, -1])
    ds.convert_redcaps(str(tmp_path / "emb.npy"), str(tmp_path / "ts.npy"),
                       str(tmp_path / "qs.npy"), str(out), name="rc-test")
    data = np.load(out / "rc-test.npy")
    np.testing.assert_allclose(np.linalg.norm(data, axis=1), 1.0, rtol=1e-5)
    labels = np.load(out / "rc-test_filter-values.npy")
    assert labels.dtype == np.float64
    q = np.load(out / "rc-test_queries.npy")
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, rtol=1e-5)
    for p in (0, -1):
        r = np.load(out / f"rc-test_queries_2pow{p}_ranges.npy")
        gt = np.load(out / f"rc-test_queries_2pow{p}_gt.npy")
        assert r.shape == (nq, 2) and gt.shape[0] == nq
        assert (r[:, 1] >= r[:, 0]).all()


@pytest.mark.skipif(
    not pytest.importorskip("h5py", reason="h5py absent"), reason="")
def test_hdf5_converter(tmp_path, monkeypatch):
    import h5py

    from rangefilteredann_tpu.experiments import datasets as ds

    rng = np.random.default_rng(1)
    with h5py.File(tmp_path / "toy.hdf5", "w") as f:
        f["train"] = rng.normal(size=(50, 8)).astype(np.float32)
        f["test"] = rng.normal(size=(5, 8)).astype(np.float32)
    monkeypatch.setattr(ds, "EXPERIMENT_FILTER_POWERS", [0])
    out = tmp_path / "o"
    ds.convert_ann_benchmarks_hdf5(str(tmp_path / "toy.hdf5"), str(out),
                                   "toy-8-angular")
    data = np.load(out / "toy-8-angular.npy")
    np.testing.assert_allclose(np.linalg.norm(data, axis=1), 1.0, rtol=1e-5)
    assert os.path.exists(out / "toy-8-angular_queries_2pow0_ranges.npy")


def test_triangle_coverage_geometry(tmp_path):
    """The static port of the reference's coverage tool: fill is rasterized
    point-in-triangle of the same shapes (ref: triangle_experiments/test.py
    add_triangle/update_area_text). Fill must be monotone in placements and
    the whole-range bucket must cover the slop-feasible half."""
    from rangefilteredann_tpu.experiments.triangle_coverage import (
        evaluate, render, super_tree_placements)

    f0, c0 = evaluate([])
    assert f0 == 0.0 and c0 == 0.0
    f1, c1 = evaluate([(0.0, 1.0)])
    assert 0 < f1 < 100 and c1 == 1.0
    f2, c2 = evaluate([(0.0, 1.0), (0.0, 0.5), (0.25, 0.5)])
    assert f2 >= f1 and c2 == 2.0
    pl = super_tree_placements(2.0, 0.5, 1 / 64)
    f3, c3 = evaluate(pl)
    assert f3 > f1  # the arrangement beats a single bucket
    out = tmp_path / "t.png"
    render(pl, f3, c3, str(out))
    assert out.stat().st_size > 1000
