"""Experiment-layer parity: dataset protocol files, runners, analyses."""

import os
import sys

import numpy as np
import pytest

from rangefilteredann_tpu.experiments import datasets as ds
from rangefilteredann_tpu.experiments.arrangements import arrangement_cost


def test_query_filter_ranges_follow_distribution():
    rng = np.random.default_rng(0)
    fv = rng.uniform(size=5000)
    ranges = ds.generate_random_query_filter_ranges(fv, 2.0**-4, 50, rng)
    fvs = np.sort(fv)
    for lo, hi in ranges:
        inside = int(np.searchsorted(fvs, hi, "right") - np.searchsorted(fvs, lo))
        # width targets fraction*n points, jittered into neighbor gaps
        assert abs(inside - int(5000 * 2.0**-4)) <= 2


def test_full_range_fraction_one():
    rng = np.random.default_rng(0)
    fv = rng.uniform(size=100)
    ranges = ds.generate_random_query_filter_ranges(fv, 1, 5, rng)
    assert (ranges[:, 0] < fv.min()).all() and (ranges[:, 1] > fv.max()).all()


def test_synthetic_roundtrip(tmp_path):
    out = str(tmp_path)
    ds.generate_synthetic(out, "synthetic-16-euclidean", n=3000, d=16, nq=20)
    data, queries, fv, metric = ds.initialize_dataset(
        "synthetic-16-euclidean", out
    )
    assert data.shape == (3000, 16) and queries.shape == (20, 16)
    assert metric == "Euclidian"
    ranges, gt = ds.get_queries_and_gt("synthetic-16-euclidean", "2pow-2", out)
    assert ranges.shape == (20, 2) and gt.shape == (20, 10)
    # GT really is the filtered exact top-10
    for qi in range(5):
        lo, hi = ranges[qi]
        cand = np.nonzero((fv >= lo) & (fv <= hi))[0]
        d = ((data[cand] - queries[qi]) ** 2).sum(1)
        want = set(cand[np.argsort(d)[:10]].tolist())
        assert len(want & set(gt[qi].tolist())) >= 9  # fp tie tolerance


def test_adversarial_generation(tmp_path):
    out = str(tmp_path)
    ds.generate_adversarial(out, n=5000, n_clusters=10, d=16, nq=50)
    data = np.load(os.path.join(out, "adversarial-100-angular.npy"))
    fv = np.load(os.path.join(out, "adversarial-100-angular_filter-values.npy"))
    ranges = np.load(
        os.path.join(out, "adversarial-100-angular_queries_ranges.npy")
    )
    assert np.allclose(np.linalg.norm(data, axis=1), 1, atol=1e-5)
    # each range spans exactly one cluster's label window
    assert ((ranges[:, 1] - ranges[:, 0]) == 1.0).all()
    assert fv.min() >= 0 and fv.max() < 10


def test_arrangement_cost_monotone_memory():
    # higher shift => less overlap => less memory
    m1, _ = arrangement_cost(100_000, 1000, 2.0, 0.25)
    m2, _ = arrangement_cost(100_000, 1000, 2.0, 0.75)
    assert m1 > m2 > 1.0


def test_baseline_runners_skip_cleanly(capsys):
    from rangefilteredann_tpu.experiments import run_milvus, run_msvbase

    run_milvus.run("nonexistent-dataset", "HNSW", host="127.0.0.1", port=1)
    run_msvbase.run("nonexistent-dataset", host="127.0.0.1", port=1)
    out = capsys.readouterr().out
    assert "skipping" in out


def test_create_table_speedup(tmp_path, capsys):
    """Speedup = best our-method qps / best baseline qps above the recall
    threshold, per filter width (ref: experiments/create_table.py:5-37);
    filter_width strips filename-join underscores, method groups by its
    prefix before the first '_', and a side with no qualifying rows yields
    NaN in the table."""
    import math

    from rangefilteredann_tpu.experiments.create_table import (
        _latex_table, main, speedup_of_our_best_method)

    rows = [
        "filter_width,method,recall,average_time,qps,threads",
        "_2pow-2_,vamana-tree_40_2,0.95,0.001,1000.0,1",
        "_2pow-2_,optimized-postfiltering_80_2,0.99,0.001,3000.0,1",
        "_2pow-2_,postfiltering_40_2,0.92,0.001,500.0,1",
        "_2pow-2_,milvus_16,0.91,0.001,250.0,1",
        "_2pow-2_,vamana-tree_10_2,0.50,0.001,9999.0,1",  # below threshold
        "_2pow-3_,vamana-tree_40_2,0.95,0.001,800.0,1",   # no baseline row
    ]
    (tmp_path / "sift-128-euclidean_run.csv").write_text("\n".join(rows))

    s = speedup_of_our_best_method("sift-128-euclidean", "2pow-2", 0.9,
                                   results_dir=str(tmp_path))
    assert s == 3000.0 / 500.0
    assert math.isnan(speedup_of_our_best_method(
        "sift-128-euclidean", "2pow-3", 0.9, results_dir=str(tmp_path)))
    # threshold excludes the 9999-qps row (recall 0.50)
    s99 = speedup_of_our_best_method("sift-128-euclidean", "2pow-2", 0.98,
                                     results_dir=str(tmp_path))
    assert math.isnan(s99)  # baselines all below 0.98

    out = _latex_table(["Dataset", "$2^{-2}$"], [["sift", 6.0]])
    assert r"\toprule" in out and "6.00" in out and r"\end{tabular}" in out

    main(datasets=["sift-128-euclidean"], results_dir=str(tmp_path))
    printed = capsys.readouterr().out
    assert "6.00" in printed and "NaN" in printed


def test_plot_adversarial_smoke(tmp_path):
    """plot_adversarial renders a Pareto panel from the adversarial CSV
    schema (caught live: it indexed pareto_front's returned POINTS as a
    mask and crashed on any real CSV)."""
    csv_p = tmp_path / "adversarial_1m.csv"
    csv_p.write_text(
        "filter_width,method,recall,average_time,qps,threads\n"
        "cluster-1,prefiltering,1.0,0.001,1000.0,1\n"
        "cluster-1,postfiltering_40_2,0.55,0.0005,2000.0,1\n"
        "cluster-1,postfiltering_160_2,0.85,0.002,500.0,1\n"
        "cluster-1,vamana-tree_40_2,0.99,0.001,900.0,1\n")
    from rangefilteredann_tpu.experiments.plot_adversarial import plot

    out = tmp_path / "adv.png"
    plot(str(csv_p), out=str(out))
    assert out.stat().st_size > 1000
