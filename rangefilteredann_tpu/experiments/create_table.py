"""LaTeX speedup tables — parity with the reference's create_table.py:
speedup = best our-method QPS / best baseline QPS among rows above a recall
threshold, per filter fraction 2^-11..2^0 (ref: create_table.py:5-37)."""

from __future__ import annotations

import glob

OUR_METHODS = [
    "vamana-tree",
    "three-split",
    "super-postfiltering",
    "optimized-postfiltering",
]
THEIR_METHODS = ["milvus", "vbase", "postfiltering", "prefiltering"]
POWS = list(range(-11, 1))
RECALL_THRESHOLDS = [0.8, 0.9, 0.95, 0.99, 0.995]


def speedup_of_our_best_method(dataset_name, filter_width, recall_threshold,
                               results_dir="results"):
    import pandas as pd

    paths = glob.glob(f"{results_dir}/*{dataset_name}*.csv")
    df = pd.concat([pd.read_csv(p) for p in paths])
    df["filter_width"] = df["filter_width"].astype(str).str.strip("_")
    df = df[df["filter_width"] == filter_width]
    df["method"] = df["method"].str.split("_").str[0]
    ours = df[df["method"].isin(OUR_METHODS) & (df["recall"] > recall_threshold)]["qps"].max()
    theirs = df[df["method"].isin(THEIR_METHODS) & (df["recall"] > recall_threshold)]["qps"].max()
    return ours / theirs


def main(datasets=None, results_dir="results"):
    import pandas as pd

    datasets = datasets or [
        "deep-image-96-angular",
        "sift-128-euclidean",
        "glove-100-angular",
        "redcaps-512-angular",
    ]
    for thr in RECALL_THRESHOLDS:
        rows = []
        for d in datasets:
            rows.append([d] + [
                speedup_of_our_best_method(d, f"2pow{p}", thr, results_dir)
                for p in POWS
            ])
        df = pd.DataFrame(rows, columns=["Dataset"] + [f"$2^{{{p}}}$" for p in POWS])
        print(thr)
        print(df.to_latex(index=False, float_format="{:0.2f}".format))


if __name__ == "__main__":
    import sys

    main(sys.argv[1:] or None)
