"""CLI bench driver (ref: ParlayANN bench/neighborsTime.C role) end-to-end
on tiny files: build, save, reload, sweep, recall vs GT file."""

import numpy as np

from rangefilteredann_tpu import cli
from rangefilteredann_tpu.utils import io as bin_io


def test_cli_build_and_search(tmp_path, capsys, rng):
    n, d, nq, k = 2000, 16, 50, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    base = str(tmp_path / "base.bin")
    qfile = str(tmp_path / "q.bin")
    gtfile = str(tmp_path / "gt.bin")
    graph = str(tmp_path / "graph.bin")
    bin_io.write_vector_file(base, data)
    bin_io.write_vector_file(qfile, queries)
    d2 = ((data[None] - queries[:, None]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)[:, :k]
    bin_io.write_groundtruth_file(
        gtfile, order, np.take_along_axis(d2, order, 1)
    )

    cli.main([
        "-base_path", base, "-query_path", qfile, "-gt_path", gtfile,
        "-R", "16", "-L", "32", "-a", "1.2", "-k", str(k),
        "-graph_outfile", graph, "-beams", "8,32",
    ])
    out = capsys.readouterr().out
    assert "built R=16" in out
    lines = [l for l in out.splitlines() if l.strip() and l.split()[0].isdigit()]
    assert len(lines) == 2
    recall_at_32 = float(lines[1].split()[1])
    assert recall_at_32 >= 0.8, out

    # reload path: graph file round-trips through the reference format
    cli.main([
        "-base_path", base, "-query_path", qfile, "-gt_path", gtfile,
        "-graph_path", graph, "-k", str(k), "-beams", "32",
    ])
    out2 = capsys.readouterr().out
    recall2 = float(out2.splitlines()[-1].split()[1])
    assert abs(recall2 - recall_at_32) < 1e-6
