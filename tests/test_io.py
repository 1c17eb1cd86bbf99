"""Binary file formats (ref: point_range.h:57-93 vectors, graph.h:126-196
graphs, types.h:33-74 ground truth) — roundtrips and raw-byte layout."""

import numpy as np
import pytest

from rangefilteredann_tpu.utils import io as bin_io


@pytest.mark.parametrize("dtype", ["float", "uint8", "int8"])
def test_vector_file_roundtrip(tmp_path, rng, dtype):
    np_dt = {"float": np.float32, "uint8": np.uint8, "int8": np.int8}[dtype]
    if dtype == "float":
        data = rng.normal(size=(50, 7)).astype(np_dt)
    else:
        data = rng.integers(0, 100, size=(50, 7)).astype(np_dt)
    path = str(tmp_path / "v.bin")
    bin_io.write_vector_file(path, data)
    back = bin_io.read_vector_file(path, dtype)
    np.testing.assert_array_equal(back, data)
    # raw layout: uint32 n, uint32 d, then row-major values
    raw = open(path, "rb").read()
    n, d = np.frombuffer(raw[:8], dtype=np.uint32)
    assert (n, d) == (50, 7)
    assert len(raw) == 8 + data.nbytes


def test_graph_file_roundtrip(tmp_path, rng):
    n, R = 60, 6
    nbrs = rng.integers(0, n, size=(n, R)).astype(np.int32)
    degs = rng.integers(0, R + 1, size=n)
    for i in range(n):
        nbrs[i, degs[i]:] = -1
    path = str(tmp_path / "g.bin")
    bin_io.write_graph_file(path, nbrs)
    back, back_degs = bin_io.read_graph_file(path)
    np.testing.assert_array_equal(back, nbrs)
    np.testing.assert_array_equal(back_degs, (nbrs >= 0).sum(axis=1))
    # raw layout: uint32 n, maxDeg, degrees[n], packed edges
    raw = np.frombuffer(open(path, "rb").read(), dtype=np.uint32)
    assert tuple(raw[:2]) == (n, R)
    assert raw[2 : 2 + n].sum() == (nbrs >= 0).sum()


def test_groundtruth_roundtrip(tmp_path, rng):
    n, k = 30, 10
    ids = rng.integers(0, 1000, size=(n, k)).astype(np.uint32)
    dists = rng.random((n, k)).astype(np.float32)
    path = str(tmp_path / "gt.bin")
    bin_io.write_groundtruth_file(path, ids, dists)
    bi, bd = bin_io.read_groundtruth_file(path)
    np.testing.assert_array_equal(bi, ids)
    np.testing.assert_allclose(bd, dists)
