"""User-facing factory API, parity with the reference's de facto user API
(ref: experiments/wrapper.py and the `window_ann` pybind module registered in
python_bindings/python_bindings.cpp:91-237).

The reference registers one class per (dtype x metric) variant
(Float/Uint8/Int8 x Euclidian/Mips); here a single implementation handles all
variants (integer inputs are widened to float32, which keeps their distances
exact — see utils/data.make_pointset), and the factories return constructor
callables with the variant baked in.

Metric strings: "Euclidian" (reference spelling) and "mips".
"""

from __future__ import annotations

import functools

import numpy as np

from .models import (
    PostfilterVamanaIndex,
    PrefilterIndex,
    RangeFilterTreeIndex,
    SuperOptimizedPostfilterTree,
    VamanaIndex,
    build_vamana_index,
)
from .params import (
    DEFAULT_BUILD_PARAMS,
    DEFAULT_CUTOFF,
    DEFAULT_SHIFT_FACTOR,
    DEFAULT_SPLIT_FACTOR,
    BuildParams,
    QueryParams,
    build_query_params,
)

_DTYPES = {"float": np.float32, "uint8": np.uint8, "int8": np.int8}
_METRICS = ("Euclidian", "mips")


def _check(metric: str, dtype: str):
    if metric not in _METRICS:
        raise Exception("Invalid metric " + metric)
    if dtype not in _DTYPES:
        raise Exception("Invalid data type " + dtype)


def _cast(points, dtype):
    return np.asarray(points, dtype=_DTYPES[dtype])


def prefilter_index_constructor(metric: str, dtype: str):
    """(ref: wrapper.py:242-262)"""
    _check(metric, dtype)

    def ctor(points, filter_values, build_params=DEFAULT_BUILD_PARAMS):
        return PrefilterIndex(_cast(points, dtype), filter_values, build_params, metric=metric)

    return ctor


def postfilter_vamana_constructor(metric: str, dtype: str):
    """(ref: wrapper.py:265-285)"""
    _check(metric, dtype)

    def ctor(points, filter_values, build_params=DEFAULT_BUILD_PARAMS):
        return PostfilterVamanaIndex(_cast(points, dtype), filter_values, build_params, metric=metric)

    return ctor


def vamana_range_filter_tree_constructor(metric: str, dtype: str):
    """Vamana-leaf B-WST (ref: wrapper.py:288-308, binding
    VamanaRangeFilterTreeIndex* at python_bindings.cpp:136-141)."""
    _check(metric, dtype)

    def ctor(points, filter_values, cutoff=DEFAULT_CUTOFF,
             split_factor=DEFAULT_SPLIT_FACTOR, build_params=DEFAULT_BUILD_PARAMS):
        return RangeFilterTreeIndex(
            _cast(points, dtype), filter_values, cutoff, split_factor,
            build_params, metric=metric, leaf="vamana",
        )

    return ctor


def range_filter_tree_constructor(metric: str, dtype: str):
    """Prefilter-leaf B-WST (binding RangeFilterTreeIndex* at
    python_bindings.cpp:119-124)."""
    _check(metric, dtype)

    def ctor(points, filter_values, cutoff=DEFAULT_CUTOFF,
             split_factor=DEFAULT_SPLIT_FACTOR, build_params=DEFAULT_BUILD_PARAMS):
        return RangeFilterTreeIndex(
            _cast(points, dtype), filter_values, cutoff, split_factor,
            build_params, metric=metric, leaf="prefilter",
        )

    return ctor


def super_optimized_postfilter_tree_constructor(metric: str, dtype: str):
    """(ref: wrapper.py:311-331, binding SuperOptimizedPostfilterTreeIndex* at
    python_bindings.cpp:143-158; defaults cutoff=1000, split=2, shift=0.5)."""
    _check(metric, dtype)

    def ctor(points, filter_values, cutoff=DEFAULT_CUTOFF,
             split_factor=float(DEFAULT_SPLIT_FACTOR),
             shift_factor=DEFAULT_SHIFT_FACTOR,
             build_params=DEFAULT_BUILD_PARAMS):
        return SuperOptimizedPostfilterTree(
            _cast(points, dtype), filter_values, cutoff, split_factor,
            shift_factor, build_params, metric=metric,
        )

    return ctor


def vamana_index_constructor(metric: str, dtype: str):
    """Unfiltered VamanaIndex loader (ref: wrapper.py:28-49)."""
    _check(metric, dtype)
    return functools.partial(VamanaIndex, metric=metric, dtype=dtype)


def build_vamana_index_fn(metric: str, dtype: str):
    """Unfiltered file-based builder (ref: wrapper.py:4-25)."""
    _check(metric, dtype)
    return functools.partial(build_vamana_index, dtype=dtype)


__all__ = [
    "BuildParams",
    "QueryParams",
    "build_query_params",
    "prefilter_index_constructor",
    "postfilter_vamana_constructor",
    "vamana_range_filter_tree_constructor",
    "range_filter_tree_constructor",
    "super_optimized_postfilter_tree_constructor",
    "vamana_index_constructor",
    "build_vamana_index_fn",
]
