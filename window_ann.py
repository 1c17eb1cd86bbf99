"""Drop-in alias for the reference's `window_ann` pybind module
(ref: python_bindings/python_bindings.cpp:160-238).

`import window_ann` / `from window_ann import *` exposes the per-variant
class names the reference registers (e.g. VamanaRangeFilterTreeIndexFloatMips)
plus QueryParams/BuildParams, all backed by the TPU-native implementations in
rangefilteredann_tpu.
"""

from rangefilteredann_tpu.params import (  # noqa: F401
    BuildParams,
    QueryParams,
    build_query_params,
)
from rangefilteredann_tpu.filters import (  # noqa: F401
    FilteredDataset,
    QueryFilter,
    csr_filters,
)
from rangefilteredann_tpu import wrapper as _w

__version__ = "dev"


class _Defaults:
    """`window_ann.defaults` submodule equivalent
    (ref: python_bindings/python_bindings.cpp:169-174)."""

    METRIC = "Euclidian"
    ALPHA = 1.2
    GRAPH_DEGREE = 64
    BEAMWIDTH = 128


defaults = _Defaults()

_VARIANTS = [
    ("Float", "float", "Euclidian", "Euclidian"),
    ("Uint8", "uint8", "Euclidian", "Euclidian"),
    ("Int8", "int8", "Euclidian", "Euclidian"),
    ("Float", "float", "Mips", "mips"),
    ("Uint8", "uint8", "Mips", "mips"),
    ("Int8", "int8", "Mips", "mips"),
]

_FAMILIES = [
    # (reference class prefix, factory)
    ("PrefilterIndex", _w.prefilter_index_constructor),
    ("PostfilterVamanaIndex", _w.postfilter_vamana_constructor),
    ("RangeFilterTreeIndex", _w.range_filter_tree_constructor),
    ("VamanaRangeFilterTreeIndex", _w.vamana_range_filter_tree_constructor),
    ("SuperOptimizedPostfilterTreeIndex", _w.super_optimized_postfilter_tree_constructor),
]

for _dt_name, _dt, _m_name, _metric in _VARIANTS:
    for _prefix, _factory in _FAMILIES:
        globals()[f"{_prefix}{_dt_name}{_m_name}"] = _factory(_metric, _dt)
    globals()[f"Vamana{_dt_name}{_m_name}Index"] = _w.vamana_index_constructor(_metric, _dt)
    globals()[f"build_vamana_{_dt}_{_metric.lower()}_index"] = _w.build_vamana_index_fn(_metric, _dt)

del _dt_name, _dt, _m_name, _metric, _prefix, _factory
