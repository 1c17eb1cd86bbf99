"""rangefilteredann_tpu — TPU-native range-filtered ANN ("window search").

From-scratch JAX/XLA/Pallas framework with the capabilities of
JoshEngels/RangeFilteredANN (arXiv:2402.00943). See SURVEY.md at the repo root
for the structural map of the reference this re-implements.
"""

import os as _os

# Persistent XLA compilation cache, on by default: index builds and query
# sweeps touch dozens of (beam, batch, k) kernel shapes, and a cold process
# would otherwise recompile every one (~20-40s each on TPU). Opt out with
# RFANN_NO_COMPILE_CACHE=1; JAX_COMPILATION_CACHE_DIR still takes precedence.
if not _os.environ.get("RFANN_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
        _os.path.expanduser("~"), ".cache", "rangefilteredann_tpu", "jax_cache"
    )
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from .params import (  # noqa: F401
    DEFAULT_BUILD_PARAMS,
    DEFAULT_CUTOFF,
    DEFAULT_SHIFT_FACTOR,
    DEFAULT_SPLIT_FACTOR,
    BuildParams,
    QueryParams,
    build_query_params,
)
from .models import (  # noqa: F401
    PostfilterVamanaIndex,
    PrefilterIndex,
    RangeFilterTreeIndex,
    SuperOptimizedPostfilterTree,
    VamanaIndex,
    build_vamana_index,
)
from .filters import FilteredDataset, QueryFilter, csr_filters  # noqa: F401
from .utils.stats import QueryStats, graph_stats  # noqa: F401

__version__ = "0.1.0"
