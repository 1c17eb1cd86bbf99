"""rangefilteredann_tpu — TPU-native range-filtered ANN ("window search").

From-scratch JAX/XLA/Pallas framework with the capabilities of
JoshEngels/RangeFilteredANN (arXiv:2402.00943). See SURVEY.md at the repo root
for the structural map of the reference this re-implements.
"""

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

__version__ = "0.1.0"
