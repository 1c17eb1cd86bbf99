from .prefilter import PrefilterIndex  # noqa: F401
from .postfilter_vamana import PostfilterVamanaIndex  # noqa: F401
from .vamana_index import VamanaIndex, build_vamana_index  # noqa: F401
