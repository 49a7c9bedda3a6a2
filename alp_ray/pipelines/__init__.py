from .pagerank import pagerank  # noqa: F401
from .components import connected_components  # noqa: F401
from .labelprop import label_propagation  # noqa: F401
from .triangles import triangle_count  # noqa: F401
from .hpcg import build_hpcg_levels, hpcg, v_cycle  # noqa: F401
