from .shift import bbox_mask, in_bounds_mask, shift, shift_adjoint  # noqa: F401
from .graph_ops import edge_gather, edge_scatter_add  # noqa: F401
