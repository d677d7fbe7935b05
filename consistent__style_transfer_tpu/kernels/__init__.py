from .sinkhorn import sinkhorn_pallas  # noqa: F401
from .decode_step import fused_decode_logits  # noqa: F401
