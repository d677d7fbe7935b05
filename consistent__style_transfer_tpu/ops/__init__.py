from .emd import (  # noqa: F401
    exact_ot_cost,
    ones_metric_emd,
    pyemd_ones_emd,
    sinkhorn_ot_cost,
)
from .sampling import hard_sample_st, temperature_softmax  # noqa: F401
from .losses import (  # noqa: F401
    bce_with_logits,
    cross_entropy,
    mse,
    softmax_cross_entropy_tokens,
)
