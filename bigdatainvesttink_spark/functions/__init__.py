from .core import (  # noqa: F401
    davg,
    dsum,
    imbalance,
    log_return,
    quotation_to_decimal,
    quotation_to_double,
    round6,
)
from .asof import as_of_join  # noqa: F401
from .topk import top_k_per_group  # noqa: F401
