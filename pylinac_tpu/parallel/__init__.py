from .mesh import (
    QABatchRunner,
    sharded_field_analysis,
    sharded_ct_localization,
    sharded_gamma_2d,
    sharded_picket_fence,
    sharded_wl_centroids,
)

__all__ = [
    "QABatchRunner",
    "sharded_field_analysis",
    "sharded_ct_localization",
    "sharded_gamma_2d",
    "sharded_picket_fence",
    "sharded_wl_centroids",
]
