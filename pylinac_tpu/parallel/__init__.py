from .mesh import (
    QABatchRunner,
    sharded_batch_metrics,
    sharded_ct_localization,
)

__all__ = ["QABatchRunner", "sharded_batch_metrics", "sharded_ct_localization"]
