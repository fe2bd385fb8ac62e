from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from .train import (
    QATTrainState,
    create_train_state,
    cross_entropy_loss,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_mesh", "data_sharding", "replicated", "shard_batch",
    "initialize_distributed",
    "QATTrainState", "create_train_state", "cross_entropy_loss",
    "make_train_step", "make_eval_step",
]
