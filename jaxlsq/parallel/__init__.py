from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from .fsdp import fsdp_sharding
from .optim import qat_optimizer
from .moe import EXPERT_SCOPES, moe_sharding
from .pipeline import (
    create_pipeline_state,
    make_pipeline_train_step,
    pipeline_mesh,
    pipeline_sharding,
    stack_pipeline_variables,
    unstack_pipeline_variables,
)
from .train import (
    QATTrainState,
    create_train_state,
    cross_entropy_loss,
    distillation_loss,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_mesh", "data_sharding", "replicated", "shard_batch",
    "initialize_distributed",
    "moe_sharding", "EXPERT_SCOPES", "fsdp_sharding", "qat_optimizer",
    "pipeline_mesh", "create_pipeline_state", "make_pipeline_train_step",
    "pipeline_sharding", "stack_pipeline_variables",
    "unstack_pipeline_variables",
    "QATTrainState", "create_train_state", "cross_entropy_loss",
    "distillation_loss",
    "make_train_step", "make_eval_step",
]
