from tdnnf_nas_tpu.train.objective import ChainObjectiveConfig, chain_objective
from tdnnf_nas_tpu.train.optimizer import OptimizerConfig, make_optimizer, learning_rate_at
from tdnnf_nas_tpu.train.trainer import (
    TrainerConfig,
    TrainState,
    init_train_state,
    make_train_step,
    make_valid_step,
)
