from .rollout import RolloutFn, RolloutState, RolloutBatch
from .ppo import PPOUpdateFn, STAT_NAMES
from .trainer import PPOTrainer
