from .mesh import make_mesh, AXIS_RULES, shard_params
from .train import make_train_state, train_step, ranking_loss
