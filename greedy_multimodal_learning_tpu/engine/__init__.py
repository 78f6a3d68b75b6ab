from .bdr import build_group_matrix, group_sq_norms
from .controller import (
    ControllerState,
    adaptive_weakest_update,
    guided_update,
    init_controller_state,
    null_update,
    random_update,
    weakest_update,
)
from .metrics import acc, blend_and_per_view_acc, blend_loss, cross_entropy
from .train_state import TrainState, create_train_state, get_learning_rate, make_optimizer, set_learning_rate
from .steps import build_eval_step, build_scanned_eval_step, build_train_step, make_controller_update
from .framework import Trainer
from .loop import evalution_loop, training_loop
from . import callbacks
from . import checkpoint
from .sweep import eval_sweep, stack_variable_trees, build_sweep_eval_step
