from .neural_cde import (
    NeuralCDEConfig,
    bce_with_logits,
    cde_func,
    init_neural_cde,
    neural_cde_apply,
)
from .training import accuracy, make_loss_fn, make_train_step
