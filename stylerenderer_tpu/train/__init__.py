from stylerenderer_tpu.train.losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    path_lengths_multi,
    path_regularize,
    r1_penalty,
)
from stylerenderer_tpu.train.state import (
    TrainState,
    init_train_state,
    make_models,
    make_optimizers,
)
from stylerenderer_tpu.train.step import make_train_step

__all__ = [
    "TrainState",
    "d_logistic_loss",
    "g_nonsaturating_loss",
    "init_train_state",
    "make_models",
    "make_optimizers",
    "make_train_step",
    "path_lengths_multi",
    "path_regularize",
    "r1_penalty",
]
from stylerenderer_tpu.train.regressor import (  # noqa: E402
    RegressorState,
    make_regressor_fn,
    make_regressor_trainer,
)

__all__ += ["RegressorState", "make_regressor_fn", "make_regressor_trainer"]
