from creamfl_tpu.optim.adamp import adamp  # noqa: F401
from creamfl_tpu.optim.factory import (  # noqa: F401
    cosine_annealing_schedule,
    get_optimizer,
    make_client_sgd,
    make_server_optimizer,
    set_learning_rate,
    two_step_decay_schedule,
)
