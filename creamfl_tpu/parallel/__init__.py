from creamfl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    shard_batch,
)
from creamfl_tpu.parallel.client_parallel import (  # noqa: F401
    stack_states,
    unstack_states,
    vmap_client_step,
)
