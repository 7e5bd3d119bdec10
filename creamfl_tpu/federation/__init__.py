from creamfl_tpu.federation.aggregation import con_w_aggregate  # noqa: F401
from creamfl_tpu.federation.rounds import MMFL  # noqa: F401
