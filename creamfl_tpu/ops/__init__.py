from creamfl_tpu.ops.l2norm import l2_normalize  # noqa: F401
from creamfl_tpu.ops.gallery import (  # noqa: F401
    gallery_cross_entropy,
    gallery_log_softmax_diag,
    streaming_logsumexp,
)
from creamfl_tpu.ops import dispatch  # noqa: F401
from creamfl_tpu.ops.pallas_gallery import (  # noqa: F401
    conw_diag_pallas,
    fused_gallery_ce,
    row_logsumexp,
)
