from creamfl_tpu.losses.mcsoft import (  # noqa: F401
    MCSoftContrastiveConfig,
    init_mcsoft_params,
    mcsoft_contrastive_loss,
)
from creamfl_tpu.losses.classification import (  # noqa: F401
    cross_entropy,
    margin_softmax_loss,
    weight_orthogonality_loss,
)
from creamfl_tpu.losses.contrast import (  # noqa: F401
    combine_inter_intra,
    inter_modal_loss,
    intra_modal_moon_loss,
)
