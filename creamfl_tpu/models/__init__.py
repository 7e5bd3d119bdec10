from creamfl_tpu.models.pie import PIENet, MultiHeadSelfAttention  # noqa: F401
from creamfl_tpu.models.gru import BiGRU, gather_last_valid  # noqa: F401
from creamfl_tpu.models.resnet import (  # noqa: F401
    ResNetBackbone,
    RESNET_CONFIGS,
)
from creamfl_tpu.models.pcme import (  # noqa: F401
    PCME,
    ImageEncoder,
    TextEncoderGRU,
)
from creamfl_tpu.models.bert import BertEncoder, BertConfig  # noqa: F401
from creamfl_tpu.models.clients import (  # noqa: F401
    ImageClientNet,
    TextClientNet,
    clamp_head_weights,
)
