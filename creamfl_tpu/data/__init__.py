from creamfl_tpu.data.vocab import Vocabulary  # noqa: F401
from creamfl_tpu.data.tokenize import (  # noqa: F401
    caption_to_ids,
    treebank_tokenize,
)
from creamfl_tpu.data.partition import data_partitioner  # noqa: F401
from creamfl_tpu.data.loaders import (  # noqa: F401
    ArrayLoader,
    collate_captions,
)
