from creamfl_tpu.utils.logging import PythonLogger  # noqa: F401
from creamfl_tpu.utils.serialize import flatten_dict  # noqa: F401
