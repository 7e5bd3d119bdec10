from creamfl_tpu.engine.evaluator import RetrievalEvaluator  # noqa: F401
from creamfl_tpu.engine.server import ServerEngine  # noqa: F401
from creamfl_tpu.engine.client_uni import UniClientEngine  # noqa: F401
from creamfl_tpu.engine.client_mm import MMClientEngine  # noqa: F401
