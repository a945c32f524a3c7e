from ust_run_tpu.engine.evaluator import Evaluator  # noqa: F401
from ust_run_tpu.engine.trainer import Trainer  # noqa: F401
