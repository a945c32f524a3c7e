from ust_run_tpu.semisup.state import (CurriculumQueue, LQCarry, TrainState,  # noqa: F401
                                       create_train_state)
from ust_run_tpu.semisup.step import (HyperParams, decode_mask,  # noqa: F401
                                      make_train_step)
