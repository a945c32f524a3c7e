from ust_run_tpu.data.datasets import SegmentationDataset, build_manifest  # noqa: F401
from ust_run_tpu.data.pipeline import BatchPipeline, TestLoader  # noqa: F401
