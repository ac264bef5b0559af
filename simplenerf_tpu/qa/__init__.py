from simplenerf_tpu.qa import metrics
from simplenerf_tpu.qa.runner import QARunner

__all__ = ["metrics", "QARunner"]
