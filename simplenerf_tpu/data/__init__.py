from simplenerf_tpu.data.factory import get_data_loader
from simplenerf_tpu.data.preprocessor import ScenePreprocessor, gather_batch

__all__ = ["get_data_loader", "ScenePreprocessor", "gather_batch"]
