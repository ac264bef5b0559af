from simplenerf_tpu.dataset_tools import extractors, splits, video_poses

__all__ = ["splits", "video_poses", "extractors"]
