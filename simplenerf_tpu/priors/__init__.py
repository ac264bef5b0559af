from simplenerf_tpu.priors.colmap import ColmapSparseDepthEstimator, colmap_available

__all__ = ["ColmapSparseDepthEstimator", "colmap_available"]
