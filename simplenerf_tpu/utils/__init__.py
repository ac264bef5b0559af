from simplenerf_tpu.utils.profiling import StepTimer, trace  # noqa: F401
