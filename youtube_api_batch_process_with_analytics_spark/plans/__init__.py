from .batch import BatchRequest, run_batch  # noqa: F401
