from multiclust_tpu.io.dataset import Dataset  # noqa: F401
