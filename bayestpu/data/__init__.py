from bayestpu.data import datasets  # noqa: F401
from bayestpu.data.datasets import DATASET_STATS, get_dataset, iterate_batches  # noqa: F401
