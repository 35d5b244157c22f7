from .dataset import (
    Dataset,
    LearningTask,
    make_dataset_from_log_file,
)
