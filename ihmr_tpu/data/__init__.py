from ihmr_tpu.data.datasets import (  # noqa: F401
    BaselineDataset,
    DataConfig,
    MLPDataset,
    OPTDataset,
    load_annotation,
    load_anno_pred_data,
)
from ihmr_tpu.data.compose import ComposeDataset  # noqa: F401
from ihmr_tpu.data.loader import BatchLoader, collate  # noqa: F401
from ihmr_tpu.data import preprocess, synthetic  # noqa: F401
