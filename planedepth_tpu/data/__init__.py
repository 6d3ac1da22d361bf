from planedepth_tpu.data.kitti import (
    DATASETS,
    KITTIDataset,
    KITTIDepthDataset,
    KITTIOdomDataset,
    KITTIRAWDataset,
    readlines,
    split_path,
)
from planedepth_tpu.data.loader import BatchLoader, EpochSampler, collate
from planedepth_tpu.data.synthetic import make_stereo_batch
