from planedepth_tpu.utils.logging import (
    Logger,
    ThroughputMeter,
    normalize_image,
    sec_to_hm_str,
)
