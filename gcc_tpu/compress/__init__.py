from gcc_tpu.compress.macs import (  # noqa: F401
    conv_macs, unet_macs, mobile_resnet_macs, sagan_macs, srresnet_macs,
    count_params,
)
from gcc_tpu.compress.prune import (  # noqa: F401
    binary_search_threshold, prune_unet, prune_mobile_resnet, prune_sagan,
    prune_srresnet, cyclegan_reference_cfgs,
)
