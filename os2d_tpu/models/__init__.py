from .resnet import (
    init_resnet_c4_params,
    resnet_c4_forward,
    RESNET_DEPTHS,
    import_torch_resnet_state_dict,
)
from .transform_net import (
    init_transform_net_params,
    transform_net_forward,
    import_torch_transform_net_state_dict,
)
from .head import (
    build_class_head,
    head_forward,
    make_class_pool_mask,
)
from .os2d import (
    Os2dConfig,
    init_os2d_params,
    Os2dModel,
)
