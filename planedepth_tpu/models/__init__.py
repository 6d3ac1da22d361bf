from planedepth_tpu.models.depth_decoder import (
    DepthDecoder,
    DepthDecoderContinuous,
    mixture_reweight,
    plane_dists,
    render_probability_from_logits,
)
from planedepth_tpu.models.denseaspp import DenseAspp
from planedepth_tpu.models.fal_net import FalNet
from planedepth_tpu.models.monov2_decoder import Monov2Decoder
from planedepth_tpu.models.perceptual import (
    Resnet18Features,
    Vgg19Features,
    make_perceptual_net,
)
from planedepth_tpu.models.plade_net import PladeNet
from planedepth_tpu.models.pose_net import PladePoseNet, PoseDecoder
from planedepth_tpu.models.resnet import (
    ResnetEncoder,
    ResnetPoseEncoder,
    encoder_channels,
)
from planedepth_tpu.models.factory import DepthModel, build_depth_model
