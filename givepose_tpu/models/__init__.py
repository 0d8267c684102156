from givepose_tpu.models.posenet import PoseNet
from givepose_tpu.models.scale_net import ScaleNet
from givepose_tpu.models.convnext import ConvNeXt, convnext_base, convnext_tiny
from givepose_tpu.models.heads import (
    TopDownXyzHead,
    MAPEncoder,
    ConvPnPNet,
    SizeHead,
)
from givepose_tpu.models.dcnv3_module import DCNv3, DCNv3Conv
from givepose_tpu.models.attention import (
    MAPTransformerEncoder,
    AttentionPnPNet,
    CrossAttentionPnPNet,
)
from givepose_tpu.models.mobilenet import MobileNetV3Small
from givepose_tpu.models.resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
)
from givepose_tpu.models.aux_heads import CoordAtt, AttentionMaskHead
