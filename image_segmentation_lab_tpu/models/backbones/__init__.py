from .beit import BEiT, BEiTAttention, BEiTBlock
from .mae import MAE
from .bisenetv1 import BiSeNetV1
from .bisenetv2 import BiSeNetV2
from .cgnet import CGNet, ContextGuidedBlock, GlobalContextExtractor
from .convnext import ConvNeXt
from .ddrnet import DAPPM, DDRNet
from .erfnet import ERFNet, NonBottleneck1d
from .fast_scnn import FastSCNN
from .hrnet import HRModule, HRNet
from .icnet import ICNet
from .mit import MixVisionTransformer
from .mobilenet_v2 import MobileNetV2
from .mscan import MSCAN
from .mobilenet_v3 import MobileNetV3
from .pidnet import PAPPM, Bag, LightBag, PagFM, PIDNet
from .poolformer import PoolFormer, PoolFormerBlock
from .res2net import Bottle2neck, Res2Net
from .resnest import ResNeSt, SplAtBottleneck, SplitAttentionConv2d
from .resnet import ResNet, ResNetV1c, ResNetV1d
from .resnext import ResNeXt
from .stdc import STDCContextPathNet, STDCModule, STDCNet
from .swin import SwinTransformer
from .twins import PCPVT, SVT, LocallyGroupedSelfAttention
from .unet import UNet
from .vit import VisionTransformer
