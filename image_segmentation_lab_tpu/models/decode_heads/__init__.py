from .ann_head import AFNB, ANNHead, APNB
from .apc_head import ACM, APCHead
from .aspp_head import ASPPHead, ASPPModule
from .cc_head import CCHead, CrissCrossAttention
from .da_head import CAM, DAHead, PAM
from .dm_head import DCM, DMHead
from .dnl_head import DisentangledNonLocal2d, DNLHead
from .dpt_head import (DPTHead, FeatureFusionBlock, PreActResidualConvUnit,
                       ReassembleBlocks)
from .ema_head import EMAHead, EMAModule
from .enc_head import EncHead, Encoding, EncModule
from .decode_head import BaseDecodeHead
from .gc_head import ContextBlock, GCHead
from .ham_head import Hamburger, LightHamHead, NMF2D
from .isa_head import ISAHead
from .knet_head import (IterativeDecodeHead, KernelUpdateHead, KernelUpdator)
from .fcn_head import FCNHead
from .fpn_head import FPNHead
from .nl_head import NLHead
from .ddr_head import DDRHead
from .pid_head import PIDHead, boundary_from_label
from .point_head import PointHead
from .psa_head import PSAHead, psa_mask
from .lraspp_head import LRASPPHead
from .mask2former_head import Mask2FormerDecoderLayer, Mask2FormerHead
from .maskformer_head import (CrossAttention, DETRDecoderLayer,
                              MaskFormerHead, PixelDecoder,
                              sine_positional_encoding)
from .ocr_head import OCRHead
from .psp_head import PPM, PSPHead
from .segformer_head import SegFormerHead
from .segmenter_mask_head import SegmenterMaskTransformerHead
from .sep_aspp_head import DepthwiseSeparableASPPHead
from .sep_fcn_head import DepthwiseSeparableFCNHead
from .setr_mla_head import SETRMLAHead
from .setr_up_head import SETRUPHead
from .stdc_head import STDCHead
from .uper_head import UPerHead
