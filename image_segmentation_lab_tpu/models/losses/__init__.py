from .accuracy import Accuracy, accuracy
from .boundary_loss import BoundaryLoss
from .cross_entropy_loss import (CrossEntropyLoss, binary_cross_entropy,
                                 cross_entropy, mask_cross_entropy)
from .dice_loss import DiceLoss, dice_loss
from .focal_loss import FocalLoss, sigmoid_focal_loss
from .huasdorff_distance_loss import HuasdorffDisstanceLoss, edt_sq
from .kldiv_loss import KLDivLoss
from .lovasz_loss import LovaszLoss, lovasz_hinge, lovasz_softmax
from .silog_loss import SiLogLoss, silog_loss
from .ohem_cross_entropy import OhemCrossEntropy
from .tversky_loss import TverskyLoss, tversky_loss
from .utils import (get_class_weight, reduce_loss, weight_reduce_loss,
                    weighted_loss)
