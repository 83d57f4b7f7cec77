# LR-ASPP over MobileNetV3-large (arXiv:1905.02244): low-level feature
# (layer4, 40ch, os8) + final feature (layer16, 960ch — nominally os16, but
# this d8 backbone dilates the layer-7/13 strides away so it is os8 too and
# the head's upsample is an identity here).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='MobileNetV3', arch='large',
                           out_indices=(4, 16), norm_cfg=norm_cfg),
             decode_head=dict(type='LRASPPHead',
                              in_channels=[40, 960],
                              in_index=(0, 1),
                              input_transform='multiple_select',
                              channels=128,
                              dropout_ratio=0.1,
                              num_classes=2,
                              norm_cfg=norm_cfg,
                              align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
