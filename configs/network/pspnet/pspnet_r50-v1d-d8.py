# PSPNet with dilated ResNet-50-V1d (deep stem + avg-down shortcuts,
# reference resnet.py:707-718; output stride 8) — covers the V1d variant
# with a runnable config.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='ResNetV1d', depth=50, num_stages=4,
                           out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                           strides=(1, 2, 1, 1), norm_cfg=norm_cfg,
                           contract_dilation=True),
             decode_head=dict(type='PSPHead', in_channels=2048, in_index=3,
                              channels=512, pool_scales=(1, 2, 3, 6),
                              dropout_ratio=0.1, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             auxiliary_head=dict(type='FCNHead', in_channels=1024, in_index=2,
                                 channels=256, num_convs=1, concat_input=False,
                                 dropout_ratio=0.1, num_classes=2,
                                 norm_cfg=norm_cfg, align_corners=False,
                                 loss_decode=dict(type='CrossEntropyLoss',
                                                  use_sigmoid=True,
                                                  loss_weight=0.4)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
