# FCN over dilated MobileNetV2 (output stride 8).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='MobileNetV2', widen_factor=1.0,
                           strides=(1, 2, 2, 1, 1, 1, 1),
                           dilations=(1, 1, 1, 2, 2, 4, 4),
                           out_indices=(1, 2, 4, 6), norm_cfg=norm_cfg),
             decode_head=dict(type='FCNHead', in_channels=320, in_index=3,
                              channels=128, num_convs=2, concat_input=True,
                              dropout_ratio=0.1, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0)),
             auxiliary_head=dict(type='FCNHead', in_channels=96, in_index=2,
                                 channels=64, num_convs=1, concat_input=False,
                                 dropout_ratio=0.1, num_classes=2,
                                 norm_cfg=norm_cfg, align_corners=False,
                                 loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True, loss_weight=0.4)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
