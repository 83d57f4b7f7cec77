# FCN over dilated MobileNetV3-large features.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='MobileNetV3', arch='large',
                           out_indices=(1, 3, 16), norm_cfg=norm_cfg),
             decode_head=dict(type='FCNHead', in_channels=960, in_index=2,
                              channels=128, num_convs=1, concat_input=False,
                              dropout_ratio=0.1, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
