# DeepLabV3 with ResNeXt-50 32x4d dilated to output stride 8.
# Beyond-reference backbone family, Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='ResNeXt', depth=50, groups=32, base_width=4,
                           num_stages=4, out_indices=(0, 1, 2, 3),
                           dilations=(1, 1, 2, 4), strides=(1, 2, 1, 1),
                           norm_cfg=norm_cfg, contract_dilation=True),
             decode_head=dict(type='ASPPHead', in_channels=2048, in_index=3,
                              channels=512, dilations=(1, 12, 24, 36),
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
