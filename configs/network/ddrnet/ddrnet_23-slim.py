# DDRNet-23-slim (Hong et al., 2021): dual-resolution realtime backbone
# with DAPPM context pooling, FCN decode on the merged 1/8 features and
# an auxiliary FCN on the spatial-branch tap.  Beyond-reference family,
# Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='DDRNet', channels=32, ppm_channels=128,
                           norm_cfg=norm_cfg, align_corners=False),
             decode_head=dict(type='FCNHead', in_channels=128, in_index=1,
                              channels=64, num_convs=1, concat_input=False,
                              dropout_ratio=0.0, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             auxiliary_head=dict(type='FCNHead', in_channels=64, in_index=0,
                                 channels=32, num_convs=1, concat_input=False,
                                 dropout_ratio=0.0, num_classes=2,
                                 norm_cfg=norm_cfg, align_corners=False,
                                 loss_decode=dict(type='CrossEntropyLoss',
                                                  use_sigmoid=True,
                                                  loss_weight=0.4)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
