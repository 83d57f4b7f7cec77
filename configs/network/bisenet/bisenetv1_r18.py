# BiSeNetV1 (Yu et al., ECCV 2018) with a ResNet-18 context path and
# FCN decode/aux heads.  Beyond-reference family, Kvasir binary
# convention (mmseg bisenetv1_r18-d32 structure).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='BiSeNetV1',
                  in_channels=3,
                  context_channels=(128, 256, 512),
                  spatial_channels=(64, 64, 64, 128),
                  out_indices=(0, 1, 2),
                  out_channels=256,
                  backbone_cfg=dict(type='ResNet', in_channels=3, depth=18,
                                    num_stages=4, out_indices=(0, 1, 2, 3),
                                    dilations=(1, 1, 1, 1),
                                    strides=(1, 2, 2, 2), norm_cfg=norm_cfg,
                                    norm_eval=False, style='pytorch'),
                  norm_cfg=norm_cfg, align_corners=False),
    decode_head=dict(type='FCNHead', in_channels=256, in_index=0,
                     channels=256, num_convs=1, concat_input=False,
                     dropout_ratio=0.1, num_classes=2, norm_cfg=norm_cfg,
                     align_corners=False,
                     loss_decode=dict(type='CrossEntropyLoss',
                                      use_sigmoid=True, loss_weight=1.0)),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=128, in_index=1, channels=64,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=2, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True,
                              loss_weight=1.0)),
        dict(type='FCNHead', in_channels=128, in_index=2, channels=64,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=2, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True,
                              loss_weight=1.0)),
    ],
    train_cfg=dict(), test_cfg=dict(mode='whole'))
