# FastFCN (Wu et al., 2019) = undilated ResNet-50 + JPU joint pyramid
# upsampling + PSPHead on the fused stride-8 map (mmseg's
# fastfcn_r50-d32_jpu_psp arrangement).  The backbone keeps its natural
# strides — the JPU's dilated separable convs reconstruct the dilated-
# equivalent feature at a fraction of the FLOPs.  Beyond-reference
# family, Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='ResNetV1c', depth=50, num_stages=4,
                  out_indices=(1, 2, 3), dilations=(1, 1, 1, 1),
                  strides=(1, 2, 2, 2), norm_cfg=norm_cfg,
                  contract_dilation=True),
    neck=dict(type='JPU', in_channels=(512, 1024, 2048), mid_channels=512,
              start_level=0, end_level=-1, dilations=(1, 2, 4, 8),
              align_corners=False, norm_cfg=norm_cfg),
    decode_head=dict(type='PSPHead', in_channels=2048, in_index=2,
                     channels=512, pool_scales=(1, 2, 3, 6),
                     dropout_ratio=0.1, num_classes=2,
                     norm_cfg=norm_cfg, align_corners=False,
                     loss_decode=dict(type='CrossEntropyLoss',
                                      use_sigmoid=True, loss_weight=1.0)),
    auxiliary_head=dict(type='FCNHead', in_channels=1024, in_index=1,
                        channels=256, num_convs=1, concat_input=False,
                        dropout_ratio=0.1, num_classes=2,
                        norm_cfg=norm_cfg, align_corners=False,
                        loss_decode=dict(type='CrossEntropyLoss',
                                         use_sigmoid=True, loss_weight=0.4)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
