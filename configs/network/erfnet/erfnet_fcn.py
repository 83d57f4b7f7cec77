# ERFNet (Romera et al., T-ITS 2017) with an FCN classifier on the
# 1/2-resolution decoder output.  Beyond-reference family, Kvasir
# binary convention (mmseg erfnet_fcn structure).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='ERFNet', in_channels=3,
                           enc_downsample_channels=(16, 64, 128),
                           enc_stage_non_bottlenecks=(5, 8),
                           enc_non_bottleneck_dilations=(2, 4, 8, 16),
                           dec_upsample_channels=(64, 16),
                           dec_stages_non_bottleneck=(2, 2),
                           dec_non_bottleneck_channels=(64, 16),
                           dropout_ratio=0.1, norm_cfg=norm_cfg),
             decode_head=dict(type='FCNHead', in_channels=16, in_index=0,
                              channels=128, num_convs=1, concat_input=False,
                              dropout_ratio=0.1, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
