# CGNet (Wu et al., TIP 2020): context-guided lightweight backbone with
# a minimal FCN classifier on the 1/8 features.  Beyond-reference
# family, Kvasir binary convention (mmseg cgnet config structure).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='CGNet', in_channels=3,
                           num_channels=(32, 64, 128), num_blocks=(3, 21),
                           dilations=(2, 4), reductions=(8, 16),
                           norm_cfg=norm_cfg),
             decode_head=dict(type='FCNHead', in_channels=256, in_index=2,
                              channels=256, num_convs=0, concat_input=False,
                              dropout_ratio=0.0, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
