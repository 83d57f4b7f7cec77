# UPerNet on Swin-Tiny with window_size=8 — the TPU-recommended variant.
# At the standard 640² training resolution every stage map (160/80/40/20)
# divides by 8, so no block pays the pad-to-window-grid + pad-mask tax
# that ws=7 forces at EVERY stage (measured 1.22x on the full backbone,
# docs/PERF.md).  Weights are not interchangeable with ws=7 checkpoints
# (the relative-position-bias table is (2ws-1)²); use this config when
# training from scratch on TPU.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='SwinTransformer', arch='tiny',
                           window_size=8, out_indices=(0, 1, 2, 3),
                           drop_path_rate=0.3),
             decode_head=dict(type='UPerHead',
                              in_channels=[96, 192, 384, 768],
                              in_index=(0, 1, 2, 3),
                              input_transform='multiple_select',
                              pool_scales=(1, 2, 3, 6), channels=512,
                              dropout_ratio=0.1, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             auxiliary_head=dict(type='FCNHead', in_channels=384, in_index=2,
                                 channels=256, num_convs=1, concat_input=False,
                                 dropout_ratio=0.1, num_classes=2,
                                 norm_cfg=norm_cfg, align_corners=False,
                                 loss_decode=dict(type='CrossEntropyLoss',
                                                  use_sigmoid=True,
                                                  loss_weight=0.4)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
