# SegFormer-B0: MiT-B0 transformer encoder + all-MLP decode head.
# Beyond-reference family (the reference lab is CNN-only); arch follows
# Xie et al., NeurIPS 2021, adapted to this framework's binary Kvasir
# convention (num_classes=2, sigmoid CE) like the other network configs.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='MixVisionTransformer',
                           in_channels=3,
                           embed_dims=32,
                           num_stages=4,
                           num_layers=(2, 2, 2, 2),
                           num_heads=(1, 2, 5, 8),
                           patch_sizes=(7, 3, 3, 3),
                           strides=(4, 2, 2, 2),
                           sr_ratios=(8, 4, 2, 1),
                           out_indices=(0, 1, 2, 3),
                           mlp_ratio=4,
                           qkv_bias=True,
                           drop_rate=0.0,
                           attn_drop_rate=0.0,
                           drop_path_rate=0.1),
             decode_head=dict(type='SegFormerHead',
                              in_channels=[32, 64, 160, 256],
                              in_index=(0, 1, 2, 3),
                              input_transform='multiple_select',
                              channels=256,
                              dropout_ratio=0.1,
                              num_classes=2,
                              norm_cfg=norm_cfg,
                              align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0)),
             train_cfg=dict(),
             test_cfg=dict(mode='whole'))
