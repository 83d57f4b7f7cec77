# Tiny SegFormer (MiT) for the synthetic smoke pipeline and the CLI
# parallelism tests (tests/test_train_cli_parallel.py): a transformer
# network small enough to train on the 8-virtual-device CPU mesh, with
# the same config surface as segformer_mit-b0.py.
norm_cfg = dict(type='SyncBN', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='MixVisionTransformer',
                           embed_dims=8,
                           num_stages=2,
                           num_layers=(1, 1),
                           num_heads=(1, 2),
                           patch_sizes=(7, 3),
                           strides=(4, 2),
                           sr_ratios=(2, 1),
                           out_indices=(0, 1),
                           mlp_ratio=2,
                           drop_path_rate=0.0),
             decode_head=dict(type='SegFormerHead',
                              in_channels=[8, 16],
                              in_index=(0, 1),
                              input_transform='multiple_select',
                              channels=8,
                              dropout_ratio=0.0,
                              num_classes=2,
                              norm_cfg=norm_cfg,
                              align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               loss_weight=1.0)),
             train_cfg=dict(),
             test_cfg=dict(mode='whole'))
