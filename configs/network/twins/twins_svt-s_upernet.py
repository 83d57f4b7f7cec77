# UPerNet on Twins-SVT-Small (Chu et al., NeurIPS 2021): alternating
# locally-grouped window attention and global subsampled attention.
# Beyond-reference family, Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='SVT', arch='svt-small',
                           out_indices=(0, 1, 2, 3),
                           drop_rate=0.0, attn_drop_rate=0.0,
                           drop_path_rate=0.2),
             decode_head=dict(type='UPerHead',
                              in_channels=[64, 128, 256, 512],
                              in_index=(0, 1, 2, 3),
                              input_transform='multiple_select',
                              pool_scales=(1, 2, 3, 6), channels=512,
                              dropout_ratio=0.1, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             auxiliary_head=dict(type='FCNHead', in_channels=256, in_index=2,
                                 channels=256, num_convs=1, concat_input=False,
                                 dropout_ratio=0.1, num_classes=2,
                                 norm_cfg=norm_cfg, align_corners=False,
                                 loss_decode=dict(type='CrossEntropyLoss',
                                                  use_sigmoid=True,
                                                  loss_weight=0.4)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
