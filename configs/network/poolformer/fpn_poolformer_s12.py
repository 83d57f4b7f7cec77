# FPN-PoolFormer-S12 (Yu et al., CVPR 2022): MetaFormer backbone whose
# token mixer is a 3x3 average pool, with the Panoptic-FPN decode stack
# (mmseg's fpn_poolformer_s12 arrangement).  Beyond-reference family,
# Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='PoolFormer', arch='s12', out_indices=(0, 1, 2, 3),
                  drop_path_rate=0.0),
    neck=dict(type='FPN', in_channels=[64, 128, 320, 512],
              out_channels=256, num_outs=4),
    decode_head=dict(type='FPNHead',
                     in_channels=[256, 256, 256, 256],
                     in_index=[0, 1, 2, 3],
                     input_transform='multiple_select',
                     feature_strides=[4, 8, 16, 32],
                     channels=128, dropout_ratio=0.1, num_classes=2,
                     norm_cfg=norm_cfg, align_corners=False,
                     loss_decode=dict(type='CrossEntropyLoss',
                                      use_sigmoid=True, loss_weight=1.0)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
