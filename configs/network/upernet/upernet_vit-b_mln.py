# UPerNet on ViT-Base/16 with the MultiLevelNeck "MLN" adapter (mmseg's
# upernet_vit-b16_mln family): four same-resolution transformer taps are
# 1x1-projected, bilinearly rescaled to a 4/8/16/32 pyramid and refined
# by 3x3 convs before UPerHead.  Beyond-reference family, Kvasir binary
# convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='VisionTransformer', arch='base', patch_size=16,
                  pretrain_img_size=224, with_cls_token=True,
                  out_indices=(2, 5, 8, 11), final_norm=False,
                  interpolate_mode='bicubic', drop_rate=0.0,
                  attn_drop_rate=0.0, drop_path_rate=0.0),
    neck=dict(type='MultiLevelNeck', in_channels=[768, 768, 768, 768],
              out_channels=768, scales=[4, 2, 1, 0.5]),
    decode_head=dict(type='UPerHead',
                     in_channels=[768, 768, 768, 768],
                     in_index=(0, 1, 2, 3),
                     input_transform='multiple_select',
                     pool_scales=(1, 2, 3, 6), channels=512,
                     dropout_ratio=0.1, num_classes=2,
                     norm_cfg=norm_cfg, align_corners=False,
                     loss_decode=dict(type='CrossEntropyLoss',
                                      use_sigmoid=True, loss_weight=1.0)),
    auxiliary_head=dict(type='FCNHead', in_channels=768, in_index=3,
                        channels=256, num_convs=1, concat_input=False,
                        dropout_ratio=0.1, num_classes=2,
                        norm_cfg=norm_cfg, align_corners=False,
                        loss_decode=dict(type='CrossEntropyLoss',
                                         use_sigmoid=True, loss_weight=0.4)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
